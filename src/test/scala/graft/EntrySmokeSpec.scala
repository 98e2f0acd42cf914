package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SparkTestSession
class EntrySmokeSpec extends AnyFunSuite {
  test("driver entry contract: flagship returns rows") {
    val n = SparkEntry.entry(SparkTestSession.spark).count()
    assert(n > 0, n)
  }
}
