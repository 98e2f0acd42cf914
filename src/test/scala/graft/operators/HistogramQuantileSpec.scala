package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.aggregators

/** Per-bin t-digest quantiles through the full Spark aggregation path
  * (partial + merge across partitions) against exact per-bin order
  * statistics — the value check behind q_histogram2d's sketch columns.
  */
class HistogramQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-bin digest median and quartiles track exact order statistics") {
    // 4 bins with different shifted/scaled value distributions
    val rows = for (i <- 0 until 20000) yield {
      val bin = i % 4
      val u = ((i * 2654435761L) % 100003).toDouble / 100003.0 // hash-uniform
      (bin, (bin + 1) * 100.0 + u * (50.0 + 10 * bin))
    }
    val df = rows.toDF("bin", "v").repartition(8) // force partial+merge
    val agg = df.groupBy("bin")
      .agg(aggregators.tdigest_agg(col("v"), Seq(0.25, 0.5, 0.75)).as("d"))
      .select(col("bin"), col("d.quantiles").as("qs"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val exact = rows.groupBy(_._1).map { case (b, vs) =>
      val sorted = vs.map(_._2).sorted
      b -> Seq(0.25, 0.5, 0.75).map(q =>
        sorted(((sorted.length - 1) * q).toInt))
    }
    for (b <- 0 until 4; qi <- 0 until 3) {
      val got = agg(b)(qi)
      val want = exact(b)(qi)
      val span = 50.0 + 10 * b
      assert(math.abs(got - want) < 0.01 * span,
        s"bin=$b q=$qi got=$got want=$want")
    }
  }
}
