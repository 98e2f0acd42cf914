package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SwathOptionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val orbit = {
    val incl = math.toRadians(66.0)
    val pts = (0 until 1100).map { k =>
      val t = k * 10.0
      val u = 2.0 * math.Pi * t / 6000.0
      val lat = math.toDegrees(math.asin(math.sin(incl) * math.sin(u)))
      val lon = math.toDegrees(math.atan2(
        math.cos(incl) * math.sin(u), math.cos(u))) - t * (360.0 / 86400.0)
      (t, (((lon + 180.0) % 360.0 + 360.0) % 360.0) - 180.0, lat)
    }
    graft.core.OrbitEphemeris.calculateOrbit(500000.0,
      pts.map(_._2).toArray, pts.map(_._3).toArray, pts.map(_._1).toArray,
      alongTrackResolutionKm = 100.0, upsampleStep = 1e9)
  }

  test("insert_central_pixel adds a nadir column at x_ac = 0") {
    val base = OrbitOps.swathPoints(spark, orbit,
      acrossTrackResolutionKm = 10.0, halfSwathKm = 60.0, halfGapKm = 10.0)
    val withC = OrbitOps.swathPoints(spark, orbit,
      acrossTrackResolutionKm = 10.0, halfSwathKm = 60.0, halfGapKm = 10.0,
      insertCentralPixel = true)
    val nLines = base.select("pass_number", "line").distinct().count()
    assert(withC.count() === base.count() + nLines)
    val central = withC.filter(col("x_ac") === 0.0)
    assert(central.count() === nLines)
    assert(central.select(countDistinct(col("pixel"))).head.getLong(0) === 1)
  }

  test("requirement-bounds mask keeps only in-range pixels") {
    val masked = OrbitOps.swathPoints(spark, orbit,
      acrossTrackResolutionKm = 10.0, halfSwathKm = 60.0, halfGapKm = 10.0,
      requirementBounds = Some((20000.0, 45000.0)))
    val acs = masked.select("x_ac").distinct().collect()
      .map(_.getDouble(0))
    assert(acs.nonEmpty)
    assert(acs.forall(a => math.abs(a) >= 20000.0 && math.abs(a) <= 45000.0))
  }
}
