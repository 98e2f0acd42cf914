package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** SQL-registered functions must agree with the Column API. */
class GraftExtensionsSpec extends AnyFunSuite {
  // register into the shared session (getOrCreate would silently skip
  // withExtensions when another spec already built the session)
  lazy val spark: SparkSession = {
    val s = graft.operators.SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("sql functions resolve and match the kernels") {
    val r = spark.sql(
      """SELECT geohash_encode(11.2d, 47.8d, 40) AS cell,
        |  haversine(0.0d, 0.0d, 1.0d, 0.0d) AS hav,
        |  ecef_distance(0.0d, 0.0d, 1.0d, 0.0d) AS chord,
        |  st_within(0.5d, 0.5d, '0 0;2 0;2 2;0 2') AS inside
        |""".stripMargin).head()
    assert(r.getLong(0) === graft.core.GeoHash.encode(11.2, 47.8, 40))
    assert(math.abs(r.getDouble(1) - 111194.9) < 10.0) // mean-sphere degree
    assert(r.getDouble(2) > 110000 && r.getDouble(2) < 112000)
    assert(r.getBoolean(3))
    val area = spark.sql(
      "SELECT geohash_area(geohash_encode(11.2d, 47.8d, 20), 20) AS a")
      .head().getDouble(0)
    val h = graft.core.GeoHash.encode(11.2, 47.8, 20)
    assert(area === graft.functions.Kernels.geohashArea(h, 20))
    val nbrs = spark.sql(
      "SELECT geohash_neighbors(geohash_encode(11.2d, 47.8d, 20), 20) AS n")
      .head().getSeq[Long](0)
    assert(nbrs.length === 8)
  }
}
