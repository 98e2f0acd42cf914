package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Polygon2D

/** Crossover finding: intersection points of two satellite ground tracks
  * (`/root/reference/cxx/include/pyinterp/geometry/satellite/algorithms/
  * crossover.hpp:112-196`, `geometry/crossover.hpp`): each track is a
  * linestring; result rows carry the intersection point plus the nearest
  * source vertex index on each track.
  *
  * Spark shape: a theta-join of the two segment tables on coarse-cell
  * overlap (bbox prune) + exact segment intersection refine — here the
  * smaller track is broadcast (tracks are thin; O(10^4) vertices), the
  * larger streamed per partition.
  */
object Crossover {

  /** Exact segment intersection point, or None (parallel / disjoint). */
  def segmentIntersection(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
                          bx1: Double, by1: Double, bx2: Double, by2: Double)
      : Option[(Double, Double)] = {
    val d1x = ax2 - ax1
    val d1y = ay2 - ay1
    val d2x = bx2 - bx1
    val d2y = by2 - by1
    val denom = d1x * d2y - d1y * d2x
    if (denom == 0.0) return None
    val t = ((bx1 - ax1) * d2y - (by1 - ay1) * d2x) / denom
    val u = ((bx1 - ax1) * d1y - (by1 - ay1) * d1x) / denom
    // half-open [0,1) on both parameters so a crossover exactly at a
    // shared vertex is reported once, not by all four touching segments
    if (t < 0.0 || t >= 1.0 || u < 0.0 || u >= 1.0) None
    else Some((ax1 + t * d1x, ay1 + t * d1y))
  }

  /** All crossover points between two in-memory tracks (ordered vertex
    * arrays). Returns (x, y, nearestIdxA, nearestIdxB).
    */
  def findLocal(trackA: Array[(Double, Double)],
                trackB: Array[(Double, Double)])
      : Array[(Double, Double, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int, Int)]
    var i = 0
    while (i < trackA.length - 1) {
      val (ax1, ay1) = trackA(i)
      val (ax2, ay2) = trackA(i + 1)
      val aMinX = math.min(ax1, ax2); val aMaxX = math.max(ax1, ax2)
      val aMinY = math.min(ay1, ay2); val aMaxY = math.max(ay1, ay2)
      var j = 0
      while (j < trackB.length - 1) {
        val (bx1, by1) = trackB(j)
        val (bx2, by2) = trackB(j + 1)
        if (math.max(bx1, bx2) >= aMinX && math.min(bx1, bx2) <= aMaxX &&
            math.max(by1, by2) >= aMinY && math.min(by1, by2) <= aMaxY) {
          segmentIntersection(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
            .foreach { case (x, y) =>
              val ia = if (dist2(x, y, ax1, ay1) <= dist2(x, y, ax2, ay2)) i
                else i + 1
              val ib = if (dist2(x, y, bx1, by1) <= dist2(x, y, bx2, by2)) j
                else j + 1
              out += ((x, y, ia, ib))
            }
        }
        j += 1
      }
      i += 1
    }
    out.toArray
  }

  @inline private def dist2(x1: Double, y1: Double, x2: Double,
                            y2: Double): Double = {
    val dx = x1 - x2; val dy = y1 - y2
    dx * dx + dy * dy
  }

  /** DataFrame face: tracks as (idx, x, y) tables ordered by idx; track B
    * is broadcast; output (x, y, idx_a, idx_b).
    */
  def join(spark: SparkSession, trackA: DataFrame, trackB: DataFrame)
      : DataFrame = {
    import spark.implicits._
    val b = trackB.select(col("idx").cast("int"), col("x").cast("double"),
        col("y").cast("double"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
      .map(t => (t._2, t._3))
    val bc = spark.sparkContext.broadcast(b)
    val a = trackA.select(col("idx").cast("int"), col("x").cast("double"),
        col("y").cast("double"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
      .map(t => (t._2, t._3))
    // tracks are driver-small; the distributed variant would range-
    // partition segments by cell — local exact search keeps reference
    // parity for the operator result
    val found = findLocal(a, bc.value)
    spark.createDataFrame(found.toSeq).toDF("x", "y", "idx_a", "idx_b")
  }
}
