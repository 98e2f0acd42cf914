package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Consecutive-vertex segments of a track via a self equi-join on
    * `idx + 1` — no global window, so a 10^9-vertex constellation table
    * still parallelizes. `idx` must be dense (0..n-1) per track, the
    * natural shape of an ephemeris vertex table.
    */
  private def segments(track: DataFrame, tag: String): DataFrame = {
    val t1 = track.select(col("idx").cast("int").as(s"i$tag"),
      col("x").cast("double").as(s"${tag}x1"),
      col("y").cast("double").as(s"${tag}y1"))
    val t2 = track.select((col("idx").cast("int") - 1).as(s"i$tag"),
      col("x").cast("double").as(s"${tag}x2"),
      col("y").cast("double").as(s"${tag}y2"))
    t1.join(t2, s"i$tag")
  }

  /** DataFrame face: tracks as (idx, x, y) tables with dense per-track
    * vertex indices; output (x, y, idx_a, idx_b).
    *
    * Distributed plan (the scaladoc sketch, now real): segments of both
    * tracks are exploded to the grid cells their bbox covers
    * (`cellSize`-sized), equi-joined on cell, refined with the exact
    * parametric intersection in pure Catalyst columns, and each hit is
    * reported only from the cell that CONTAINS the intersection point —
    * so multi-cell segment pairs need no dedup shuffle. `cellSize <= 0`
    * derives one from the combined track extent (a 4-double aggregate).
    */
  /** `maxDistanceToVertex` mirrors the reference's `predicate` filter
    * (`satellite/algorithms/crossover.hpp:63-100`): a crossover is kept
    * only when it lies within that distance of its nearest vertex on BOTH
    * tracks — geodesic (mean-sphere haversine stands in for the strategy
    * parameter) when `geodetic`, planar otherwise. Infinity disables it.
    */
  def join(spark: SparkSession, trackA: DataFrame, trackB: DataFrame,
           cellSize: Double = 0.0,
           maxDistanceToVertex: Double = Double.PositiveInfinity,
           geodetic: Boolean = false): DataFrame = {
    val segA = segments(trackA, "a")
    val segB = segments(trackB, "b")
    val cs =
      if (cellSize > 0.0) cellSize
      else {
        val r1 = segA.select(min(least(col("ax1"), col("ax2"))),
          max(greatest(col("ax1"), col("ax2"))),
          min(least(col("ay1"), col("ay2"))),
          max(greatest(col("ay1"), col("ay2")))).head()
        val r2 = segB.select(min(least(col("bx1"), col("bx2"))),
          max(greatest(col("bx1"), col("bx2"))),
          min(least(col("by1"), col("by2"))),
          max(greatest(col("by1"), col("by2")))).head()
        val w = math.max(r1.getDouble(1), r2.getDouble(1)) -
          math.min(r1.getDouble(0), r2.getDouble(0))
        val h = math.max(r1.getDouble(3), r2.getDouble(3)) -
          math.min(r1.getDouble(2), r2.getDouble(2))
        math.max(math.max(w, h) / 256.0, 1e-12)
      }

    def covered(seg: DataFrame, tag: String): DataFrame = {
      val x1 = col(s"${tag}x1"); val y1 = col(s"${tag}y1")
      val x2 = col(s"${tag}x2"); val y2 = col(s"${tag}y2")
      seg
        .withColumn("_ixs", sequence(
          floor(least(x1, x2) / cs).cast("int"),
          floor(greatest(x1, x2) / cs).cast("int")))
        .withColumn("_iys", sequence(
          floor(least(y1, y2) / cs).cast("int"),
          floor(greatest(y1, y2) / cs).cast("int")))
        .withColumn("cix", explode(col("_ixs")))
        .withColumn("ciy", explode(col("_iys")))
        .drop("_ixs", "_iys")
    }

    val joined = covered(segA, "a").join(covered(segB, "b"),
      Seq("cix", "ciy"))
    val denom = (col("ax2") - col("ax1")) * (col("by2") - col("by1")) -
      (col("ay2") - col("ay1")) * (col("bx2") - col("bx1"))
    val tPar = ((col("bx1") - col("ax1")) * (col("by2") - col("by1")) -
      (col("by1") - col("ay1")) * (col("bx2") - col("bx1"))) / col("_denom")
    val uPar = ((col("bx1") - col("ax1")) * (col("ay2") - col("ay1")) -
      (col("by1") - col("ay1")) * (col("ax2") - col("ax1"))) / col("_denom")
    val hits = joined
      .withColumn("_denom", denom)
      .filter(col("_denom") =!= 0.0)
      .withColumn("_t", tPar)
      .withColumn("_u", uPar)
      // half-open [0,1): shared-vertex crossovers are reported once
      .filter(col("_t") >= 0.0 && col("_t") < 1.0 &&
        col("_u") >= 0.0 && col("_u") < 1.0)
      .withColumn("x", col("ax1") + col("_t") * (col("ax2") - col("ax1")))
      .withColumn("y", col("ay1") + col("_t") * (col("ay2") - col("ay1")))
      // report-once rule: only the cell containing the point emits the hit
      .filter(floor(col("x") / cs).cast("int") === col("cix") &&
        floor(col("y") / cs).cast("int") === col("ciy"))
    def d2(x0: Column, y0: Column): Column =
      (col("x") - x0) * (col("x") - x0) + (col("y") - y0) * (col("y") - y0)
    val out = hits.select(col("x"), col("y"),
      when(d2(col("ax1"), col("ay1")) <= d2(col("ax2"), col("ay2")),
        col("ia")).otherwise(col("ia") + 1).as("idx_a"),
      when(d2(col("bx1"), col("by1")) <= d2(col("bx2"), col("by2")),
        col("ib")).otherwise(col("ib") + 1).as("idx_b"),
      least(d2(col("ax1"), col("ay1")), d2(col("ax2"), col("ay2")))
        .as("_da2"),
      least(d2(col("bx1"), col("by1")), d2(col("bx2"), col("by2")))
        .as("_db2"),
      when(d2(col("ax1"), col("ay1")) <= d2(col("ax2"), col("ay2")),
        struct(col("ax1"), col("ay1")))
        .otherwise(struct(col("ax2").as("ax1"), col("ay2").as("ay1")))
        .as("_va"),
      when(d2(col("bx1"), col("by1")) <= d2(col("bx2"), col("by2")),
        struct(col("bx1"), col("by1")))
        .otherwise(struct(col("bx2").as("bx1"), col("by2").as("by1")))
        .as("_vb"))
    val filtered =
      if (maxDistanceToVertex.isInfinity) out
      else if (!geodetic)
        out.filter(sqrt(col("_da2")) <= maxDistanceToVertex &&
          sqrt(col("_db2")) <= maxDistanceToVertex)
      else {
        import graft.functions.gf
        out.filter(
          gf.haversine(col("_va.ax1"), col("_va.ay1"), col("x"), col("y"))
            <= maxDistanceToVertex &&
          gf.haversine(col("_vb.bx1"), col("_vb.by1"), col("x"), col("y"))
            <= maxDistanceToVertex)
      }
    filtered.select(col("x"), col("y"), col("idx_a"), col("idx_b"))
  }
}
