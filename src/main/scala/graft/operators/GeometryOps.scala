package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GeometryAlgorithms => GA, PolygonClip}

/** DataFrame faces of the geometry algorithm family. Rings/lines travel
  * as interleaved coordinate arrays (x0,y0,x1,y1,...) in `array<double>`
  * columns — the columnar-friendly encoding (no WKT parsing in the hot
  * path). Every face is a narrow map stage (or one keyed shuffle for the
  * per-key hull); nothing collects.
  */
object GeometryOps {

  private def ring(a: Seq[Double]): IndexedSeq[(Double, Double)] =
    a.grouped(2).map(p => (p(0), p(1))).toIndexedSeq

  /** Per-key convex hull: (key, n_hull, hull_area). One shuffle on the
    * key; hull per group in a single pass (monotone chain is O(n log n)).
    */
  def hullPerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                 xCol: String, yCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(xCol).cast("double"),
        col(yCol).cast("double"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val pts = it.map(t => (t._2, t._3)).toIndexedSeq
        val hull = GA.convexHull(pts)
        (k, hull.length, math.abs(GA.signedArea(hull)))
      }
      .toDF(keyCol, "n_hull", "hull_area")
  }

  /** Binary predicate flags for (ringA, ringB) pairs. */
  def predicatePairs(spark: SparkSession, df: DataFrame, idCol: String,
                     ringACol: String, ringBCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(ringACol), col(ringBCol))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (id, a0, b0) =>
        val a = ring(a0)
        val b = ring(b0)
        (id, GA.intersects(a, b), GA.touches(a, b), GA.overlaps(a, b),
          GA.containsPoly(a, b), GA.equalsPoly(a, b), GA.relation(a, b),
          GA.relate(a, b))
      }
      .toDF(idCol, "intersects", "touches", "overlaps", "contains_ab",
        "equals_ab", "relation", "de9im")
  }

  /** Boolean-op areas for (ringA, ringB) pairs: intersection, union,
    * difference (A minus B). Only the intersection rings are measured
    * directly; union and difference come from inclusion-exclusion
    * (|A∪B| = |A|+|B|-|A∩B|, |A\B| = |A|-|A∩B|), which stays exact even
    * where the ring output flattens holes (clip strictly inside subject).
    */
  def clipAreas(spark: SparkSession, df: DataFrame, idCol: String,
                ringACol: String, ringBCol: String): DataFrame = {
    import spark.implicits._
    def areaOf(rs: Seq[IndexedSeq[(Double, Double)]]): Double =
      rs.map(r => math.abs(GA.signedArea(r))).sum
    df.select(col(idCol).cast("long"), col(ringACol), col(ringBCol))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (id, a0, b0) =>
        val a = ring(a0)
        val b = ring(b0)
        val inter = areaOf(PolygonClip.intersection(a, b))
        val areaA = math.abs(GA.signedArea(a))
        val areaB = math.abs(GA.signedArea(b))
        (id, inter, areaA + areaB - inter, areaA - inter)
      }
      .toDF(idCol, "inter_area", "union_area", "diff_area")
  }

  /** Unary geometry surface per row — the reference's unary algorithm
    * bindings (`cxx/src/pybind/geometry/geographic/algorithm/
    * is_valid_geographic.cpp`, `is_simple_geographic.cpp`, plus the
    * num_points / reverse / correct family): is_valid / is_simple /
    * is_empty flags, vertex and segment counts (unclosed storage: n
    * vertices span n implicit-closure segments), absolute area, the
    * signed area AFTER `correct` (always >= 0 — the CCW normalization's
    * observable), and the reversed ring's head vertex (reverse probe).
    * A narrow codegen->map stage; no shuffle.
    */
  def unaryProperties(spark: SparkSession, df: DataFrame, idCol: String,
                      ringCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(ringCol))
      .as[(Long, Seq[Double])]
      .map { case (id, r0) =>
        val r = ring(r0)
        val rev = r.reverse
        val corrected = GA.correctRing(r)
        (id, GA.isValidRing(r), GA.isSimpleRing(r), r.isEmpty, r.length,
          if (r.length < 2) 0 else r.length, math.abs(GA.signedArea(r)),
          GA.signedArea(corrected),
          rev.headOption.map(_._1).getOrElse(Double.NaN),
          rev.headOption.map(_._2).getOrElse(Double.NaN))
      }
      .toDF(idCol, "is_valid", "is_simple", "is_empty", "n_points",
        "n_segments", "area", "corrected_signed_area", "rev_head_x",
        "rev_head_y")
  }

  /** Vectorized point→polygon distance — the reference's
    * `for_each_point_distance` face
    * (`cxx/include/pyinterp/geometry/for_each_point_distance.hpp`): 0 for
    * points inside or on the ring (boost polygon distance semantics),
    * else the minimum distance to the boundary. A narrow map stage; the
    * ring travels as an interleaved-coordinate column like the other
    * geometry faces, so per-row polygons need no broadcast.
    */
  def pointDistance(spark: SparkSession, df: DataFrame, idCol: String,
                    xCol: String, yCol: String, ringCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(xCol).cast("double"),
        col(yCol).cast("double"), col(ringCol))
      .as[(Long, Double, Double, Seq[Double])]
      .map { case (id, px, py, r0) =>
        val r = ring(r0)
        val p = graft.core.Polygon2D(r.toArray)
        val d =
          if (p.coveredBy(px, py)) 0.0
          else {
            var best = Double.MaxValue
            val n = r.length
            var i = 0
            while (i < n) {
              val (ax, ay) = r(i)
              val (bx, by) = r((i + 1) % n)
              val di = GA.pointSegDistance(px, py, ax, ay, bx, by)
              if (di < best) best = di
              i += 1
            }
            best
          }
        (id, d)
      }
      .toDF(idCol, "dist")
  }

  /** Line metrics per row: simplified vertex count (Douglas-Peucker),
    * densified count, the line_interpolate(fraction) point, and length.
    */
  def lineMetrics(spark: SparkSession, df: DataFrame, idCol: String,
                  lineCol: String, tolerance: Double, maxLength: Double,
                  fraction: Double): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(lineCol))
      .as[(Long, Seq[Double])]
      .map { case (id, l0) =>
        val l = ring(l0)
        val (ix, iy) = GA.lineInterpolate(l, fraction)
        (id, GA.simplify(l, tolerance).length,
          GA.densify(l, maxLength).length, ix, iy, GA.length(l))
      }
      .toDF(idCol, "n_simplified", "n_densified", "interp_x", "interp_y",
        "line_len")
  }
}
