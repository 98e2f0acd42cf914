package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Axis, Polygon2D}
import graft.functions.gf
import graft.functions.aggregators
import graft.operators._

/** Driver contract: one `queries` entry (+ DuckDB `oracleSql` where the
  * operator is SQL-expressible) per implemented operator of SURVEY.md §2.
  *
  * All inputs derive deterministically from the driver-generated parquet
  * tables in `sfDir` so the DuckDB oracle can reproduce them; fp-exactness
  * notes inline (integer-valued doubles keep sums exact; expression
  * nesting mirrors the SQL so IEEE results are bit-identical).
  */
object SparkEntry {

  // ---- shared derivations -------------------------------------------------

  /** Deterministic lon/lat from an integer key: multiples of 0.01 degrees,
    * identical in Spark and DuckDB (`(k*7919%36000)/100-180`).
    */
  private def lonOf(k: Column): Column =
    (k * 7919 % 36000).cast("double") / 100.0 - 180.0
  private def latOf(k: Column): Column =
    (k * 104729 % 18000).cast("double") / 100.0 - 90.0

  private val lonSql = "CAST(%s * 7919 %% 36000 AS DOUBLE) / 100.0 - 180.0"
  private val latSql = "CAST(%s * 104729 %% 18000 AS DOUBLE) / 100.0 - 90.0"

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** DuckDB SQL computing the geohash-int64 of (lonExpr, latExpr) at
    * `precision` bits — HUGEINT spread/interleave mirroring
    * `graft.core.GeoHash` exactly.
    */
  def geohashSql(lonExpr: String, latExpr: String, precision: Int): String = {
    def spread(v: String): String = {
      var e = v
      val steps = Seq(
        (16, "281470681808895"),      // 0x0000FFFF0000FFFF
        (8, "71777214294589695"),     // 0x00FF00FF00FF00FF
        (4, "1085102592571150095"),   // 0x0F0F0F0F0F0F0F0F
        (2, "3689348814741910323"),   // 0x3333333333333333
        (1, "6148914691236517205"))   // 0x5555555555555555
      steps.foreach { case (sh, mask) =>
        e = s"((($e) | (($e) << $sh)) & $mask::HUGEINT)"
      }
      e
    }
    def encodeRange(x: String, r: Int): String =
      s"(CASE WHEN ($x) >= $r.0 THEN 4294967295::HUGEINT ELSE " +
        s"CAST(trunc((($x) + $r.0) / ${2 * r}.0 * 4294967296.0) AS HUGEINT) END)"
    val latBits = spread(encodeRange(latExpr, 90))
    val lonBits = spread(encodeRange(lonExpr, 180))
    val full = s"(($latBits) | (($lonBits) << 1))"
    s"CAST(($full // ${java.math.BigInteger.valueOf(2).pow(64 - precision)}::HUGEINT) AS BIGINT)"
  }

  // ---- flagship -----------------------------------------------------------

  /** Flagship: the tile pipeline at smoke scale — spatial join of
    * synthesized imagery to cells + bicubic resample + per-pixel binning.
    */
  /** Exact all-pairs trigram-Jaccard oracle over doc_id < 200 — shared by
    * q_ngram_jaccard and q_minhash_lsh (whose banded-LSH candidates are
    * verified with the same exact Jaccard, and whose qualifying planted
    * near-dups collide deterministically on this corpus).
    */
  def trigramJaccardSql(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id,
       |  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
       |  FROM documents WHERE doc_id < 200),
       | sh AS (SELECT doc_id,
       |  list_distinct([array_to_string(tk[i:i+2], ' ')
       |    FOR i IN range(1, len(tk) - 1)]) AS s
       |  FROM toks),
       | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |     len(list_distinct(list_concat(a.s, b.s))) AS jac
       |  FROM sh a CROSS JOIN sh b
       |  WHERE a.doc_id < b.doc_id AND len(a.s) + len(b.s) > 0)
       |SELECT id_a, id_b, round(jac, 9) AS jac FROM pairs
       |WHERE jac >= $threshold""".stripMargin.replace("\n", " ")

  /** DuckDB mirror of [[graft.pipeline.ImageTableGen]]'s PNG raster: the
    * FNV-1a phash and SplitMix64 footprint draws re-run in HUGEINT
    * mod-2^64 arithmetic, the analytic field re-sampled with the same fp
    * operation ORDER (toRadians = x/180*π, not x*(π/180)), the float
    * quantization chain (round = floor(f+0.5f) on FLOAT) and the /255f
    * decode — so the engine's byte-level PNG encode→decode→features path
    * is value-checked against an independent reimplementation.
    */
  def imagePixelSql(nImages: Int, size: Int): String =
    imagePixelCte(nImages, size) +
      s"""SELECT printf('img%012d', i) AS image_id,
         | round(SUM(CAST(px AS DOUBLE)) / ${size * size}, 7) AS px_mean,
         | round(MIN(CAST(px AS DOUBLE)), 7) AS px_min,
         | round(MAX(CAST(px AS DOUBLE)), 7) AS px_max
         |FROM qv GROUP BY 1""".stripMargin.replace("\n", " ")

  /** DuckDB mirror of [[graft.operators.ImageOps.resize]] at sampled
    * output pixels: the bilinear source coordinates and weights are
    * CONSTANTS for fixed in/out shapes, computed here with the engine's
    * own fp arithmetic and embedded as literals; the 4 corner pixels come
    * from the regenerated raster (same CTE chain as [[imagePixelSql]]).
    */
  def imageResizeSql(nImages: Int, size: Int, outW: Int, outH: Int,
                     samples: Seq[(Int, Int)]): String = {
    val cols = samples.map { case (oy, ox) =>
      val sy = if (outH == 1) 0.0 else oy.toDouble * (size - 1) / (outH - 1)
      val y0 = math.min(sy.toInt, size - 2)
      val ty = sy - y0
      val sx = if (outW == 1) 0.0 else ox.toDouble * (size - 1) / (outW - 1)
      val x0 = math.min(sx.toInt, size - 2)
      val tx = sx - x0
      def p(rr: Int, cc: Int) =
        s"MAX(CASE WHEN r = $rr AND c = $cc THEN CAST(px AS DOUBLE) END)"
      s"round(CAST(CAST((1 - $tx) * ((1 - $ty) * ${p(y0, x0)} " +
        s"+ $ty * ${p(y0 + 1, x0)}) + $tx * ((1 - $ty) * ${p(y0, x0 + 1)} " +
        s"+ $ty * ${p(y0 + 1, x0 + 1)}) AS FLOAT) AS DOUBLE), 6) " +
        s"AS px_${oy}_$ox"
    }.mkString(", ")
    imagePixelCte(nImages, size) +
      s"SELECT printf('img%012d', i) AS image_id, $cols FROM qv GROUP BY 1"
  }

  private def imagePixelCte(nImages: Int, size: Int): String = {
    val M = "18446744073709551616::HUGEINT"
    val Gold = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
    // the 64x64-bit mix multiplies overflow INT128, so they run as
    // split 32-bit mulmods: (a*b) % 2^64 = (a*bl + ((a*bh) % 2^32)*2^32) % 2^64
    def mulmod(a: String, bh: Long, bl: Long): String =
      s"(($a * $bl + (($a * $bh) % 4294967296) * 4294967296) % $M)"
    val (bh1, bl1) = (0xbf58476d1ce4e5b9L >>> 32, 0xbf58476d1ce4e5b9L & 0xFFFFFFFFL)
    val (bh2, bl2) = (0x94d049bb133111ebL >>> 32, 0x94d049bb133111ebL & 0xFFFFFFFFL)
    var h = "14695981039346656037::HUGEINT"    // FNV-1a offset basis
    for (ch <- "img")
      h = s"((xor($h, ${ch.toInt}) * 1099511628211) % $M)"
    for (j <- 0 until 12) {
      val p = "1" + ("0" * (11 - j))
      h = s"((xor($h, 48 + ((i // $p) % 10)) * 1099511628211) % $M)"
    }
    val sb = new StringBuilder
    sb ++= s"WITH idx AS (SELECT i FROM range($nImages) t(i)), "
    sb ++= s"ph AS (SELECT i, $h AS st0 FROM idx)"
    for (d <- 1 to 3) {
      val carry = (1 until d).map(k => s"u$k").mkString(", ")
      val cc = if (carry.isEmpty) "" else s", $carry"
      val src = if (d == 1) "ph" else s"d${d - 1}"
      sb ++= s", s$d AS (SELECT i$cc, ((st${d - 1} + $Gold) % $M) AS st$d " +
        s"FROM $src)"
      sb ++= s", x${d}a AS (SELECT i$cc, st$d, " +
        s"xor(st$d, st$d >> 30) AS x1 FROM s$d)"
      sb ++= s", m${d}a AS (SELECT i$cc, st$d, " +
        s"${mulmod("x1", bh1, bl1)} AS z1 FROM x${d}a)"
      sb ++= s", x${d}b AS (SELECT i$cc, st$d, " +
        s"xor(z1, z1 >> 27) AS x2 FROM m${d}a)"
      sb ++= s", m${d}b AS (SELECT i$cc, st$d, " +
        s"${mulmod("x2", bh2, bl2)} AS z2 FROM x${d}b)"
      sb ++= s", m${d}c AS (SELECT i$cc, st$d, xor(z2, z2 >> 31) AS z3 " +
        s"FROM m${d}b)"
      sb ++= s", d$d AS (SELECT i$cc, st$d, " +
        s"CAST(z3 >> 11 AS DOUBLE) * 1.1102230246251565e-16 AS u$d " +
        s"FROM m${d}c)"
    }
    sb ++=
      """, geo AS (SELECT i,
        | CASE WHEN u1 < 0.2 THEN 120.0 + u2 * 2.0
        |  ELSE 80.0 + u2 * 89.5 END AS lon,
        | CASE WHEN u1 < 0.2 THEN 10.0 + u3 * 2.0
        |  ELSE -45.0 + u3 * 74.5 END AS lat
        | FROM d3)""".stripMargin
    sb ++= s""", pix AS (SELECT i, r, c,
        | lon + c * (0.5 / ${size - 1}) AS plon,
        | lat + r * (0.5 / ${size - 1}) AS plat
        | FROM geo CROSS JOIN range($size) rr(r)
        |  CROSS JOIN range($size) cc(c))""".stripMargin
    sb ++=
      """, fld AS (SELECT i, r, c,
        | sin(3 * (plon / 180.0 * pi()) * 4) * cos(2 * (plat / 180.0 * pi()) * 4)
        |  + 0.5 * sin(5 * (plon / 180.0 * pi()) * 4)
        |    * sin(4 * (plat / 180.0 * pi()) * 4) AS v
        | FROM pix)""".stripMargin
    sb ++=
      """, qv AS (SELECT i, r, c,
        | CAST(GREATEST(0, LEAST(255, CAST(floor(
        |   CAST((v + 1.5) / 3.0 AS FLOAT) * CAST(255 AS FLOAT)
        |    + CAST(0.5 AS FLOAT)) AS INTEGER))) AS FLOAT)
        |  / CAST(255 AS FLOAT) AS px
        | FROM fld) """.stripMargin
    sb.toString.replace("\n", " ")
  }

  /** DuckDB mirror of [[graft.operators.Similarity.lshTopK]]: the
    * hyperplanes are DRIVER-SIDE constants (splitmix-generated), so the
    * oracle embeds the same matrices as literal DOUBLE[] lists, rebuilds
    * every table's sign-bit bucket, unions the same-bucket candidates
    * (UNION dedups like the engine's distinct), and ranks by exact
    * cosine — the whole approximate-search pipeline is value-checked,
    * not just its recall.
    */
  def annLshSql(queryPred: String, k: Int, planes: Int, tables: Int,
                seed: Long, dims: Int): String = {
    val bucketCols = (0 until tables).map { t =>
      val m = graft.operators.Similarity.planeMatrix(planes, dims,
        seed + t * 7919L)
      val bits = (0 until planes).map { p =>
        val lst = m(p).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(emb, $lst::DOUBLE[]) >= 0 " +
          s"THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"($bits) AS b$t"
    }.mkString(", ")
    val qCols = (0 until tables).map(t => s"b$t AS qb$t").mkString(", ")
    val cand = (0 until tables).map(t =>
      s"SELECT q.qid, be.vec_id AS id FROM q JOIN be ON be.b$t = q.qb$t")
      .mkString(" UNION ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       | be AS (SELECT vec_id, emb, $bucketCols FROM e),
       | q AS (SELECT vec_id AS qid, emb AS qe, $qCols FROM be
       |  WHERE $queryPred),
       | cand AS ($cand),
       | d AS (SELECT c.qid, c.id,
       |   list_dot_product(q.qe, e.emb) /
       |    (sqrt(list_dot_product(q.qe, q.qe)) *
       |     sqrt(list_dot_product(e.emb, e.emb))) AS cos
       |  FROM cand c JOIN q ON q.qid = c.qid JOIN e ON e.vec_id = c.id),
       | r AS (SELECT qid, id, row_number() OVER
       |   (PARTITION BY qid ORDER BY cos DESC, id) AS rank FROM d)
       |SELECT qid, id, rank FROM r WHERE rank <= $k"""
      .stripMargin.replace("\n", " ")
  }

  /** Merged-period CTE chain over a (user_id, ts, te) source query: the
    * SQL mirror of [[graft.operators.Periods.merge]] (gap 0). Emits CTEs
    * named `<tag>m/<tag>g/<tag>s/<tag>per`; the final one has
    * (user_id, p_start, p_end, n).
    */
  def mergedPeriodsSql(src: String, tag: String): String =
    s"""${tag}_m AS (SELECT user_id, ts, te,
       | MAX(te) OVER (PARTITION BY user_id ORDER BY ts, te
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       | FROM ($src)),
       |${tag}_g AS (SELECT user_id, ts, te,
       | CASE WHEN prev_max IS NULL OR ts > prev_max THEN 1 ELSE 0 END
       |  AS new_grp FROM ${tag}_m),
       |${tag}_s AS (SELECT user_id, ts, te,
       | CAST(SUM(new_grp) OVER (PARTITION BY user_id ORDER BY ts, te
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |  AS grp FROM ${tag}_g),
       |${tag}_per AS (SELECT user_id, MIN(ts) AS p_start, MAX(te) AS p_end,
       | COUNT(*) AS n FROM ${tag}_s GROUP BY user_id, grp)"""
      .stripMargin.replace("\n", " ")

  /** SQL mirror of the authalic q(lat) used by geographic binning weights
    * and the exact rectangle area (same nesting as the Column/Scala
    * versions; constants printed at full double precision).
    */
  def qLatSql(latExpr: String): String = {
    val sph = graft.core.Spheroid.Wgs84
    val e2 = sph.e2
    val e = math.sqrt(e2)
    val twoE = 2.0 * e
    s"(sin(radians($latExpr)) / (1.0 - $e2 * sin(radians($latExpr)) * " +
      s"sin(radians($latExpr))) + ln((1.0 + $e * sin(radians($latExpr))) / " +
      s"(1.0 - $e * sin(radians($latExpr)))) / $twoE)"
  }

  /** Deterministic rectangle pairs for the geometry-predicate/clip
    * queries: equal 4x4 rectangles at offsets dx, dy != 0 (the
    * vertex-on-edge degenerate the published Greiner-Hormann excludes).
    */
  def rectPairs(supp: DataFrame): DataFrame = {
    val s = col("s_suppkey")
    val ax0 = (s % 7).cast("double")
    val ay0 = (s * 3 % 7).cast("double")
    val dx = ((s % 4 + 1) * (lit(1) - lit(2) * (s % 2))).cast("double")
    val dy = ((s * 3 % 4 + 1) *
      (lit(1) - lit(2) * (floor(s / 2).cast("long") % 2))).cast("double")
    def rect(x0: Column, y0: Column): Column =
      array(x0, y0, x0 + 4.0, y0, x0 + 4.0, y0 + 4.0, x0, y0 + 4.0)
    supp.select(s.as("id"), rect(ax0, ay0).as("ring_a"),
      rect(ax0 + dx, ay0 + dy).as("ring_b"))
  }

  /** SQL mirror of [[rectPairs]] as a WITH prefix defining `r`. */
  def rectPairsSqlPrefix: String =
    """WITH base AS (SELECT s_suppkey AS id,
      |  CAST(s_suppkey % 7 AS DOUBLE) AS ax0,
      |  CAST(s_suppkey * 3 % 7 AS DOUBLE) AS ay0,
      |  CAST((s_suppkey % 4 + 1) * (1 - 2 * (s_suppkey % 2)) AS DOUBLE)
      |    AS dx,
      |  CAST((s_suppkey * 3 % 4 + 1) *
      |    (1 - 2 * ((s_suppkey // 2) % 2)) AS DOUBLE) AS dy
      |  FROM supplier),
      | r AS (SELECT id, ax0, ay0, ax0 + 4.0 AS ax1, ay0 + 4.0 AS ay1,
      |  ax0 + dx AS bx0, ay0 + dy AS by0, ax0 + dx + 4.0 AS bx1,
      |  ay0 + dy + 4.0 AS by1 FROM base)
      |""".stripMargin.replace("\n", " ")

  /** DuckDB mirror of GeoText.asWktPolygonRing over the `r` rect CTE:
    * closed CCW ring, Spark's double->string rendering matches DuckDB's
    * CAST(x AS VARCHAR) on these small integer-valued doubles.
    */
  def wktRectSql: String = {
    def pt(x: String, y: String) =
      s"CAST($x AS VARCHAR) || ' ' || CAST($y AS VARCHAR)"
    s"'POLYGON ((' || ${pt("ax0", "ay0")} || ', ' || ${pt("ax1", "ay0")} " +
      s"|| ', ' || ${pt("ax1", "ay1")} || ', ' || ${pt("ax0", "ay1")} " +
      s"|| ', ' || ${pt("ax0", "ay0")} || '))'"
  }

  /** DuckDB mirror of GeoText.asGeoJsonPolygon over the rect CTE. */
  def geoJsonRectSql: String = {
    def pt(x: String, y: String) =
      s"'[' || CAST($x AS VARCHAR) || ',' || CAST($y AS VARCHAR) || ']'"
    "'{\"type\":\"Polygon\",\"coordinates\":[[' || " +
      s"${pt("ax0", "ay0")} || ',' || ${pt("ax1", "ay0")} || ',' || " +
      s"${pt("ax1", "ay1")} || ',' || ${pt("ax0", "ay1")} || ',' || " +
      s"${pt("ax0", "ay0")} || ']]}'"
  }

  /** Synthetic inclined-circular-orbit model built from the supplier
    * table: time = 60 s per key over one ~6000 s revolution.
    */
  def syntheticOrbit(s: SparkSession, dir: String)
      : graft.core.OrbitEphemeris.OrbitModel = {
    val supp = s.read.parquet(t(dir, "supplier"))
    // time step scaled so any SF's supplier count covers ~1.1 revolutions
    val n = supp.count().toDouble
    val dt = 6600.0 / n
    val u = col("s_suppkey").cast("double") * (2.0 * math.Pi * dt / 6000.0)
    val ephem = supp.select(
      (col("s_suppkey").cast("double") * dt).as("time_s"),
      (degrees(atan2(cos(lit(math.toRadians(66.0))) * sin(u), cos(u))) -
        (col("s_suppkey").cast("double") * dt) * (360.0 / 86400.0))
        .as("lon"),
      degrees(asin(sin(lit(math.toRadians(66.0))) * sin(u))).as("lat"))
    OrbitOps.orbitFromEphemeris(s, ephem, height = 500000.0,
      alongTrackResolutionKm = 100.0)
  }

  /** Fixed-resolution analytic orbit (SF-INDEPENDENT, unlike
    * [[syntheticOrbit]]): a 600-point ephemeris over 1.1 revolutions of
    * the i = 66°, T = 6000 s circular orbit under uniform Earth
    * rotation. With the resolution pinned, the pass set {2, 3, 4} and
    * its equator crossings are deterministic closed forms — the per-row
    * value-oracle face of the orbit catalog (r3 VERDICT item 3).
    */
  def syntheticOrbitFixed(s: SparkSession)
      : graft.core.OrbitEphemeris.OrbitModel = {
    val n = 600
    val dt = 6600.0 / n
    val u = col("id").cast("double") * (2.0 * math.Pi * dt / 6000.0)
    val ephem = s.range(n).select(
      (col("id").cast("double") * dt).as("time_s"),
      (degrees(atan2(cos(lit(math.toRadians(66.0))) * sin(u), cos(u))) -
        (col("id").cast("double") * dt) * (360.0 / 86400.0)).as("lon"),
      degrees(asin(sin(lit(math.toRadians(66.0))) * sin(u))).as("lat"))
    OrbitOps.orbitFromEphemeris(s, ephem, height = 500000.0,
      alongTrackResolutionKm = 100.0)
  }

  /** Constant 6x6 bicubic stencil at the (+0.5, +0.5) cell offset,
    * computed from unit-impulse windows of the local kernel (the kernel
    * is linear in z, so these ARE the interpolation weights).
    */
  lazy val bicubicMidStencil: Array[Array[Double]] = {
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    Array.tabulate(6, 6) { (a, b) =>
      val z = Array.ofDim[Double](6, 6)
      z(a)(b) = 1.0
      new graft.core.Bicubic(xs, xs, z)(2.5, 2.5)
    }
  }

  // (no akima analog: the akima slope weights use |delta m|, so the
  // kernel is NOT linear in z and impulse superposition does not apply)

  /** SQL mirror of the fixed-offset windowed kernels: stencil-weighted
    * sum over the 6x6 window around (ix, iy) of the integer grid formula.
    */
  def midStencilSql(w: Array[Array[Double]]): String = {
    val terms = (for (a <- 0 until 6; b <- 0 until 6
        if math.abs(w(a)(b)) > 1e-18) yield
      s"(${w(a)(b)}) * CAST(((o_orderkey % 34 + 1 + $a) * 31 + " +
        s"(o_orderkey * 7 % 34 + 1 + $b) * 17) % 97 AS DOUBLE)")
      .mkString(" + ")
    s"""SELECT o_orderkey, round($terms, 6) AS interp FROM orders"""
  }

  /** Seam-wrapped 2-D mid-stencil oracle: the same constant 6x6 weights
    * over a 40-column FULL-CIRCLE lattice — stencil columns index
    * modulo 40 (window origin i0-2, i0 = o % 40), so seam-crossing
    * windows are genuinely exercised. Probe x shifts by ±period cancel
    * under normalization and do not appear here.
    */
  def midStencilSeamSql(w: Array[Array[Double]]): String = {
    val terms = (for (a <- 0 until 6; b <- 0 until 6
        if math.abs(w(a)(b)) > 1e-18) yield
      s"(${w(a)(b)}) * CAST((((o_orderkey % 40 + 38 + $a) % 40) * 31 + " +
        s"(o_orderkey * 7 % 34 + 1 + $b) * 17) % 97 AS DOUBLE)")
      .mkString(" + ")
    s"""SELECT o_orderkey, round($terms, 6) AS interp FROM orders"""
  }

  /** 4-D mid-stencil oracle: the 6x6 weights on all FOUR (z, u) planes,
    * averaged — half-step z and u make the bilinear combine an exact
    * 4-way 0.25 mix.
    */
  def midStencil4dSql(w: Array[Array[Double]]): String = {
    def f(a: Int, b: Int, dk: Int, dl: Int) =
      s"CAST(((o_orderkey % 34 + 1 + $a) * 31 + " +
        s"(o_orderkey * 7 % 34 + 1 + $b) * 17 + " +
        s"(o_orderkey % 2 + $dk) * 7 + (o_orderkey * 3 % 2 + $dl) * 3)" +
        s" % 97 AS DOUBLE)"
    val terms = (for (a <- 0 until 6; b <- 0 until 6
        if math.abs(w(a)(b)) > 1e-18) yield
      s"(${w(a)(b)}) * 0.25 * (${f(a, b, 0, 0)} + ${f(a, b, 0, 1)} + " +
        s"${f(a, b, 1, 0)} + ${f(a, b, 1, 1)})")
      .mkString(" + ")
    s"""SELECT o_orderkey, round($terms, 6) AS interp FROM orders""" +
      " WHERE o_orderkey < 30000"
  }

  /** 3-D mid-stencil oracle: the same constant 6x6 weights applied to
    * BOTH z-bracketing planes of the modular lattice, averaged — the
    * half-z-step probe makes the linear combine an exact 0.5/0.5 mix.
    */
  def midStencil3dSql(w: Array[Array[Double]]): String = {
    def f(a: Int, b: Int, k: String) =
      s"CAST(((o_orderkey % 34 + 1 + $a) * 31 + " +
        s"(o_orderkey * 7 % 34 + 1 + $b) * 17 + ($k) * 7) % 97 AS DOUBLE)"
    val terms = (for (a <- 0 until 6; b <- 0 until 6
        if math.abs(w(a)(b)) > 1e-18) yield
      s"(${w(a)(b)}) * 0.5 * (${f(a, b, "o_orderkey % 4")} + " +
        s"${f(a, b, "o_orderkey % 4 + 1")})")
      .mkString(" + ")
    s"""SELECT o_orderkey, round($terms, 6) AS interp FROM orders"""
  }

  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val images = graft.pipeline.ImageTableGen.generate(spark, 64, 16)
    graft.pipeline.TilePipeline.tiles(spark, images, precision = 12,
      tileSize = 8, method = "bicubic")
      .select($"cell", $"n_images")
  }

  // ---- query catalog ------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ======== binning / statistics (§2.4) ========
    "q_binning2d_simple" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      val ax = Axis.regular(0.0, 29.0, 30)
      new Binning2D(ax, ax).simple(li,
        (col("l_partkey") % 30).cast("double") + 0.2,
        (col("l_suppkey") % 30).cast("double") + 0.2,
        col("l_quantity"))
        .select(col("ix"), col("iy"), col("count").as("cnt"),
          col("sum").as("sum_z"),
          (col("sum") / col("count")).as("mean_z"),
          col("min").as("min_z"), col("max").as("max_z"))
    }),
    "q_binning2d_linear" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      val ax = Axis.regular(0.0, 29.0, 30)
      new Binning2D(ax, ax).linear(li,
        (col("l_partkey") % 29).cast("double") + 0.25,
        (col("l_suppkey") % 29).cast("double") + 0.75,
        col("l_quantity"))
        .select(col("ix"), col("iy"), col("count").as("cnt"),
          round(col("sum_of_weights"), 6).as("sum_w"),
          round(col("sum"), 6).as("sum_wz"))
    }),
    "q_binning1d_weighted" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      val ax = Axis.regular(0.0, 19.0, 20)
      new Binning1D(ax, range = Some((0.0, 15.0))).push(li,
        (col("l_partkey") % 20).cast("double") + 0.2,
        col("l_quantity"),
        (col("l_suppkey") % 5 + 1).cast("double"))
        .select(col("ix"), col("count").as("cnt"),
          col("sum_of_weights").as("sum_w"),
          col("sum").as("sum_wz"),
          (col("sum") / col("sum_of_weights")).as("wmean"))
    }),
    "q_stats_moments" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      li.groupBy(col("l_returnflag").as("flag"))
        .agg(aggregators.stats_agg1(col("l_quantity")).as("st"))
        .select(col("flag"), col("st.count").as("cnt"),
          col("st.sum").as("sum_z"), col("st.min").as("min_z"),
          col("st.max").as("max_z"),
          (round(col("st.mean"), 9) + 0.0).as("mean_z"),
          (round(col("st.variance"), 4) + 0.0).as("var_z"),
          (round(col("st.skewness"), 4) + 0.0).as("skew_z"),
          (round(col("st.kurtosis"), 4) + 0.0).as("kurt_z"))
    }),
    "q_nd_reduce" -> ((s, dir) => {
      // DescriptiveStatistics(..., axis=(j,k)): reduce a 3-D long-format
      // grid over two dims, keep i
      val li = s.read.parquet(t(dir, "lineitem"))
      val cube = li.select((col("l_partkey") % 12).cast("int").as("i"),
        (col("l_suppkey") % 12).cast("int").as("j"),
        (col("l_orderkey") % 7).cast("int").as("k"),
        col("l_quantity").as("z"))
      NdStats.reduceAxes(cube, Seq("i", "j", "k"), Seq("j", "k"), col("z"))
        .select(col("i"), col("count").as("cnt"), col("sum").as("sum_z"),
          col("min").as("min_z"), col("max").as("max_z"),
          (round(col("mean"), 9) + 0.0).as("mean_z"),
          (round(col("variance"), 4) + 0.0).as("var_z"))
    }),
    "q_histogram2d" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      // per-bin digest; exact fields (count/min/max) oracle-checked, and
      // the per-bin sketch MEDIAN tolerance-checked against Spark's exact
      // order statistic (r3 VERDICT item 7, q_tdigest_quantiles technique
      // applied per bin): q50_ok is TRUE iff the digest median sits
      // within 1% of that bin's value range of exact percentile(0.5) —
      // single-valued bins degrade to an exact-equality check
      li.groupBy((col("l_partkey") % 8).cast("int").as("ix"),
          (col("l_suppkey") % 8).cast("int").as("iy"))
        .agg(aggregators.tdigest_agg(col("l_extendedprice"),
            Seq(0.5)).as("d"),
          expr("percentile(l_extendedprice, 0.5D)").as("ex"))
        .select(col("ix"), col("iy"), col("d.count").as("cnt"),
          col("d.min").as("min_v"), col("d.max").as("max_v"),
          (abs(col("d.quantiles")(0) - col("ex")) <=
            (col("d.max") - col("d.min")) * 0.01).as("q50_ok"))
    }),
    "q_tdigest_quantiles" -> ((s, dir) => {
      // TOLERANCE oracle through an exact-hash compare: Spark checks its
      // own sketch against Spark's EXACT order statistics (percentile) and
      // emits boolean flags; the oracle emits literal TRUE — the hash
      // matches iff every t-digest quantile is within 1% of the value
      // range of the exact quantile (reference tolerance style,
      // `tests/core/test_tdigest.py`). count stays an exact field.
      val li = s.read.parquet(t(dir, "lineitem"))
      val rtol = 0.01
      li.agg(aggregators.tdigest_agg(col("l_extendedprice"),
            Seq(0.25, 0.5, 0.75)).as("d"),
          expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
            .as("ex"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"))
        .select(col("d.count").as("cnt"),
          (abs(col("d.quantiles")(0) - col("ex")(0)) <=
            (col("mx") - col("mn")) * rtol).as("q25_ok"),
          (abs(col("d.quantiles")(1) - col("ex")(1)) <=
            (col("mx") - col("mn")) * rtol).as("q50_ok"),
          (abs(col("d.quantiles")(2) - col("ex")(2)) <=
            (col("mx") - col("mn")) * rtol).as("q75_ok"))
    }),

    // ======== cell codec (§2.7) ========
    "q_geohash_encode" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.select(col("event_id"),
          gf.geohash_encode(lonOf(col("user_id")), latOf(col("user_id")),
            40).as("cell"))
    }),
    "q_geohash_coarsen" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.select(gf.geohash_coarsen(
          gf.geohash_encode(lonOf(col("user_id")), latOf(col("user_id")), 40),
          40, 20).as("cell20"))
        .groupBy("cell20").agg(count(lit(1)).as("cnt"))
    }),
    "q_geohash_cell" -> ((s, dir) => {
      // decode / centroid / cell-area value face (SURVEY rows 42 & 45,
      // previously ScalaTest-only): the engine path de-interleaves the
      // hash (squash) and applies the exact ellipsoidal-rectangle area
      // closed form; the oracle reconstructs the SAME cell from pure
      // truncation arithmetic on (lon, lat) — no bit interleave at all —
      // and the same q(phi) form, an independent derivation end to end.
      val ev = s.read.parquet(t(dir, "events"))
      val cell = gf.geohash_encode(lonOf(col("user_id")),
        latOf(col("user_id")), 40)
      ev.select(col("event_id"), cell.as("cell"))
        .select(col("event_id"),
          round(gf.geohash_lon(col("cell"), 40), 9).as("c_lon"),
          round(gf.geohash_lat(col("cell"), 40), 9).as("c_lat"),
          round(gf.geohash_area(col("cell"), 40), 4).as("area_m2"))
    }),
    "q_axis_lookup" -> ((s, dir) => {
      import s.implicits._
      // Axis.findIndex/contains + TemporalAxis unit conversion value face
      // (SURVEY rows 8 & 49, previously ScalaTest-only): a broadcast
      // regular axis probed per row — the grid-lookup primitive every
      // interpolator rides — with out-of-range probes exercising the
      // unbounded -1 contract, plus exact datetime64-style tick casts
      // (upcast multiplies, downcast FLOOR-divides, also for the
      // pre-epoch ticks this probe set includes).
      val ax = graft.core.Axis.regular(0.0, 24.0, 97)
      val bc = s.sparkContext.broadcast(ax)
      val ev = s.read.parquet(t(dir, "events"))
      ev.select(col("event_id"),
          ((col("event_id") % 256).cast("double") / 10.0 - 2.0).as("x"),
          ((col("event_id") % 1000 - 500) * 37).as("ms"))
        .as[(Long, Double, Long)]
        .mapPartitions { it =>
          val a = bc.value
          it.map { case (id, x, ms) =>
            (id, a.findIndex(x, bounded = false), a.contains(x),
              graft.core.TemporalAxis.convert(ms, "ms", "us"),
              graft.core.TemporalAxis.convert(ms, "ms", "s"))
          }
        }
        .toDF("event_id", "idx", "inside", "t_us", "t_s")
    }),

    // ======== geodesy (§2.2) ========
    "q_lla_to_ecef" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.select(col("user_id")).distinct()
        .select(col("user_id"),
          round(gf.ecef_distance(lonOf(col("user_id")), latOf(col("user_id")),
            lit(0.0), lit(0.0)), 3).as("dist_to_origin"))
    }),

    // ======== joins (§2.3) ========
    "q_pip_join" -> ((s, dir) => {
      val cust = s.read.parquet(t(dir, "customer"))
      val pts = cust.select(col("c_custkey"),
        ((col("c_custkey") % 100).cast("double") / 10.0).as("x"),
        ((col("c_custkey") * 7 % 100).cast("double") / 10.0).as("y"))
      PipJoin.broadcastJoin(s, pts, "x", "y",
        Seq((1L, SparkEntry.pentagon)))
        .select(col("c_custkey"), col("poly_id"))
    }),
    "q_knn_join" -> ((s, dir) => {
      val part = s.read.parquet(t(dir, "part"))
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 50).cast("double").as("x"),
        (col("p_partkey") * 13 % 50).cast("double").as("y"),
        (col("p_partkey") % 97).cast("double").as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 50).cast("double") + 0.3).as("x"),
        ((col("s_suppkey") * 3 % 50).cast("double") + 0.7).as("y"))
      KnnJoin.knnJoinFlat(s, build, probe,
          KnnJoin.Config(k = 4, geodetic = false))
        .select(col("qid"), col("nid"), col("rank"))
    }),
    "q_knn_idw" -> ((s, dir) => {
      val part = s.read.parquet(t(dir, "part"))
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 50).cast("double").as("x"),
        (col("p_partkey") * 13 % 50).cast("double").as("y"),
        (col("p_partkey") % 97).cast("double").as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 50).cast("double") + 0.3).as("x"),
        ((col("s_suppkey") * 3 % 50).cast("double") + 0.7).as("y"))
      KnnJoin.idw(s, build, probe, KnnJoin.Config(k = 4, geodetic = false))
        .select(col("qid"), round(col("value"), 6).as("idw"),
          col("neighbors"))
    }),
    "q_knn_window_boxcar" -> ((s, dir) => {
      val part = s.read.parquet(t(dir, "part"))
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 50).cast("double").as("x"),
        (col("p_partkey") * 13 % 50).cast("double").as("y"),
        (col("p_partkey") % 97).cast("double").as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 50).cast("double") + 0.3).as("x"),
        ((col("s_suppkey") * 3 % 50).cast("double") + 0.7).as("y"))
      KnnJoin.windowFunction(s, build, probe,
          KnnJoin.Config(k = 4, geodetic = false, windowKernel = "boxcar"))
        .select(col("qid"), round(col("value"), 6).as("wval"),
          col("neighbors"))
    }),
    "q_knn_window_parzen" -> ((s, dir) => {
      // second window-kernel oracle (fixed radius -> constant scale, so
      // the piecewise-polynomial parzen weight is SQL-mirrorable term by
      // term; boxcar covers the machinery, this covers a tapered kernel)
      val part = s.read.parquet(t(dir, "part"))
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 50).cast("double").as("x"),
        (col("p_partkey") * 13 % 50).cast("double").as("y"),
        (col("p_partkey") % 97).cast("double").as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 50).cast("double") + 0.3).as("x"),
        ((col("s_suppkey") * 3 % 50).cast("double") + 0.7).as("y"))
      KnnJoin.windowFunction(s, build, probe,
          KnnJoin.Config(k = 4, radius = 3.0, geodetic = false,
            windowKernel = "parzen", windowArg = 0.0))
        // probes with no in-radius neighbor yield (NaN, 0) — the oracle's
        // GROUP BY has no such groups, so compare the populated set
        .filter(col("neighbors") > 0)
        .select(col("qid"), round(col("value"), 6).as("wval"),
          col("neighbors"))
    }),
    "q_distance_join" -> ((s, dir) => {
      // query_ball / ST_DWithin analog: all build points within radius
      val part = s.read.parquet(t(dir, "part"))
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 50).cast("double").as("x"),
        (col("p_partkey") * 13 % 50).cast("double").as("y"),
        lit(0.0).as("value"), col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 50).cast("double") + 0.3).as("x"),
        ((col("s_suppkey") * 3 % 50).cast("double") + 0.7).as("y"))
      // broadcastThreshold = 0 forces the distributed cell-join path; the
      // exact oracle proves shuffle ≡ broadcast (ShuffleParitySpec covers
      // the equivalence directly)
      KnnJoin.distanceJoin(s, build, probe, radius = 2.0,
          KnnJoin.Config(geodetic = false, broadcastThreshold = 0L))
        .select(col("qid"), col("nid"))
    }),

    // ======== grid interpolation (§2.5) ========
    "q_bilinear_grid" -> ((s, dir) => {
      val orders = s.read.parquet(t(dir, "orders"))
      val g = SparkEntry.syntheticGrid41
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 400).cast("double") / 10.0).as("x"),
        ((col("o_orderkey") * 3 % 400).cast("double") / 10.0).as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "bilinear")
        .select(col("o_orderkey"), col("value").as("interp"))
    }),
    "q_quadrivariate" -> ((s, dir) => {
      // 4-D interpolation at lattice nodes: bilinear in (x,y), linear in
      // z and u — exact node values give a closed SQL oracle
      val ax = Axis.regular(0.0, 9.0, 10)
      val az = Axis.regular(0.0, 4.0, 5)
      val au = Axis.regular(0.0, 2.0, 3)
      val vals = new Array[Double](10 * 10 * 5 * 3)
      for (i <- 0 until 10; j <- 0 until 10; k <- 0 until 5; l <- 0 until 3)
        vals(((i * 10 + j) * 5 + k) * 3 + l) =
          ((i * 31 + j * 17 + k * 7 + l * 3) % 53).toDouble
      val g = Grid4D(ax, ax, az, au, vals)
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        (col("o_orderkey") % 10).cast("double").as("x"),
        (col("o_orderkey") * 3 % 10).cast("double").as("y"),
        (col("o_orderkey") % 5).cast("double").as("z"),
        (col("o_orderkey") % 3).cast("double").as("u"))
      QuadrivariateInterpolator.quadrivariate(s, probe, "x", "y", "z", "u",
          g, "bilinear")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_univariate" -> ((s, dir) => {
      // pyinterp.univariate + univariate_derivative (linear method):
      // piecewise-linear value and exact integer slope oracle
      val g = Grid1D(Axis.regular(0.0, 40.0, 41),
        Array.tabulate(41)(i => ((i * 13) % 41).toDouble))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 380).cast("double") / 10.0 + 0.25).as("x"))
      val withV = GridInterpolator.univariate(s, probe, "x", g, "linear")
      GridInterpolator.univariate(s, withV, "x", g, "linear",
          derivative = true, outputCol = "deriv")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"),
          col("deriv"))
    }),
    "q_grid_ingest" -> ((s, dir) => {
      // CF-style grid ingestion end-to-end: long-format table -> axis
      // role inference -> Grid2D -> bilinear at nodes (exact oracle)
      val gridTable = s.range(41L * 41L).select(
        floor(col("id") / 41).cast("double").as("lon"),
        (col("id") % 41).cast("double").as("lat"),
        ((floor(col("id") / 41) * 31 + (col("id") % 41) * 17) % 97)
          .cast("double").as("sst"))
      val g = graft.sources.GridLoader.grid2d(gridTable)
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        (col("o_orderkey") % 41).cast("double").as("x"),
        (col("o_orderkey") * 7 % 41).cast("double").as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "bilinear")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_bilinear_biggrid" -> ((s, dir) => {
      // grid-AS-TABLE path: same lattice as q_grid_ingest but interpolated
      // via the distributed corner join — no driver collect, no broadcast
      // of the lattice. Probes sit at half-cell offsets so every bilinear
      // weight is exactly 0.25 and the sum is fp-exact in any order.
      val gridTable = s.range(41L * 41L).select(
        floor(col("id") / 41).cast("double").as("lon"),
        (col("id") % 41).cast("double").as("lat"),
        ((floor(col("id") / 41) * 31 + (col("id") % 41) * 17) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 40).cast("double") + 0.5).as("x"),
        ((col("o_orderkey") * 7 % 40).cast("double") + 0.5).as("y"))
      GridInterpolator.bivariateTable(s, probe, "x", "y", gridTable)
        .select(col("o_orderkey"), col("value").as("interp"))
    }),
    "q_trilinear_biggrid" -> ((s, dir) => {
      // 3-D grid-as-table: 8-corner join, half-cell probes (weights all
      // exactly 0.125 -> fp-exact in any summation order)
      val gridTable = s.range(21L * 21L * 5L).select(
        floor(col("id") / 105).cast("double").as("lon"),
        (floor(col("id") / 5) % 21).cast("double").as("lat"),
        (col("id") % 5).cast("double").as("z"),
        ((floor(col("id") / 105) * 31 + (floor(col("id") / 5) % 21) * 17 +
          (col("id") % 5) * 7) % 53).cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 20).cast("double") + 0.5).as("x"),
        ((col("o_orderkey") * 7 % 20).cast("double") + 0.5).as("y"),
        ((col("o_orderkey") % 4).cast("double") + 0.5).as("zq"))
      GridInterpolator.trivariateTable(s, probe, "x", "y", "zq", gridTable)
        .select(col("o_orderkey"), col("value").as("interp"))
    }),
    "q_bicubic_mid" -> ((s, dir) => {
      // OFF-node bicubic oracle: at a fixed half-cell offset the windowed
      // bicubic is a constant 6x6 stencil (the kernel is linear in z);
      // the oracle carries the stencil weights as literals, so the
      // distributed window extraction + evaluation is value-checked off
      // the trivial node case too
      val orders = s.read.parquet(t(dir, "orders"))
      val g = SparkEntry.syntheticGrid41
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").plus(0.5).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.5).as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "bicubic")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_bicubic_nodes" -> ((s, dir) => {
      // node fidelity: windowed bicubic AT grid nodes returns the node
      // value exactly; the integer-valued grid gives a closed SQL oracle
      val orders = s.read.parquet(t(dir, "orders"))
      val g = SparkEntry.syntheticGrid41
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "bicubic")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_akima_nodes" -> ((s, dir) => {
      // same node-fidelity contract for the separable akima path
      val orders = s.read.parquet(t(dir, "orders"))
      val g = SparkEntry.syntheticGrid41
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "akima")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_bicubic_biggrid" -> ((s, dir) => {
      // WINDOWED grid-as-table path (r3 VERDICT item 1): the same 41x41
      // lattice as q_bilinear_biggrid, interpolated bicubic through the
      // 36-corner stencil join — no driver collect, no broadcast of the
      // lattice. Probes at the q_bicubic_mid half-cell offsets, so the
      // constant 6x6 stencil oracle value-checks the distributed window
      // assembly + kernel evaluation exactly
      val gridTable = s.range(41L * 41L).select(
        floor(col("id") / 41).cast("double").as("lon"),
        (col("id") % 41).cast("double").as("lat"),
        ((floor(col("id") / 41) * 31 + (col("id") % 41) * 17) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").plus(0.5).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.5).as("y"))
      GridInterpolator.bivariateTableWindowed(s, probe, "x", "y", gridTable,
          "bicubic")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_bilinear_irregular" -> ((s, dir) => {
      // IRREGULAR-axis grid-as-table path: quadratically spaced axes
      // (node i at i(i+1)/2), probes at exact node midpoints so both
      // bracket weights are exactly 0.5 (the midpoint of consecutive
      // triangular numbers is (i0+1)²/2, all fp-exact small numbers) —
      // interp = mean of the 4 corners, same closed form as the regular
      // biggrid oracle but found via the broadcast-axis binary search
      val nn = 21
      def v(i: org.apache.spark.sql.Column) =
        (i * (i + 1) / 2).cast("double")
      val gridTable = s.range(nn.toLong * nn).select(
        v(floor(col("id") / nn)).as("lon"),
        v(col("id") % nn).as("lat"),
        ((floor(col("id") / nn) * 31 + (col("id") % nn) * 17) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val i0 = col("o_orderkey") % 20
      val j0 = col("o_orderkey") * 7 % 20
      val probe = orders.select(col("o_orderkey"),
        (((i0 + 1) * (i0 + 1)).cast("double") / 2.0).as("x"),
        (((j0 + 1) * (j0 + 1)).cast("double") / 2.0).as("y"))
      GridInterpolator.bivariateTable(s, probe, "x", "y", gridTable)
        .select(col("o_orderkey"), col("value").as("interp"))
    }),
    "q_bicubic_irregular" -> ((s, dir) => {
      // IRREGULAR-axis WINDOWED grid-as-table path: triangular-number
      // spacing, probes exactly ON interior nodes — every windowed
      // interpolant passes through its nodes, so the node value is the
      // exact oracle while the window assembly must still find and fit
      // the full 6x6 irregular stencil to produce it
      val nn = 21
      def v(i: org.apache.spark.sql.Column) =
        (i * (i + 1) / 2).cast("double")
      val gridTable = s.range(nn.toLong * nn).select(
        v(floor(col("id") / nn)).as("lon"),
        v(col("id") % nn).as("lat"),
        ((floor(col("id") / nn) * 31 + (col("id") % nn) * 17) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val i0 = col("o_orderkey") % 14 + 3
      val j0 = col("o_orderkey") * 7 % 14 + 3
      val probe = orders.select(col("o_orderkey"),
        v(i0).as("x"), v(j0).as("y"))
      GridInterpolator.bivariateTableWindowed(s, probe, "x", "y", gridTable,
          "bicubic")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_bilinear_biggrid_seam" -> ((s, dir) => {
      // PERIODIC-LONGITUDE grid-as-table path: a full-circle 40-column
      // lattice (step 1, xPeriod 40) probed at half-cell offsets in
      // EVERY lon cell including the seam cell (whose right corners wrap
      // to column 0), with probes shifted by ±period to exercise
      // normalization. Weights are exactly 0.25 -> fp-exact oracle.
      val gridTable = s.range(40L * 41L).select(
        floor(col("id") / 41).cast("double").as("lon"),
        (col("id") % 41).cast("double").as("lat"),
        ((floor(col("id") / 41) * 31 + (col("id") % 41) * 17) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 40).cast("double") + 0.5 +
          ((col("o_orderkey") % 3) - 1).cast("double") * 40.0).as("x"),
        ((col("o_orderkey") * 7 % 40).cast("double") + 0.5).as("y"))
      GridInterpolator.bivariateTable(s, probe, "x", "y", gridTable,
          xPeriod = 40.0)
        .select(col("o_orderkey"), col("value").as("interp"))
    }),
    "q_bicubic_biggrid_seam" -> ((s, dir) => {
      // PERIODIC-LONGITUDE WINDOWED grid-as-table path: the same
      // full-circle lattice interpolated bicubic through the 36-corner
      // stencil join with seam-wrapped stencil columns; probes at
      // half-cell offsets in EVERY lon cell, so windows near the seam
      // genuinely wrap. The constant 6x6 mid-stencil gives the closed
      // oracle with modular column indexes.
      val gridTable = s.range(40L * 41L).select(
        floor(col("id") / 41).cast("double").as("lon"),
        (col("id") % 41).cast("double").as("lat"),
        ((floor(col("id") / 41) * 31 + (col("id") % 41) * 17) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 40).cast("double") + 0.5 +
          ((col("o_orderkey") % 3) - 1).cast("double") * 40.0).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.5).as("y"))
      GridInterpolator.bivariateTableWindowed(s, probe, "x", "y", gridTable,
          "bicubic", xPeriod = 40.0)
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_bicubic3d_biggrid" -> ((s, dir) => {
      // 3-D WINDOWED grid-as-table path: bicubic in-plane on the two
      // z-bracketing planes of a 41x41x5 lattice + linear z combine, via
      // the 72-corner stencil join — no broadcast, no driver collect.
      // Probes at half-cell (x, y) and half-step z: the constant 6x6
      // stencil + exact 0.5/0.5 plane mix give a closed-form oracle.
      val gridTable = s.range(41L * 41L * 5L).select(
        floor(col("id") / 205).cast("double").as("lon"),
        (floor(col("id") / 5) % 41).cast("double").as("lat"),
        (col("id") % 5).cast("double").as("z"),
        ((floor(col("id") / 205) * 31 + (floor(col("id") / 5) % 41) * 17 +
          (col("id") % 5) * 7) % 97).cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").plus(0.5).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.5).as("y"),
        ((col("o_orderkey") % 4).cast("double") + 0.5).as("zq"))
      GridInterpolator.trivariateTableWindowed(s, probe, "x", "y", "zq",
          gridTable, "bicubic")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_quadrilinear_biggrid" -> ((s, dir) => {
      // 4-D grid-as-table: 16-corner join over a 21x21x3x3 lattice;
      // half-cell probes in ALL four dimensions make every corner weight
      // exactly 1/16 — fp-exact in any summation order
      val gridTable = s.range(21L * 21L * 3L * 3L).select(
        floor(col("id") / 189).cast("double").as("lon"),
        (floor(col("id") / 9) % 21).cast("double").as("lat"),
        (floor(col("id") / 3) % 3).cast("double").as("z"),
        (col("id") % 3).cast("double").as("u"),
        ((floor(col("id") / 189) * 31 + (floor(col("id") / 9) % 21) * 17 +
          (floor(col("id") / 3) % 3) * 7 + (col("id") % 3) * 3) % 53)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 20).cast("double") + 0.5).as("x"),
        ((col("o_orderkey") * 7 % 20).cast("double") + 0.5).as("y"),
        ((col("o_orderkey") % 2).cast("double") + 0.5).as("zq"),
        ((col("o_orderkey") * 3 % 2).cast("double") + 0.5).as("uq"))
      GridInterpolator.quadrivariateTable(s, probe, "x", "y", "zq", "uq",
          gridTable, uColName = "u")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_bicubic4d_biggrid" -> ((s, dir) => {
      // 4-D WINDOWED grid-as-table: bicubic in-plane on the FOUR
      // (z, u)-bracketing planes of a 41x41x3x3 lattice, bilinear
      // combine — half-step z/u probes make the plane mix an exact
      // 4-way average, so the constant 6x6 stencil closes the oracle
      val gridTable = s.range(41L * 41L * 3L * 3L).select(
        floor(col("id") / 369).cast("double").as("lon"),
        (floor(col("id") / 9) % 41).cast("double").as("lat"),
        (floor(col("id") / 3) % 3).cast("double").as("z"),
        (col("id") % 3).cast("double").as("u"),
        ((floor(col("id") / 369) * 31 + (floor(col("id") / 9) % 41) * 17 +
          (floor(col("id") / 3) % 3) * 7 + (col("id") % 3) * 3) % 97)
          .cast("double").as("sst"))
      // probe cap: the 144-corner fan-out is already stress-proven by the
      // 2-D/3-D paths at full probe count; 30k probes keep this a
      // correctness face (sf0.01's 15k orders all pass the cap, so the
      // oracle rows are identical), not the bench's dominant cost
      val orders = s.read.parquet(t(dir, "orders"))
        .filter(col("o_orderkey") < 30000)
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").plus(0.5).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.5).as("y"),
        ((col("o_orderkey") % 2).cast("double") + 0.5).as("zq"),
        ((col("o_orderkey") * 3 % 2).cast("double") + 0.5).as("uq"))
      GridInterpolator.quadrivariateTableWindowed(s, probe, "x", "y", "zq",
          "uq", gridTable, "bicubic", uColName = "u")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_bicubic3d_irregular" -> ((s, dir) => {
      // 3-D WINDOWED grid-as-table path on IRREGULAR axes: triangular
      // x/y spacing + triangular z levels (a pressure-like axis), probes
      // exactly ON interior x/y nodes and on z nodes k <= nz-2 (tz = 0,
      // so the broadcast-parity combine v0 + 0*(v1-v0) returns plane
      // k's node value exactly) — the window assembly must still fit
      // the full irregular 6x6 stencil on BOTH bracketing planes
      val nn = 21; val nz = 4
      def v(i: org.apache.spark.sql.Column) =
        (i * (i + 1) / 2).cast("double")
      val gridTable = s.range(nn.toLong * nn * nz).select(
        v(floor(col("id") / (nn * nz))).as("lon"),
        v(floor(col("id") / nz) % nn).as("lat"),
        v(col("id") % nz).as("z"),
        ((floor(col("id") / (nn * nz)) * 31 +
          (floor(col("id") / nz) % nn) * 17 + (col("id") % nz) * 7) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val i0 = col("o_orderkey") % 14 + 3
      val j0 = col("o_orderkey") * 7 % 14 + 3
      val k0 = col("o_orderkey") % 3
      val probe = orders.select(col("o_orderkey"),
        v(i0).as("x"), v(j0).as("y"), v(k0).as("zq"))
      GridInterpolator.trivariateTableWindowed(s, probe, "x", "y", "zq",
          gridTable, "bicubic")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_bicubic4d_irregular" -> ((s, dir) => {
      // 4-D WINDOWED grid-as-table path on IRREGULAR axes: node-fidelity
      // oracle — probes on interior x/y nodes with z/u on their lower
      // bracket nodes (tz = tu = 0), so the nested broadcast-parity lerp
      // collapses to plane (k,l)'s node value exactly while all four
      // bracketing planes are still assembled and fitted
      val nn = 21; val nz = 3; val nu = 3
      def v(i: org.apache.spark.sql.Column) =
        (i * (i + 1) / 2).cast("double")
      val gridTable = s.range(nn.toLong * nn * nz * nu).select(
        v(floor(col("id") / (nn * nz * nu))).as("lon"),
        v(floor(col("id") / (nz * nu)) % nn).as("lat"),
        v(floor(col("id") / nu) % nz).as("z"),
        v(col("id") % nu).as("u"),
        ((floor(col("id") / (nn * nz * nu)) * 31 +
          (floor(col("id") / (nz * nu)) % nn) * 17 +
          (floor(col("id") / nu) % nz) * 7 + (col("id") % nu) * 3) % 97)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
        .filter(col("o_orderkey") < 30000)
      val i0 = col("o_orderkey") % 14 + 3
      val j0 = col("o_orderkey") * 7 % 14 + 3
      val probe = orders.select(col("o_orderkey"),
        v(i0).as("x"), v(j0).as("y"),
        v(col("o_orderkey") % 2).as("zq"),
        v(col("o_orderkey") * 3 % 2).as("uq"))
      GridInterpolator.quadrivariateTableWindowed(s, probe, "x", "y",
          "zq", "uq", gridTable, "bicubic", uColName = "u")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),
    "q_trilinear_biggrid_seam" -> ((s, dir) => {
      // PERIODIC-LONGITUDE 3-D grid-as-table: full-circle 40-column
      // lattice (xPeriod 40), half-cell probes in EVERY lon cell with
      // ±period shifts — the seam cell's right corners wrap to column 0
      // and all 8 weights are exactly 0.125 (fp-exact any order)
      val gridTable = s.range(40L * 21L * 5L).select(
        floor(col("id") / 105).cast("double").as("lon"),
        (floor(col("id") / 5) % 21).cast("double").as("lat"),
        (col("id") % 5).cast("double").as("z"),
        ((floor(col("id") / 105) * 31 + (floor(col("id") / 5) % 21) * 17 +
          (col("id") % 5) * 7) % 53).cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 40).cast("double") + 0.5 +
          ((col("o_orderkey") % 3) - 1).cast("double") * 40.0).as("x"),
        ((col("o_orderkey") * 7 % 20).cast("double") + 0.5).as("y"),
        ((col("o_orderkey") % 4).cast("double") + 0.5).as("zq"))
      GridInterpolator.trivariateTable(s, probe, "x", "y", "zq", gridTable,
          xPeriod = 40.0)
        .select(col("o_orderkey"), col("value").as("interp"))
    }),
    "q_quadrilinear_seam" -> ((s, dir) => {
      // PERIODIC-LONGITUDE 4-D grid-as-table: full-circle 20-column
      // lattice, half-cell probes in all four dims with ±period lon
      // shifts — 16 corners at exactly 1/16, seam column wrapping to 0
      val gridTable = s.range(20L * 21L * 3L * 3L).select(
        floor(col("id") / 189).cast("double").as("lon"),
        (floor(col("id") / 9) % 21).cast("double").as("lat"),
        (floor(col("id") / 3) % 3).cast("double").as("z"),
        (col("id") % 3).cast("double").as("u"),
        ((floor(col("id") / 189) * 31 + (floor(col("id") / 9) % 21) * 17 +
          (floor(col("id") / 3) % 3) * 7 + (col("id") % 3) * 3) % 53)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 20).cast("double") + 0.5 +
          ((col("o_orderkey") % 3) - 1).cast("double") * 20.0).as("x"),
        ((col("o_orderkey") * 7 % 20).cast("double") + 0.5).as("y"),
        ((col("o_orderkey") % 2).cast("double") + 0.5).as("zq"),
        ((col("o_orderkey") * 3 % 2).cast("double") + 0.5).as("uq"))
      GridInterpolator.quadrivariateTable(s, probe, "x", "y", "zq", "uq",
          gridTable, uColName = "u", xPeriod = 20.0)
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_quadrilinear_irregular" -> ((s, dir) => {
      // 4-D grid-as-table on IRREGULAR axes (triangular spacing on all
      // four): probes at exact node midpoints of every axis — the
      // midpoint of consecutive triangular numbers is (i0+1)²/2, all
      // bracket weights exactly 0.5, so interp = mean of the 16 corners
      // (1/16 weights, fp-exact in any order) found via the broadcast
      // binary search
      val nn = 11; val nz = 3; val nu = 3
      def v(i: org.apache.spark.sql.Column) =
        (i * (i + 1) / 2).cast("double")
      def mid(i: org.apache.spark.sql.Column) =
        ((i + 1) * (i + 1)).cast("double") / 2.0
      val gridTable = s.range(nn.toLong * nn * nz * nu).select(
        v(floor(col("id") / (nn * nz * nu))).as("lon"),
        v(floor(col("id") / (nz * nu)) % nn).as("lat"),
        v(floor(col("id") / nu) % nz).as("z"),
        v(col("id") % nu).as("u"),
        ((floor(col("id") / (nn * nz * nu)) * 31 +
          (floor(col("id") / (nz * nu)) % nn) * 17 +
          (floor(col("id") / nu) % nz) * 7 + (col("id") % nu) * 3) % 53)
          .cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        mid(col("o_orderkey") % 10).as("x"),
        mid(col("o_orderkey") * 7 % 10).as("y"),
        mid(col("o_orderkey") % 2).as("zq"),
        mid(col("o_orderkey") * 3 % 2).as("uq"))
      GridInterpolator.quadrivariateTable(s, probe, "x", "y", "zq", "uq",
          gridTable, uColName = "u")
        .select(col("o_orderkey"), round(col("value"), 9).as("interp"))
    }),
    "q_bicubic_grid" -> ((s, dir) => {
      // bicubic values have no SQL closed form -> rows-only check
      val orders = s.read.parquet(t(dir, "orders"))
      val g = SparkEntry.syntheticGrid41
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 300).cast("double") / 10.0 + 5.0).as("x"),
        ((col("o_orderkey") * 3 % 300).cast("double") / 10.0 + 5.0).as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "bicubic")
        .filter(!isnan(col("value")))
        .select(col("o_orderkey"), col("value").as("interp"))
    }),

    // ======== temporal (§2.8) ========
    "q_temporal_fields" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_period_merge" -> ((s, dir) => {
      // PeriodList.merge: coalesce [ts, ts+10min] intervals per user
      val ev = s.read.parquet(t(dir, "events"))
      val withEnd = ev.select(col("user_id"), col("ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("te"))
      Periods.merge(withEnd, Seq("user_id"), "ts", "te")
        .select(col("user_id"), col("p_start"), col("p_end"),
          col("n_merged").as("n_events"))
    }),
    "q_period_intersect" -> ((s, dir) => {
      // Period::intersection over two per-user period tables (click-ish
      // vs view-ish event halves)
      val ev = s.read.parquet(t(dir, "events"))
      def half(parity: Int) = Periods.merge(
        ev.filter(col("event_id") % 2 === parity)
          .select(col("user_id"), col("ts"),
            (col("ts") + expr("INTERVAL 10 MINUTES")).as("te")),
        Seq("user_id"), "ts", "te")
        .select(col("user_id"), col("p_start"), col("p_end"))
      Periods.intersection(half(0), half(1), Seq("user_id"))
    }),
    "q_period_contains" -> ((s, dir) => {
      // find_containing: error-event dates against merged periods of the
      // user's non-error events
      val ev = s.read.parquet(t(dir, "events"))
      val periods = Periods.merge(
        ev.filter(col("event_type") =!= "error")
          .select(col("user_id"), col("ts"),
            (col("ts") + expr("INTERVAL 5 MINUTES")).as("te")),
        Seq("user_id"), "ts", "te")
        .select(col("user_id"), col("p_start"), col("p_end"))
      val dates = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("date"))
      Periods.containing(dates, periods, Seq("user_id"), "date")
        .select(col("user_id"), col("date"), col("p_start"), col("p_end"))
    }),
    "q_period_cross" -> ((s, dir) => {
      // cross_a_period + belong_to_a_period flags for error-event dates
      val ev = s.read.parquet(t(dir, "events"))
      val periods = Periods.merge(
        ev.filter(col("event_type") =!= "error")
          .select(col("user_id"), col("ts"),
            (col("ts") + expr("INTERVAL 5 MINUTES")).as("te")),
        Seq("user_id"), "ts", "te")
        .select(col("user_id"), col("p_start"), col("p_end"))
      val dates = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("date"))
      val crosses = Periods.crossAPeriod(dates, periods, Seq("user_id"),
        "date")
      val belongs = Periods.belongToAPeriod(dates, periods, Seq("user_id"),
        "date")
      crosses.join(belongs, Seq("user_id", "date"))
        .select(col("user_id"), col("date"),
          col("crosses").cast("int").as("crosses"),
          col("belongs").cast("int").as("belongs"))
    }),
    "q_period_duration" -> ((s, dir) => {
      // PeriodList::duration (covered) vs aggregate_duration per user
      val ev = s.read.parquet(t(dir, "events"))
      val raw = ev.select(col("user_id"), col("ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("te"))
      Periods.coveredDuration(raw, Seq("user_id"), "ts", "te")
    }),

    // ======== geodesic strategy family (§2.2/§2.7 spheroid ops) ========
    "q_geodesic_distance" -> ((s, dir) => {
      // Andoyer/Thomas/Vincenty mirrored term-by-term by the SQL oracle
      // (vincenty at a FIXED 8 unrolled iterations on both sides); karney
      // = converged robust path, so it is oracled at metre rounding
      val supp = s.read.parquet(t(dir, "supplier"))
      val pairs = supp.select(col("s_suppkey").as("id"),
        ((col("s_suppkey") % 60).cast("double") - 30.0).as("lon1"),
        ((col("s_suppkey") * 3 % 120).cast("double") / 2.0 - 30.0).as("lat1"),
        ((col("s_suppkey") % 60).cast("double") + 40.0).as("lon2"),
        ((col("s_suppkey") * 7 % 120).cast("double") / 2.0 - 25.0).as("lat2"))
      GeodesicOps.inverse(s, pairs, "id", "lon1", "lat1", "lon2", "lat2",
          vincentyFixedIterations = 8)
        .select(col("id"), round(col("dist_andoyer"), 2).as("d_andoyer"),
          round(col("dist_thomas"), 2).as("d_thomas"),
          round(col("dist_vincenty"), 2).as("d_vincenty"),
          round(col("dist_karney"), 0).as("d_karney_m"))
    }),
    "q_geodesic_area" -> ((s, dir) => {
      // exact ellipsoidal lon/lat-rectangle area (geohash cell area)
      val supp = s.read.parquet(t(dir, "supplier"))
      val boxes = supp.select(col("s_suppkey").as("id"),
        ((col("s_suppkey") % 36).cast("double") * 10.0 - 180.0).as("lon0"),
        ((col("s_suppkey") % 17).cast("double") * 10.0 - 85.0).as("lat0"))
        .withColumn("lon1", col("lon0") + 2.5)
        .withColumn("lat1", col("lat0") + 2.0)
      GeodesicOps.rectangleArea(s, boxes, "id", "lon0", "lat0", "lon1",
          "lat1")
        .select(col("id"),
          round(col("area_m2") / 1e6, 4).as("area_km2"))
    }),
    // ======== geometry algorithm family (§2.2/§2.9) ========
    "q_convex_hull" -> ((s, dir) => {
      // per-user hull over interior noise points plus 4 planted corner
      // points at a user-dependent scale: hull = exactly those corners
      val ev = s.read.parquet(t(dir, "events"))
      val interior = ev.select(col("user_id"),
        ((col("event_id") * 7 % 8) + 1).cast("double").as("x"),
        ((col("event_id") * 11 % 8) + 1).cast("double").as("y"))
      val scale = (col("user_id") % 5 + 9).cast("double")
      val corners = ev.select(col("user_id")).distinct()
        .select(col("user_id"), explode(array(
          struct(lit(0.0).as("x"), lit(0.0).as("y")),
          struct(scale.as("x"), lit(0.0).as("y")),
          struct(scale.as("x"), scale.as("y")),
          struct(lit(0.0).as("x"), scale.as("y")))).as("p"))
        .select(col("user_id"), col("p.x"), col("p.y"))
      GeometryOps.hullPerKey(s, interior.unionAll(corners), "user_id",
        "x", "y")
    }),
    "q_geom_predicates" -> ((s, dir) => {
      // general polygon predicates exercised on the rectangle subclass,
      // where DuckDB interval logic is the exact oracle
      val supp = s.read.parquet(t(dir, "supplier"))
      val r = SparkEntry.rectPairs(supp)
      GeometryOps.predicatePairs(s, r, "id", "ring_a", "ring_b")
        .select(col("id"), col("intersects").cast("int").as("inter"),
          col("touches").cast("int").as("touch"),
          col("overlaps").cast("int").as("overlap"),
          col("contains_ab").cast("int").as("cont_ab"),
          col("equals_ab").cast("int").as("eq_ab"),
          col("de9im"))
    }),
    "q_polygon_clip" -> ((s, dir) => {
      // Greiner-Hormann union/intersection/difference vs the closed
      // rectangle-overlap form
      val supp = s.read.parquet(t(dir, "supplier"))
      val r = SparkEntry.rectPairs(supp)
      GeometryOps.clipAreas(s, r, "id", "ring_a", "ring_b")
        .select(col("id"), round(col("inter_area"), 6).as("inter_area"),
          round(col("union_area"), 6).as("union_area"),
          round(col("diff_area"), 6).as("diff_area"))
    }),
    "q_wkt_roundtrip" -> ((s, dir) => {
      // WKT + GeoJSON text IO (reference wkt_geographic.cpp /
      // geojson_geographic.cpp): emit closed POLYGON text of ring_a,
      // parse it back, flag the round-trip against the stored unclosed
      // ring; DuckDB rebuilds both strings independently from the rect
      // corner coordinates
      val supp = s.read.parquet(t(dir, "supplier"))
      val r = SparkEntry.rectPairs(supp)
      val G = graft.functions.GeoText
      val wkt = G.asWktPolygonRing(col("ring_a"))
      val gj = G.asGeoJsonPolygon(array(col("ring_a")))
      r.select(col("id"), wkt.as("wkt"), gj.as("geojson"),
        (G.dropClosing(element_at(G.fromWktPolygon(wkt), 1)) ===
          col("ring_a")).cast("int").as("wkt_rt"),
        (G.dropClosing(element_at(G.fromGeoJsonPolygon(gj), 1)) ===
          col("ring_a")).cast("int").as("gj_rt"),
        size(element_at(G.fromWktPolygon(wkt), 1)).as("n_parsed"))
    }),
    "q_geom_unary" -> ((s, dir) => {
      // unary surface (is_valid/is_simple/is_empty, counts, area,
      // correct, reverse) over rects plus planted bowties (id%3==0:
      // vertices 3 and 4 swapped -> self-crossing, zero-area ring)
      val supp = s.read.parquet(t(dir, "supplier"))
      val r = SparkEntry.rectPairs(supp)
      def e(i: Int) = element_at(col("ring_a"), i)
      val ringCol = when(col("id") % 3 === 0,
        array(e(1), e(2), e(3), e(4), e(7), e(8), e(5), e(6)))
        .otherwise(col("ring_a"))
      GeometryOps.unaryProperties(s,
          r.select(col("id"), ringCol.as("ring")), "id", "ring")
        .select(col("id"), col("is_valid").cast("int").as("valid"),
          col("is_simple").cast("int").as("simple"),
          col("is_empty").cast("int").as("empty"),
          col("n_points"), col("n_segments"), col("area"),
          col("corrected_signed_area").as("csa"),
          col("rev_head_x"), col("rev_head_y"))
    }),
    "q_geom_transform" -> ((s, dir) => {
      // the reference's transform/convert + counting accessor tail
      // (transform_geographic.cpp boost::geometry::convert,
      // num_geometries / num_interior_rings, unique) as PURE COLUMN
      // functions over the table encoding: box→ring conversion (boost
      // ll,ul,ur,lr vertex order), member count of a multi-geometry
      // column, hole count of an outer::holes polygon column, and
      // consecutive-duplicate removal (closing point preserved)
      val supp = s.read.parquet(t(dir, "supplier"))
      val r = SparkEntry.rectPairs(supp)
      import graft.functions.gf
      def e(i: Int) = element_at(col("ring_a"), i)
      val boxRing = gf.box_to_ring(e(1), e(2), e(1) + 4.0, e(2) + 4.0)
      val multi = when(col("id") % 2 === 0,
        array(col("ring_a"), col("ring_b")))
        .otherwise(array(col("ring_a")))
      val hole = array(e(1) + 1.0, e(2) + 1.0, e(1) + 2.0, e(2) + 1.0,
        e(1) + 2.0, e(2) + 2.0, e(1) + 1.0, e(2) + 2.0)
      val poly = when(col("id") % 3 === 0, array(col("ring_a"), hole))
        .otherwise(array(col("ring_a")))
      // consecutive duplicate of vertex 2; every 5th row also appends
      // the closing point (equal to the head) — unique must PRESERVE it
      val dup0 = array(e(1), e(2), e(3), e(4), e(3), e(4), e(5), e(6),
        e(7), e(8))
      val dup = when(col("id") % 5 === 0,
        concat(dup0, array(e(1), e(2)))).otherwise(dup0)
      r.select(col("id"),
        size(boxRing).as("box_ring_len"),
        element_at(boxRing, 3).as("box_v2_x"),
        element_at(boxRing, 4).as("box_v2_y"),
        element_at(boxRing, 7).as("box_v4_x"),
        gf.num_geometries(multi).as("n_geoms"),
        gf.num_interior_rings(poly).as("n_holes"),
        gf.unique_vertex_count(col("ring_a")).as("uniq_plain"),
        gf.unique_vertex_count(dup).as("uniq_dedup"))
    }),
    "q_point_distance" -> ((s, dir) => {
      // for_each_point_distance analog: distance of scattered points to a
      // rectangle ring — interval closed form is the exact oracle (inside
      // → 0, boost polygon-distance semantics)
      val supp = s.read.parquet(t(dir, "supplier"))
      val pts = supp.select(col("s_suppkey").as("id"),
        (col("s_suppkey") % 12).cast("double").as("px"),
        when(col("s_suppkey") % 2 === 0, 5.0).otherwise(0.0).as("py"),
        array(lit(2.0), lit(2.0), lit(8.0), lit(2.0), lit(8.0), lit(8.0),
          lit(2.0), lit(8.0)).as("ring"))
      GeometryOps.pointDistance(s, pts, "id", "px", "py", "ring")
        .select(col("id"), round(col("dist"), 6).as("dist"))
    }),
    "q_line_metrics" -> ((s, dir) => {
      // simplify / densify / line_interpolate / length on per-supplier
      // L-shaped polylines with closed-form expectations
      val supp = s.read.parquet(t(dir, "supplier"))
      val el = (col("s_suppkey") % 5 + 4).cast("double")
      val lines = supp.select(col("s_suppkey").as("id"),
        array(lit(0.0), lit(0.0), el, lit(0.0), el, el).as("line"))
      GeometryOps.lineMetrics(s, lines, "id", "line", tolerance = 0.5,
          maxLength = 3.0, fraction = 0.5)
        .select(col("id"), col("n_simplified"), col("n_densified"),
          col("interp_x"), col("interp_y"), col("line_len"))
    }),
    "q_binning2d_geodesic" -> ((s, dir) => {
      // geographic (spheroid-area) linear binning weights — the wgs
      // branch of the reference binning (`pybind/binning.hpp:88-94`)
      val li = s.read.parquet(t(dir, "lineitem"))
      val ax = Axis.regular(0.0, 29.0, 30)
      new Binning2D(ax, ax).linearGeographic(li,
        (col("l_partkey") % 29).cast("double") + 0.25,
        (col("l_suppkey") % 29).cast("double") + 0.75,
        col("l_quantity"))
        .select(col("ix"), col("iy"), col("count").as("cnt"),
          round(col("sum_of_weights"), 6).as("sum_w"),
          round(col("sum"), 6).as("sum_wz"))
    }),
    "q_track_decompose" -> ((s, dir) => {
      // pass/segment decomposition: break when gap > 1h
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(t(dir, "events"))
      // order by (ts, event_id): deterministic when events share a timestamp
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("brk",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 1 HOUR"), 1)
            .otherwise(0))
        .withColumn("segment", sum(col("brk"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("segment"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("seg_start"))
    }),
    "q_fill_1d" -> ((s, dir) => {
      // fill.matrix / fill.vector: linear interpolation across null runs
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(t(dir, "events"))
      val w = Window.partitionBy("user_id").orderBy("ts")
      val base = ev.select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") =!= "error", col("value")).as("z"))
        .withColumn("rn", row_number().over(w))
      val filled = base
        .withColumn("pv", last(col("z"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("pr", last(when(col("z").isNotNull, col("rn")),
          ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("nv", first(col("z"), ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
        .withColumn("nr", first(when(col("z").isNotNull, col("rn")),
          ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
        .withColumn("filled",
          when(col("z").isNotNull, col("z"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("rn") - col("pr")).cast("double") *
                (col("nv") - col("pv")) /
                (col("nr") - col("pr")).cast("double"))
            .otherwise(lit(null)))
      filled.select(col("event_id"), round(col("filled"), 6).as("filled"))
    }),

    // ======== streaming-shape aggregation (§2.10, batch face) ========
    "q_hourly_binning" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      ev.groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sum_v"))
    }),

    "q_streaming_binning" -> ((s, dir) => {
      // §2.10 streaming ≡ batch oracle: the events table read AS A STREAM
      // through the watermarked windowed-moments aggregation, run to
      // completion into a memory sink (complete mode), then compared to
      // plain batch SQL — the mergeable-state contract, driver-checked
      val schema = s.read.parquet(t(dir, "events")).schema
      // file stream sources consume DIRECTORIES (a table is a growing
      // directory of files); the fixture is a single file, so stage it
      // into a temp dir — the one-file "ingest" of the streaming contract
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_events")
      tmp.toFile.deleteOnExit()
      val staged = tmp.resolve("events.parquet")
      staged.toFile.deleteOnExit() // dir deleteOnExit only works if empty
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(t(dir, "events")), staged,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val stream = s.readStream.schema(schema).parquet(tmp.toString)
      val agg = graft.streaming.StreamingBinning.windowedStats(stream, "ts",
        (col("user_id") % 8).cast("int"), col("value"))
      // unique sink name: a second invocation in the same session must
      // not collide with the first run's registered memory table
      val qname = "q_streaming_binning_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val q = agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
      s.table(qname).select(col("window_start"), col("cell"),
        col("count").as("cnt"), round(col("sum"), 6).as("sum_v"),
        col("min").as("min_v"), col("max").as("max_v"))
    }),

    "q_streaming_sessions" -> ((s, dir) => {
      import s.implicits._
      // §2.10 sessions: gap segmentation as a REAL file-source stream
      // through flatMapGroupsWithState (event-time state, append mode),
      // driver-compared to the batch SQL segmentation (lag + cumulative
      // break-sum in DuckDB). One far-future SENTINEL row per key is
      // appended to the staged stream so every real segment closes via
      // the gap rule INSIDE the stream — the comparison carries no
      // dependence on watermark/timeout timing: the sentinel's own open
      // segment is never emitted, and the oracle segments the raw events
      // without sentinels.
      val ev = s.read.parquet(t(dir, "events"))
      val obs = ev.select((col("user_id") % 64).as("key"), col("ts"))
      val sentinelTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
      val sent = obs.select(col("key")).distinct()
        .select(col("key"), lit(sentinelTs).as("ts"))
      val tmp =
        java.nio.file.Files.createTempDirectory("graft_stream_sessions")
      tmp.toFile.deleteOnExit()
      val staged = tmp.resolve("staged").toString
      // one part file -> the whole table lands in one micro-batch, so
      // the in-batch sort in the session function sees all rows in order
      obs.union(sent).coalesce(1).write.mode("overwrite").parquet(staged)
      val schema = s.read.parquet(staged).schema
      val stream = s.readStream.schema(schema).parquet(staged)
        .withWatermark("ts", "3650 days")
        .as[graft.streaming.StreamingSessions.Obs]
      val segs = graft.streaming.StreamingSessions.segments(s, stream,
        gapSeconds = 21600L)
      val qname = "q_streaming_sessions_sink_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val q = segs.writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      s.table(qname)
        .filter(col("seg_start") < lit(sentinelTs))
        .select(col("key"), col("seg_start").cast("long").as("t0"),
          col("seg_end").cast("long").as("t1"), col("n"))
    }),

    // ======== text / training-data ops ========
    "q_dedup_exact" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      docs.select(col("doc_id").as("id"),
          md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_dups"), min("id").as("keep_id"))
    }),
    "q_token_stats" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"),
          sum(col("n_chars")).as("sum_chars"))
    }),
    "q_lang_id" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      docs.select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_ngram_jaccard" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .filter(col("doc_id") < 200)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.2, allPairs = true)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("jac"))
    }),
    "q_minhash_lsh" -> ((s, dir) => {
      // banded xxhash64 minhash candidates + exact-Jaccard verify; the
      // qualifying pairs are the planted near-dups (jac >= 0.2), which
      // collide in at least one band deterministically on this corpus —
      // so the output equals the exact all-pairs oracle
      val docs = s.read.parquet(t(dir, "documents"))
        .filter(col("doc_id") < 200)
      Dedup.minhashLsh(docs, "doc_id", "text", shingleN = 3, bands = 8,
          rowsPerBand = 2, threshold = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("jac"))
    }),
    "q_simhash" -> ((s, dir) => {
      // xxhash64-based -> rows-only check
      val docs = s.read.parquet(t(dir, "documents"))
      Dedup.simhash(docs, "doc_id", "text")
    }),
    "q_simhash_neardup" -> ((s, dir) => {
      // simhash SEMANTIC oracle: exact-jaccard >= 0.9 pairs (the planted
      // near-duplicates) must be within 8/64 hamming bits — measured max
      // 5 on this corpus vs min 6 / mean 18 for unrelated pairs; DuckDB
      // independently derives the pair set, flags affirmed TRUE
      val docs = s.read.parquet(t(dir, "documents"))
        .filter(col("doc_id") < 200)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.9, allPairs = true)
        .select("id_a", "id_b")
      val sh = Dedup.simhash(docs, "doc_id", "text")
      pairs
        .join(sh.select(col("id").as("id_a"), col("simhash").as("sh_a")),
          "id_a")
        .join(sh.select(col("id").as("id_b"), col("simhash").as("sh_b")),
          "id_b")
        .select(col("id_a"), col("id_b"),
          (bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 8).as("close"))
    }),
    "q_doc_quality" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      docs.select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    }),

    // ======== similarity search ========
    "q_topk_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      val items = emb.select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      Similarity.bruteForceTopK(items, queries, k = 5)
        .select(col("qid"), col("id"), col("rank"))
    }),
    "q_ann_lsh_cosine" -> ((s, dir) => {
      // LSH-bucketed ANN, EXACT oracle: the hyperplanes are constants, so
      // DuckDB rebuilds the same buckets/candidates/ranking independently
      // (recall vs bruteForceTopK additionally measured in Bench)
      val emb = s.read.parquet(t(dir, "embeddings"))
      val items = emb.select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding"))
      Similarity.lshTopK(items, queries, k = 5, planes = 6, tables = 4)
        .select(col("qid"), col("id"), col("rank"))
    }),
    "q_ann_lsh_big_probe" -> ((s, dir) => {
      // item↔item self-ANN: the query side IS the item table, so the
      // broadcast plan is size-gated OFF (broadcastQueryBytes = 0 forces
      // the shuffle equi-join path — the 100-TB-shaped plan); buckets are
      // engine-specific -> rows-only check, recall@5 measured in Bench
      val emb = s.read.parquet(t(dir, "embeddings"))
      val items = emb.select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.select(col("vec_id").as("qid"), col("embedding"))
      Similarity.lshTopK(items, queries, k = 5, planes = 6, tables = 4,
          broadcastQueryBytes = 0L)
        .select(col("qid"), col("id"), col("rank"))
    }),
    "q_embedding_neardup" -> ((s, dir) => {
      // the fixture vectors are near-orthogonal (max pair cosine ~0.4),
      // so near-dups are PLANTED: vec_id < 50 gets a 2x-scaled twin at
      // id+1000 (cosine 1, and same projection signs in every LSH band,
      // so banded recall is structural, not probabilistic)
      val emb = s.read.parquet(t(dir, "embeddings"))
      val base = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("id"), col("embedding"))
      val twins = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 1000).as("id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Similarity.cosineNearDupPairs(base.unionAll(twins), threshold = 0.7,
        planesPerBand = 6, bands = 4)
    }),

    "q_video_frames" -> ((s, dir) => {
      // video frame-sampling fan-out: one synthetic clip per nation row,
      // every-3rd-frame sampling; the sampling structure (counts, frame
      // index range, motion positivity) has a closed oracle
      val n = s.read.parquet(t(dir, "nation")).count()
      val vids = MultimodalOps.synthesizeVideos(s, n, frames = 10,
        size = 16).toDF()
      MultimodalOps.frameSample(s, vids, everyN = 3)
        .groupBy(col("video_id"))
        .agg(count(lit(1)).as("n_sampled"),
          max(col("frame_idx")).as("max_frame"),
          sum(when(col("motion") > 0, 1).otherwise(0)).cast("int")
            .as("n_moving"))
        .select(substring(col("video_id"), 4, 9).cast("long").as("vid_idx"),
          col("n_sampled"), col("max_frame"), col("n_moving"))
    }),
    "q_audio_pcm" -> ((s, dir) => {
      // PCM decode contract oracle: the tone synthesis is deterministic
      // quantized trig, so DuckDB regenerates the samples from the same
      // closed form and recomputes RMS / peak / zero-crossing rate — the
      // byte-level decode path is value-checked end to end (the FFT
      // centroid stays in q_audio_features, physics-gated in ScalaTest)
      val n = s.read.parquet(t(dir, "nation")).count()
      val clips = MultimodalOps.synthesizeAudio(s, n, sampleRate = 8000,
        nSamples = 2048).toDF()
      MultimodalOps.audioFeatures(s, clips)
        .select(col("audio_id"), round(col("rms"), 6).as("rms"),
          round(col("peak"), 6).as("peak"),
          round(col("zcr_freq"), 6).as("zcr"))
    }),
    "q_audio_features" -> ((s, dir) => {
      // PCM feature extraction: the FFT spectral centroid is now VALUE-
      // checked — DuckDB regenerates the quantized samples and computes
      // the same power-spectrum centroid as a naive DFT over bins
      // 1..n/2-1 (the engine's Cooley-Tukey result differs only at fp
      // noise, ~1e-6 Hz against the 0.1 Hz rounding grid)
      val n = s.read.parquet(t(dir, "nation")).count()
      val clips = MultimodalOps.synthesizeAudio(s, n, sampleRate = 8000,
        nSamples = 2048).toDF()
      MultimodalOps.audioFeatures(s, clips)
        .select(col("audio_id"), round(col("rms"), 4).as("rms"),
          round(col("spectral_centroid"), 1).as("centroid_hz"))
    }),

    // ======== crossover / tracks (§2.3, §2.8) ========
    "q_crossover" -> ((s, dir) => {
      val supp = s.read.parquet(t(dir, "supplier"))
      val trackA = supp.select(col("s_suppkey").as("idx"),
        col("s_suppkey").cast("double").as("x"),
        ((col("s_suppkey") * 7 % 100).cast("double") / 10.0).as("y"))
      val trackB = supp.select(col("s_suppkey").as("idx"),
        col("s_suppkey").cast("double").as("x"),
        (lit(10.0) - (col("s_suppkey") * 3 % 100).cast("double") / 10.0).as("y"))
      Crossover.join(s, trackA, trackB)
        .select(round(col("x"), 9).as("x"), round(col("y"), 9).as("y"),
          col("idx_a"), col("idx_b"))
    }),

    // ======== orbit pass decomposition (§2.8) ========
    "q_orbit_pass" -> ((s, dir) => {
      // synthetic ephemeris from supplier keys: sawtooth latitude
      val supp = s.read.parquet(t(dir, "supplier"))
      val track = supp.select(
        col("s_suppkey").cast("double").as("time"),
        lit(0.0).as("lon"),
        (abs((col("s_suppkey") * 7 % 100) - 50)).cast("double").as("lat"))
      Orbit.passDecomposition(track, "time", "lat")
        .select(col("time"), col("pass_number"),
          col("ascending").cast("int").as("asc"))
    }),

    "q_orbit_passes" -> ((s, dir) => {
      // full orbit module: ephemeris -> calculate_orbit -> pass catalog
      // with equator crossings, on the SF-INDEPENDENT fixed-resolution
      // analytic orbit (r3 VERDICT item 3): every crossing has a closed
      // form (t = 3000k s, lon = (k odd ? 180 : 0) - t*360/86400), so the
      // engine's bracketing + Thomas-distance interpolation result is
      // per-row value-checked against DuckDB computing those forms
      // independently. The engine residual is ~1e-5 deg / ~1e-5 s, three
      // orders of magnitude inside the round(3)/round(1) grid. Pass 2
      // (the post-skew ascending fragment) never reaches the equator ->
      // crossing columns are NULL, which the oracle must reproduce.
      val orbit = SparkEntry.syntheticOrbitFixed(s)
      OrbitOps.passCatalog(s, orbit)
        .select(col("pass_number"),
          when(isnan(col("equator_lon")), lit(null).cast("double"))
            .otherwise(round(col("equator_lon"), 3)).as("eq_lon"),
          when(isnan(col("equator_time")), lit(null).cast("double"))
            .otherwise(round(col("equator_time"), 1)).as("eq_time"),
          (!isnan(col("equator_lon"))).as("has_crossing"))
    }),
    "q_orbit_analytic" -> ((s, dir) => {
      // closed-form orbit-catalog oracle (VERDICT r2 item 4): the
      // synthetic ephemeris is an analytic inclined circular orbit
      // (i = 66°, T = 6000 s) under uniform Earth rotation, so every
      // equator crossing sits at t = 3000·k s with longitude
      // (k odd ? 180 : 0) − t·360/86400 (`orbit.py:158-163` semantics).
      // The Spark side checks its spline-pipeline catalog against those
      // closed forms and emits booleans; the oracle emits literal TRUE —
      // the hash matches iff every crossing is on the analytic track
      // (tol 0.01°, 1 s). Swath checks: the x_ac grid equals the
      // constructed ±{10..60} km set exactly and no pixel exceeds the
      // inclination + half-swath latitude bound.
      val orbit = SparkEntry.syntheticOrbit(s, dir)
      val cat = OrbitOps.passCatalog(s, orbit)
      val er = 360.0 / 86400.0
      val k = round(col("equator_time") / 3000.0)
      val analytic = when(pmod(k.cast("long"), lit(2L)) === 1L, 180.0)
        .otherwise(0.0) - col("equator_time") * er
      val dRaw = analytic - col("equator_lon")
      val dNorm = abs(dRaw - round(dRaw / 360.0) * 360.0)
      val catFlags = cat.agg(
        (coalesce(max(when(!isnan(col("equator_lon")), dNorm)), lit(0.0))
          <= 0.01).as("lons_ok"),
        (coalesce(max(when(!isnan(col("equator_time")),
          abs(col("equator_time") - round(col("equator_time") / 3000.0)
            * 3000.0))), lit(0.0)) <= 1.0).as("times_ok"),
        (count(lit(1)) >= 1).as("has_pass"))
      val sw = OrbitOps.swathPoints(s, orbit, acrossTrackResolutionKm = 10.0,
        halfSwathKm = 60.0, halfGapKm = 10.0)
      val expectedXac = ((-6 to -1) ++ (1 to 6)).map(_ * 10000.0)
      val swFlags = sw.agg(
        (sort_array(collect_set(col("x_ac"))) ===
          typedLit(expectedXac)).as("xac_grid_ok"),
        (max(abs(col("lat"))) <= 67.0).as("swath_lat_ok"))
      // exact fan-out relation: every pass line expands to the full
      // 12-pixel across-track grid, so n_pixels ≡ 12 · n_points
      val fanFlag = sw.groupBy(col("pass_number"))
        .agg(count(lit(1)).as("n_pixels"))
        .join(cat.select(col("pass_number"), col("n_points")), "pass_number")
        .agg(coalesce(
          min((col("n_pixels") === col("n_points") * 12).cast("int")),
          lit(1)).cast("boolean").as("swath_fanout_ok"))
      catFlags.crossJoin(swFlags).crossJoin(fanFlag)
    }),
    "q_orbit_swath" -> ((s, dir) => {
      // calculate_swath fan-out on the fixed analytic orbit (r3 VERDICT
      // item 3): per-(pass, pixel) value face. The across-track grid is
      // CONSTRUCTED, not interpolated — pixel j (west->east, halfGap 10 km,
      // res 10 km, halfSwath 60 km) sits at exactly
      // x_ac = (j - 6 + (j >= 6 ? 1 : 0)) * 10000 m, constant down every
      // line of the pass (xac_const_ok pins that), and no rotated pixel
      // may exceed the inclination + half-swath latitude bound (66 deg +
      // 60 km arc ~ 0.54 deg < 67). DuckDB rebuilds the
      // {2,3,4} x {0..11} grid and the exact x_ac values independently.
      val orbit = SparkEntry.syntheticOrbitFixed(s)
      OrbitOps.swathPoints(s, orbit, acrossTrackResolutionKm = 10.0,
          halfSwathKm = 60.0, halfGapKm = 10.0)
        .groupBy(col("pass_number"), col("pixel"))
        .agg(min(col("x_ac")).as("x_ac"),
          (min(col("x_ac")) === max(col("x_ac"))).as("xac_const_ok"),
          (max(abs(col("lat"))) <= 67.0).as("lat_bound_ok"))
    }),

    "q_knn4d" -> ((s, dir) => {
      // RTree4D kNN: pure-cartesian 4-D points, cell-cogroup shuffle path
      // forced; oracle = exact 4-D distance + row_number window
      val part = s.read.parquet(t(dir, "part")).filter(col("p_partkey") < 500)
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 10).cast("double").as("x1"),
        (col("p_partkey") * 3 % 10).cast("double").as("x2"),
        (col("p_partkey") * 7 % 5).cast("double").as("x3"),
        (col("p_partkey") % 3).cast("double").as("x4"),
        (col("p_partkey") % 97).cast("double").as("value"),
        lit(0.25).as("sigma2"), col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 10).cast("double") + 0.3).as("x1"),
        ((col("s_suppkey") * 3 % 10).cast("double") + 0.3).as("x2"),
        ((col("s_suppkey") % 5).cast("double") + 0.2).as("x3"),
        ((col("s_suppkey") % 3).cast("double") + 0.1).as("x4"))
      // cellSize 4 over coordinates in [0,10): the 3x3 block always
      // covers the full lattice, so the cell join is exact here
      KnnJoin4D.knnJoinFlat(s, build, probe,
          KnnJoin4D.Config4(k = 4, cellSize = 4.0, broadcastThreshold = 0L))
        .select(col("qid"), col("nid"), col("rank"))
    }),

    // ======== geodetic kNN (ECEF metric, §2.3) ========
    "q_knn_geodetic" -> ((s, dir) => {
      val cust = s.read.parquet(t(dir, "customer"))
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = cust.select(
        lonOf(col("c_custkey")).as("x"), latOf(col("c_custkey")).as("y"),
        (col("c_custkey") % 97).cast("double").as("value"),
        col("c_custkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        (lonOf(col("s_suppkey")) + 0.005).as("x"),
        (latOf(col("s_suppkey")) + 0.005).as("y"))
      KnnJoin.knnJoinFlat(s, build, probe,
          KnnJoin.Config(k = 4, geodetic = true))
        .select(col("qid"), col("nid"), col("rank"))
    }),

    // ======== geohash base32 strings (§2.7) ========
    "q_geohash_string" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      import s.implicits._
      ev.select(col("event_id"), col("user_id")).as[(Long, Long)]
        .map { case (eid, uid) =>
          val lon = (uid * 7919 % 36000).toDouble / 100.0 - 180.0
          val lat = (uid * 104729 % 18000).toDouble / 100.0 - 90.0
          (eid, graft.core.GeoHash.toString(lon, lat, 8))
        }.toDF("event_id", "gh")
    }),

    // ======== fill / kriging / OI (rows-only; value-tested in ScalaTest) ===
    "q_fill_loess" -> ((s, dir) => {
      import s.implicits._
      // one tile per nation: 12x12 grid with deterministic holes, loess-filled
      val nations = s.read.parquet(t(dir, "nation")).select(col("n_nationkey"))
        .as[Int].collect().toSeq
      nations.toDF("n").as[Int].flatMap { n =>
        val size = 12
        val vals = Array.tabulate(size * size) { k =>
          val i = k / size
          val j = k % size
          if ((i * j + n) % 13 == 0) Double.NaN
          else ((i * 31 + j * 17 + n) % 97).toDouble
        }
        val filled = graft.core.Fill.loess(vals, size, size, 3, 3, "undefined")
        filled.zipWithIndex.iterator.map { case (v, k) =>
          // round 6 (half-up like SQL round; values are positive): the
          // oracle re-sums the 7x7 tricube stencil in a different order
          (n, k / size, k % size, math.floor(v * 1e6 + 0.5) / 1e6)
        }
      }.toDF("n", "i", "j", "filled")
    }),
    "q_fill_gauss_seidel" -> ((s, dir) => {
      import s.implicits._
      val nations = s.read.parquet(t(dir, "nation")).select(col("n_nationkey"))
        .as[Int].collect().toSeq
      nations.toDF("n").as[Int].map { n =>
        val size = 16
        val vals = Array.tabulate(size * size) { k =>
          val i = k / size
          val j = k % size
          if (i == 0 || j == 0 || i == size - 1 || j == size - 1)
            (i + 2.0 * j + n).toDouble
          else Double.NaN
        }
        val (filled, _, _) = graft.core.Fill.gaussSeidel(
          vals, size, size, maxIterations = 2000, epsilon = 1e-8)
        // the boundary i + 2j + n is harmonic, so the converged interior
        // is exactly that plane: center (8,8) -> 24 + n (the oracle)
        (n, math.round(filled(8 * size + 8) * 1000) / 1000.0)
      }.toDF("n", "center")
    }),
    "q_fill_gs_biggrid" -> ((s, dir) => {
      // DISTRIBUTED fill (grid-as-table): one 48x48 lattice relaxed as
      // 3x3 blocks with 8-cell overlapping halos (restricted additive
      // Schwarz; the lattice never sits in one task) — the fill-module
      // analog of the biggrid interpolation queries. Harmonic boundary
      // i + 2j -> the converged interior is exactly that plane, checked
      // PER CELL (2304 rows); `filled` pins the mask round-trip.
      val nn = 48
      val iC = floor(col("id") / nn)
      val jC = col("id") % nn
      val grid = s.range(nn.toLong * nn).select(
        iC.cast("double").as("x"), jC.cast("double").as("y"),
        when(iC === 0 || jC === 0 || iC === nn - 1 || jC === nn - 1,
          iC.cast("double") + jC.cast("double") * 2.0)
          .otherwise(lit(Double.NaN)).as("v"))
      // wide overlap + generous inner sweeps: per-super cost is FIXED
      // (halo shuffle + checkpoint + residual agg), so the cheap knob
      // at this lattice size is fewer supers via a 15-cell halo and
      // near-converging each block per super
      graft.operators.FillTable.gaussSeidelTable(s, grid, "x", "y", "v",
          blockSize = 16, haloWidth = 15, innerSweeps = 1000,
          maxSuperIterations = 60, epsilon = 1e-6)
        .select(col("x").cast("int").as("ci"),
          col("y").cast("int").as("cj"),
          round(col("value"), 3).as("value"),
          col("filled").cast("int").as("filled"))
    }),
    "q_fill_loess_biggrid" -> ((s, dir) => {
      // DISTRIBUTED loess fill (grid-as-table): scattered holes on a
      // 48x48 lattice, every hole fillable in ONE pass (window 2), so
      // the tricube-weighted mean has a per-cell closed form the oracle
      // recomputes — including the reference frame_index's reflected
      // edge visits (duplicates and all), which the SQL join reproduces.
      val nn = 48
      val iC = floor(col("id") / nn)
      val jC = col("id") % nn
      val grid = s.range(nn.toLong * nn).select(
        iC.cast("double").as("x"), jC.cast("double").as("y"),
        when((iC + jC) % 3 =!= 1,
          ((iC * 7 + jC * 13) % 19).cast("double") + 0.25)
          .otherwise(lit(Double.NaN)).as("v"))
      graft.operators.FillTable.loessTable(s, grid, "x", "y", "v",
          nxWin = 2, nyWin = 2, blockSize = 16, maxIterations = 5)
        .select(col("x").cast("int").as("ci"),
          col("y").cast("int").as("cj"),
          round(col("value"), 6).as("value"),
          col("filled").cast("int").as("filled"))
    }),
    "q_fill_gs_seam" -> ((s, dir) => {
      // PERIODIC-X distributed Gauss-Seidel: only the y-boundary rows
      // are known (an x-periodic sin profile + a rough i%5 component),
      // so every interior column relaxes through the WRAPPED halo —
      // a broken seam leaves the i=0/i=31 columns solving a different
      // linear system. No closed form -> tolerance-flag oracle: the
      // in-core periodic solver at tight epsilon (driver-side, 32x32)
      // is the truth; the distributed RAS solve must land within 1e-3
      // per cell (the FillTableSpec parity bound is < 1e-4). DuckDB
      // emits the same literal flags/counts.
      import s.implicits._
      val nn = 32
      val w = 2 * math.Pi / nn
      val iC = floor(col("id") / nn)
      val jC = col("id") % nn
      val grid = s.range(nn.toLong * nn).select(
        iC.cast("double").as("x"), jC.cast("double").as("y"),
        when(jC === 0 || jC === nn - 1,
          sin(iC.cast("double") * w) * 3.0 +
            jC.cast("double") * 0.5 + (iC % 5).cast("double"))
          .otherwise(lit(Double.NaN)).as("v"))
      // generous inner sweeps + few outers: on a 2x2-block 32x32 the
      // per-super fixed cost (halo shuffle + checkpoint) dominates, so
      // the cheap knob is more in-task CPU per super, not more supers
      val dist = graft.operators.FillTable.gaussSeidelTable(s, grid,
        "x", "y", "v", blockSize = 16, haloWidth = 15, innerSweeps = 1500,
        maxSuperIterations = 40, epsilon = 1e-6, periodicX = true)
      val vals = Array.tabulate(nn * nn) { k =>
        val i = k / nn; val j = k % nn
        if (j == 0 || j == nn - 1) math.sin(i * w) * 3.0 + j * 0.5 + (i % 5)
        else Double.NaN
      }
      val (core, _, _) = graft.core.Fill.gaussSeidel(vals, nn, nn,
        periodicX = true, maxIterations = 20000, epsilon = 1e-10)
      val coreDf = (0 until nn * nn)
        .map(k => (k / nn, k % nn, core(k))).toDF("ci", "cj", "truth")
      dist.select(col("x").cast("int").as("ci"),
          col("y").cast("int").as("cj"), col("value"), col("filled"))
        .join(coreDf, Seq("ci", "cj"))
        .agg(
          (max(abs(col("value") - col("truth"))) <= 1e-3).as("within_tol"),
          count(lit(1)).cast("int").as("n_cells"),
          sum(col("filled").cast("int")).cast("int").as("n_filled"),
          (sum(when(isnan(col("value")), 1).otherwise(0)) === 0)
            .as("all_finite"))
    }),
    "q_fill_loess_seam" -> ((s, dir) => {
      // PERIODIC-X distributed loess fill: the same one-pass-fillable
      // hole pattern, but x windows wrap MODULO the axis (the reference
      // frame_index's is_angle branch) instead of reflecting — seam
      // columns 0/47 draw their x neighbors across the wrap (which the
      // mapped-index tricube then weighs by the wrapped distance), so a
      // broken seam changes both the weights and the neighbor set. The
      // oracle recomputes the closed form with modular x indexes.
      val nn = 48
      val iC = floor(col("id") / nn)
      val jC = col("id") % nn
      val grid = s.range(nn.toLong * nn).select(
        iC.cast("double").as("x"), jC.cast("double").as("y"),
        when((iC + jC) % 3 =!= 1,
          ((iC * 7 + jC * 13) % 19).cast("double") + 0.25)
          .otherwise(lit(Double.NaN)).as("v"))
      graft.operators.FillTable.loessTable(s, grid, "x", "y", "v",
          nxWin = 2, nyWin = 2, blockSize = 16, maxIterations = 5,
          periodicX = true)
        .select(col("x").cast("int").as("ci"),
          col("y").cast("int").as("cj"),
          round(col("value"), 6).as("value"),
          col("filled").cast("int").as("filled"))
    }),
    "q_fill_loess_irregular" -> ((s, dir) => {
      // IRREGULAR AXES on a distributed fill: the fills are index-space
      // operators (the reference fill stencils never read axis
      // spacing), so quadratic x/y axes must reproduce the
      // q_fill_loess_biggrid values EXACTLY while round-tripping the
      // non-uniform coordinates through the value->index broadcast
      // maps. Coordinates are emitted unrounded: both engines build
      // them with the same IEEE op order (left-assoc double products),
      // so they match to the bit.
      val nn = 48
      val iL = floor(col("id") / nn)
      val jL = col("id") % nn
      val iC = iL.cast("double")
      val jC = jL.cast("double")
      val grid = s.range(nn.toLong * nn).select(
        (lit(0.1) * iC * iC + iC).as("x"),
        (lit(0.25) * jC * jC + jC).as("y"),
        when((iL + jL) % 3 =!= 1,
          ((iL * 7 + jL * 13) % 19).cast("double") + 0.25)
          .otherwise(lit(Double.NaN)).as("v"))
      graft.operators.FillTable.loessTable(s, grid, "x", "y", "v",
          nxWin = 2, nyWin = 2, blockSize = 16, maxIterations = 5)
        .select(col("x"), col("y"), round(col("value"), 6).as("value"),
          col("filled").cast("int").as("filled"))
    }),
    "q_fill_loess_ref" -> ((s, dir) => {
      // REFERENCE-DRIVER iterative loess at table scale
      // (loessReferenceTable): first-guess every hole, then re-smooth
      // the ORIGINAL holes against the previous full state. Holes come
      // in adjacent PAIRS so the converged fixed point provably differs
      // from the progressive loessTable answer (which excludes the
      // still-NaN partner on its first pass): each pair solves the 2x2
      // linear system v_A(W_A+w) - w*v_B = S_A over the tricube weights
      // of its KNOWN window — a closed form the driver computes
      // independently. Guess-independence (zonal_average vs zero) and
      // exact kernel parity are spec-pinned; the oracle gates the fixed
      // point (1e-9), hole count, and exact known-cell passthrough.
      import s.implicits._
      val nn = 48
      val iC = floor(col("id") / nn)
      val jC = col("id") % nn
      val holeC = (iC % 12 === 6 || iC % 12 === 7) && jC % 12 === 6
      val grid = s.range(nn.toLong * nn).select(
        iC.cast("double").as("x"), jC.cast("double").as("y"),
        when(!holeC, ((iC * 7 + jC * 13) % 19).cast("double") + 0.25)
          .otherwise(lit(Double.NaN)).as("v"))
      // contraction ratio per pass is ~(1+w)/(W+w+1) ~ 0.18, so 13-14
      // passes put the iterate ~2e-9 from the fixed point — the 1e-6
      // flag bound has three decades of margin at a third of the
      // bench cost of running to fp convergence
      val dist = graft.operators.FillTable.loessReferenceTable(s, grid,
        "x", "y", "v", nxWin = 3, nyWin = 3, blockSize = 16,
        maxIterations = 14, epsilon = 1e-8)
      // driver-side truth: zv for known cells, pair fixed point for holes
      def zv(i: Int, j: Int): Double = ((i * 7 + j * 13) % 19) + 0.25
      def isHole(i: Int, j: Int): Boolean =
        (i % 12 == 6 || i % 12 == 7) && j % 12 == 6
      def tri(oi: Int, oj: Int): Double = {
        val dx = oi / 3.0; val dy = oj / 3.0
        val d = math.sqrt(dx * dx + dy * dy)
        if (d > 1.0) 0.0 else { val t = 1.0 - d * d * d; t * t * t }
      }
      def sw(i: Int, j: Int): (Double, Double) = {
        var sS = 0.0; var wS = 0.0
        for (oi <- -3 to 3; oj <- -3 to 3)
          if (!isHole(i + oi, j + oj)) {
            val w = tri(oi, oj); sS += w * zv(i + oi, j + oj); wS += w
          }
        (sS, wS)
      }
      val wab = tri(1, 0)
      val truth = for (i <- 0 until nn; j <- 0 until nn) yield {
        val v =
          if (!isHole(i, j)) zv(i, j)
          else {
            val ia = if (i % 12 == 6) i else i - 1 // pair anchor
            val (sA, wA) = sw(ia, j)
            val (sB, wB) = sw(ia + 1, j)
            val den = (wA + wab) * (wB + wab) - wab * wab
            if (i == ia) (sA * (wB + wab) + wab * sB) / den
            else (sB * (wA + wab) + wab * sA) / den
          }
        (i, j, v, isHole(i, j))
      }
      val truthDf = truth.toDF("ci", "cj", "truth", "ishole")
      dist.select(col("x").cast("int").as("ci"),
          col("y").cast("int").as("cj"), col("value"), col("filled"))
        .join(truthDf, Seq("ci", "cj"))
        .agg(
          (max(when(col("ishole"), abs(col("value") - col("truth"))))
            <= 1e-6).as("within_tol"),
          count(lit(1)).cast("int").as("n_cells"),
          sum(col("filled").cast("int")).cast("int").as("n_filled"),
          (sum(when(!col("ishole") && col("value") =!= col("truth"), 1)
            .otherwise(0)) === 0).as("known_exact"))
    }),
    "q_fill_multigrid" -> ((s, dir) => {
      // fill.multigrid on the same harmonic-plane fixture as gauss_seidel:
      // converged V-cycles reproduce the plane, center = 24 + n
      import s.implicits._
      val nations = s.read.parquet(t(dir, "nation")).select(col("n_nationkey"))
        .as[Int].collect().toSeq
      nations.toDF("n").as[Int].map { n =>
        val size = 16
        val vals = Array.tabulate(size * size) { k =>
          val i = k / size
          val j = k % size
          if (i == 0 || j == 0 || i == size - 1 || j == size - 1)
            (i + 2.0 * j + n).toDouble
          else Double.NaN
        }
        val (filled, _, _) = graft.core.FillMultigrid.multigrid(
          vals, size, size, maxIterations = 300, epsilon = 1e-8)
        (n, math.round(filled(8 * size + 8) * 1000) / 1000.0)
      }.toDF("n", "center")
    }),
    "q_fill_fft" -> ((s, dir) => {
      // fill.fft_inpaint (DCT path): the spectral fixed point is
      // engine-specific, but its CONTRACT is oracle-checkable — known
      // cells preserved EXACTLY (reset each iteration), every hole filled
      // finite, and the low-pass fill stays near the known-value range
      import s.implicits._
      val nations = s.read.parquet(t(dir, "nation")).select(col("n_nationkey"))
        .as[Int].collect().toSeq
      nations.toDF("n").as[Int].map { n =>
        val size = 16
        val vals = Array.tabulate(size * size) { k =>
          val i = k / size
          val j = k % size
          if ((i * j + n) % 11 == 0) Double.NaN
          else ((i * 31 + j * 17 + n) % 29).toDouble
        }
        val (filled, _, _) = graft.core.FillMultigrid.fftInpaint(
          vals, size, size, sigma = 6.0, maxIterations = 300,
          epsilon = 1e-7)
        val knownOk = vals.indices.forall(k =>
          vals(k).isNaN || filled(k) == vals(k))
        val filledOk = vals.indices.forall(k =>
          !vals(k).isNaN ||
            (!filled(k).isNaN && filled(k) >= -5.0 && filled(k) <= 33.0))
        (n, knownOk, filledOk)
      }.toDF("n", "known_ok", "filled_ok")
    }),
    "q_kriging" -> ((s, dir) => {
      // DISTINCT lattice points (duplicate build coordinates make the
      // covariance matrix singular -> NaN) carrying the linear field
      // x + y; universal kriging with linear drift reproduces any linear
      // field exactly, which is the oracle
      val part = s.read.parquet(t(dir, "part")).filter(col("p_partkey") < 400)
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 20).cast("double").as("x"),
        floor(col("p_partkey") / 20).cast("int").mod(20).cast("double").as("y"),
        ((col("p_partkey") % 20).cast("double") +
          floor(col("p_partkey") / 20).cast("int").mod(20).cast("double"))
          .as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        ((col("s_suppkey") % 15).cast("double") + 0.5).as("x"),
        ((col("s_suppkey") * 3 % 15).cast("double") + 0.5).as("y"))
      // shuffle path (threshold 0) at a block size (precision 8 ≙ 22°
      // cells) that holds all k=16 neighbors — no driver collect
      KnnJoin.kriging(s, build, probe,
        KnnJoin.Config(k = 16, geodetic = false, broadcastThreshold = 0L,
          precision = 8),
        sigma = 1.0, lambda = 4.0,
        covariance = "matern_32", drift = Some("linear"))
        .select(col("qid"), round(col("value"), 4).as("kriged"),
          col("neighbors"))
    }),
    "q_rbf" -> ((s, dir) => {
      // same distinct lattice; probes sit ON build nodes, where RBF
      // interpolation is exact by construction — the oracle is the node
      // value x + y
      val part = s.read.parquet(t(dir, "part")).filter(col("p_partkey") < 400)
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 20).cast("double").as("x"),
        floor(col("p_partkey") / 20).cast("int").mod(20).cast("double").as("y"),
        ((col("p_partkey") % 20).cast("double") +
          floor(col("p_partkey") / 20).cast("int").mod(20).cast("double"))
          .as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        (col("s_suppkey") % 20).cast("double").as("x"),
        floor(col("s_suppkey") / 20).cast("int").mod(20).cast("double")
          .as("y"))
      KnnJoin.rbf(s, build, probe,
        KnnJoin.Config(k = 16, geodetic = false, broadcastThreshold = 0L,
          precision = 8),
        kernel = "thin_plate", smooth = 0.0)
        .select(col("qid"), round(col("value"), 4).as("rbf_value"),
          col("neighbors"))
    }),
    "q_optimal_interpolation" -> ((s, dir) => {
      // coincident-probe BLUE identity (exact oracle): with probe ≡ one
      // observation, PD kernel, DISTINCT obs points and zero observation
      // noise, w = e_i solves (C_oo) w = c_og, so the analysis returns
      // value_i exactly and the formal error sigma2 - c^T w collapses to 0
      // (`pyinterp/optimal_interpolation.py:122-153` algebra)
      val part = s.read.parquet(t(dir, "part")).filter(col("p_partkey") < 400)
      val supp = s.read.parquet(t(dir, "supplier"))
      val build = part.select(
        (col("p_partkey") % 20).cast("double").as("x"),
        floor(col("p_partkey") / 20).cast("int").mod(20).cast("double").as("y"),
        ((col("p_partkey") % 20).cast("double") +
          floor(col("p_partkey") / 20).cast("int").mod(20).cast("double"))
          .as("value"),
        col("p_partkey").as("id"))
      val probe = supp.select(col("s_suppkey").as("qid"),
        (col("s_suppkey") % 20).cast("double").as("x"),
        floor(col("s_suppkey") / 20).cast("int").mod(20).cast("double")
          .as("y"))
      KnnJoin.optimalInterpolation(s, build, probe,
        KnnJoin.Config(k = 16, geodetic = false, broadcastThreshold = 0L,
          precision = 8),
        sigma2 = 1.0,
        lengthScales = Array(1.5, 1.5), obsSigma2 = 0.0)
        // + 0.0 folds a possible round(-1e-12) = -0.0 back to 0.0 (the
        // DuckDB-vs-Spark negative-zero hash trap)
        .select(col("qid"), (round(col("value"), 4) + 0.0).as("oi_value"),
          round(col("error_variance"), 4).as("oi_err"),
          col("neighbors"))
    }),

    "q_image_pixels" -> ((s, dir) => {
      // image DECODE oracle: all-PNG fixture (lossless), DuckDB re-derives
      // every pixel byte from the FNV/SplitMix/analytic-field closed form
      // and recomputes the pixel statistics independently
      val images = graft.pipeline.ImageTableGen
        .generate(s, 64, 16, jpegFrac = 0.0).toDF()
      ImageOps.features(images)
        .select(col("image_id"),
          round(col("px_mean"), 7).as("px_mean"),
          round(col("px_min"), 7).as("px_min"),
          round(col("px_max"), 7).as("px_max"))
    }),
    // ======== multimodal image ops (rows-only; PSNR-gated in ScalaTest) ===
    "q_image_features" -> ((s, dir) => {
      val images = graft.pipeline.ImageTableGen.generate(s, 64, 16).toDF()
      ImageOps.features(images)
        .select(col("image_id"), round(col("px_mean"), 6).as("px_mean"),
          col("ahash"))
    }),
    "q_image_resize" -> ((s, dir) => {
      // bilinear resize oracle: all-PNG fixture; sampled output pixels
      // (corner, interior with fractional weights, far corner) re-derived
      // in DuckDB from the regenerated raster + literal bilinear weights
      val images = graft.pipeline.ImageTableGen
        .generate(s, 32, 16, jpegFrac = 0.0).toDF()
      ImageOps.resize(images, 8, 8)
        .select(col("image_id"),
          round(element_at(col("resized"), 1).cast("double"), 6)
            .as("px_0_0"),
          round(element_at(col("resized"), 3 * 8 + 4 + 1).cast("double"), 6)
            .as("px_3_4"),
          round(element_at(col("resized"), 7 * 8 + 7 + 1).cast("double"), 6)
            .as("px_7_7"))
    }),

    // ======== windowed grid methods (rows-only; value-tested) ========
    "q_akima_grid" -> ((s, dir) => {
      val orders = s.read.parquet(t(dir, "orders"))
      val g = SparkEntry.syntheticGrid41
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 300).cast("double") / 10.0 + 5.0).as("x"),
        ((col("o_orderkey") * 3 % 300).cast("double") / 10.0 + 5.0).as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "akima")
        .filter(!isnan(col("value")))
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),

    "q_akima_mid" -> ((s, dir) => {
      // OFF-node akima with an EXACT oracle: on the quadratic field
      // z = x² + y² every |Δm| is equal, so the akima weights cancel and
      // the interpolant collapses to the cubic Hermite with slopes
      // (m_{i-1}+m_i)/2 = 2i — a closed form; separability holds because
      // akima is invariant under additive constants (the x-pass adds a
      // per-row constant to the y-pass data). Probes sit a quarter-cell
      // off-node so the Hermite basis values are exact binary fractions.
      val ax = Axis.regular(0.0, 40.0, 41)
      val vals = new Array[Double](41 * 41)
      for (i <- 0 until 41; j <- 0 until 41)
        vals(i * 41 + j) = (i * i + j * j).toDouble
      val g = Grid2D(ax, ax, vals)
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").plus(0.25).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.25).as("y"))
      GridInterpolator.bivariate(s, probe, "x", "y", g, "akima")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),

    "q_akima_biggrid" -> ((s, dir) => {
      // the q_akima_mid quadratic-field collapse on the grid-as-TABLE
      // tile-halo path: akima rides the same WindowFit separable
      // dispatch as bicubic, so the closed-form Hermite oracle
      // value-checks the distributed window assembly for the whole
      // univariate method family (the former rows-only q_akima_grid
      // face, now value-gated)
      val gridTable = s.range(41L * 41L).select(
        floor(col("id") / 41).cast("double").as("lon"),
        (col("id") % 41).cast("double").as("lat"),
        (floor(col("id") / 41) * floor(col("id") / 41) +
          (col("id") % 41) * (col("id") % 41)).cast("double").as("sst"))
      val orders = s.read.parquet(t(dir, "orders"))
      val probe = orders.select(col("o_orderkey"),
        ((col("o_orderkey") % 34) + 3).cast("double").plus(0.25).as("x"),
        ((col("o_orderkey") * 7 % 34) + 3).cast("double").plus(0.25).as("y"))
      GridInterpolator.bivariateTableWindowed(s, probe, "x", "y", gridTable,
          "akima")
        .select(col("o_orderkey"), round(col("value"), 6).as("interp"))
    }),

    // ======== flagship pipeline (rows-only; verified in ScalaTest) ========
    "q_tile_pipeline" -> ((s, dir) => {
      val images = graft.pipeline.ImageTableGen.generate(s, 64, 16)
      graft.pipeline.TilePipeline.tiles(s, images, precision = 12,
        tileSize = 8, method = "bicubic")
        .select(col("cell"), col("n_images"))
    })
  )

  // pentagon with vertices off the 0.1 point grid (convex, ccw)
  lazy val pentagon: Polygon2D = Polygon2D(Array(
    (1.05, 0.55), (8.95, 1.15), (9.45, 6.35), (5.05, 9.85), (0.55, 5.95)))

  /** 41x41 unit grid with integer-valued synthetic field
    * f(i,j) = (i*31 + j*17) % 97 — SQL-computable corner values.
    */
  lazy val syntheticGrid41: Grid2D = {
    val ax = Axis.regular(0.0, 40.0, 41)
    val vals = new Array[Double](41 * 41)
    for (i <- 0 until 41; j <- 0 until 41)
      vals(i * 41 + j) = ((i * 31 + j * 17) % 97).toDouble
    Grid2D(ax, ax, vals)
  }

  // ---- oracle SQL ---------------------------------------------------------

  def oracleSql: Map[String, String] = {
    val knnBuild =
      """SELECT CAST(p_partkey % 50 AS DOUBLE) AS x,
        | CAST(p_partkey * 13 % 50 AS DOUBLE) AS y,
        | CAST(p_partkey % 97 AS DOUBLE) AS value, p_partkey AS id
        | FROM part""".stripMargin.replace("\n", "")
    val knnProbe =
      """SELECT s_suppkey AS qid,
        | CAST(s_suppkey % 50 AS DOUBLE) + 0.3 AS x,
        | CAST(s_suppkey * 3 % 50 AS DOUBLE) + 0.7 AS y
        | FROM supplier""".stripMargin.replace("\n", "")
    val knnRanked =
      s"""WITH b AS ($knnBuild), q AS ($knnProbe),
         | d AS (SELECT q.qid, b.id AS nid, b.value,
         |   (q.x-b.x)*(q.x-b.x)+(q.y-b.y)*(q.y-b.y) AS d2,
         |   sqrt((q.x-b.x)*(q.x-b.x)+(q.y-b.y)*(q.y-b.y)) AS dist
         |  FROM q CROSS JOIN b),
         | r AS (SELECT qid, nid, value, dist, row_number() OVER
         |   (PARTITION BY qid ORDER BY d2, nid) AS rank FROM d)
         |""".stripMargin.replace("\n", "")

    Map(
      // linear binning with constant fractional offsets (t=0.25, u=0.75,
      // exact binary fractions): the 4-bin spread has a closed unpivot form
      "q_binning2d_linear" ->
        """WITH pts AS (SELECT CAST(l_partkey % 29 AS INT) AS ix0,
          |  CAST(l_suppkey % 29 AS INT) AS iy0, l_quantity AS z
          |  FROM lineitem),
          | c AS (SELECT ix0 + d.dx AS ix, iy0 + d.dy AS iy,
          |   CAST(d.w AS DOUBLE) AS w, z
          |  FROM pts CROSS JOIN (VALUES (0, 0, 0.1875), (0, 1, 0.5625),
          |    (1, 1, 0.1875), (1, 0, 0.0625)) d(dx, dy, w))
          |SELECT ix, iy, COUNT(*) AS cnt, round(SUM(w), 6) AS sum_w,
          | round(SUM(w * z), 6) AS sum_wz
          |FROM c GROUP BY ix, iy""".stripMargin.replace("\n", " "),

      // the boundary field i + 2j + n is harmonic: the converged interior
      // equals that plane, so center (8,8) = 8 + 16 + n
      "q_fill_gauss_seidel" ->
        """SELECT n_nationkey AS n,
          | CAST(24 + n_nationkey AS DOUBLE) AS center
          |FROM nation""".stripMargin.replace("\n", " "),

      // distributed-fill plane oracle: every cell of the 48x48 lattice
      // equals i + 2j (the boundary data is harmonic), interior = filled
      "q_fill_gs_biggrid" ->
        """SELECT CAST(i AS INT) AS ci, CAST(j AS INT) AS cj,
          | round(CAST(i + 2 * j AS DOUBLE), 3) AS value,
          | CAST(CASE WHEN i > 0 AND j > 0 AND i < 47 AND j < 47
          |   THEN 1 ELSE 0 END AS INT) AS filled
          |FROM range(0, 48) ti(i), range(0, 48) tj(j)"""
          .stripMargin.replace("\n", " "),

      // distributed-loess oracle: the single-pass tricube-weighted mean
      // recomputed per hole, with the reference frame_index's REFLECTED
      // edge indexes (-1 -> 1, 48 -> 46) and mapped-index distances
      "q_fill_loess_biggrid" ->
        """WITH cells AS (SELECT i, j,
          |  CASE WHEN (i + j) % 3 <> 1
          |   THEN CAST((i * 7 + j * 13) % 19 AS DOUBLE) + 0.25 END AS z
          |  FROM range(0, 48) ti(i), range(0, 48) tj(j)),
          | offs AS (SELECT oi, oj
          |  FROM range(-2, 3) a(oi), range(-2, 3) b(oj)),
          | stencil AS (SELECT c.i, c.j,
          |   CASE WHEN c.i + o.oi < 0 THEN -(c.i + o.oi)
          |    WHEN c.i + o.oi > 47 THEN 94 - (c.i + o.oi)
          |    ELSE c.i + o.oi END AS wi,
          |   CASE WHEN c.j + o.oj < 0 THEN -(c.j + o.oj)
          |    WHEN c.j + o.oj > 47 THEN 94 - (c.j + o.oj)
          |    ELSE c.j + o.oj END AS wj
          |  FROM cells c CROSS JOIN offs o WHERE c.z IS NULL),
          | contrib AS (SELECT s.i, s.j, n.z AS nz,
          |   (s.wi - s.i) / 2.0 AS dx, (s.wj - s.j) / 2.0 AS dy
          |  FROM stencil s JOIN cells n ON n.i = s.wi AND n.j = s.wj
          |  WHERE n.z IS NOT NULL),
          | wts AS (SELECT i, j, nz,
          |  CASE WHEN sqrt(dx * dx + dy * dy) > 1.0 THEN 0.0
          |   ELSE power(1.0 - power(sqrt(dx * dx + dy * dy), 3), 3)
          |   END AS wt FROM contrib),
          | fl AS (SELECT i, j, SUM(wt * nz) / SUM(wt) AS z
          |  FROM wts GROUP BY i, j)
          |SELECT CAST(c.i AS INT) AS ci, CAST(c.j AS INT) AS cj,
          | round(COALESCE(c.z, f.z), 6) AS value,
          | CAST(CASE WHEN c.z IS NULL THEN 1 ELSE 0 END AS INT) AS filled
          |FROM cells c LEFT JOIN fl f ON f.i = c.i AND f.j = c.j"""
          .stripMargin.replace("\n", " "),

      // periodic-x gauss-seidel tolerance-flag oracle: the Spark side
      // compares the distributed solve to the in-core periodic truth
      "q_fill_gs_seam" ->
        """SELECT TRUE AS within_tol, 1024 AS n_cells,
          | 960 AS n_filled, TRUE AS all_finite"""
          .stripMargin.replace("\n", " "),

      // irregular-axis loess: identical index-space closed form, output
      // keyed by the quadratic coordinates (CAST to DOUBLE is load-
      // bearing: DuckDB's bare 0.1 is DECIMAL and would not match the
      // engine's IEEE doubles)
      "q_fill_loess_irregular" ->
        """WITH cells AS (SELECT i, j,
          |  CAST(0.1 AS DOUBLE) * i * i + i AS x,
          |  CAST(0.25 AS DOUBLE) * j * j + j AS y,
          |  CASE WHEN (i + j) % 3 <> 1
          |   THEN CAST((i * 7 + j * 13) % 19 AS DOUBLE) + 0.25 END AS z
          |  FROM range(0, 48) ti(i), range(0, 48) tj(j)),
          | offs AS (SELECT oi, oj
          |  FROM range(-2, 3) a(oi), range(-2, 3) b(oj)),
          | stencil AS (SELECT c.i, c.j,
          |   CASE WHEN c.i + o.oi < 0 THEN -(c.i + o.oi)
          |    WHEN c.i + o.oi > 47 THEN 94 - (c.i + o.oi)
          |    ELSE c.i + o.oi END AS wi,
          |   CASE WHEN c.j + o.oj < 0 THEN -(c.j + o.oj)
          |    WHEN c.j + o.oj > 47 THEN 94 - (c.j + o.oj)
          |    ELSE c.j + o.oj END AS wj
          |  FROM cells c CROSS JOIN offs o WHERE c.z IS NULL),
          | contrib AS (SELECT s.i, s.j, n.z AS nz,
          |   (s.wi - s.i) / 2.0 AS dx, (s.wj - s.j) / 2.0 AS dy
          |  FROM stencil s JOIN cells n ON n.i = s.wi AND n.j = s.wj
          |  WHERE n.z IS NOT NULL),
          | wts AS (SELECT i, j, nz,
          |  CASE WHEN sqrt(dx * dx + dy * dy) > 1.0 THEN 0.0
          |   ELSE power(1.0 - power(sqrt(dx * dx + dy * dy), 3), 3)
          |   END AS wt FROM contrib),
          | fl AS (SELECT i, j, SUM(wt * nz) / SUM(wt) AS z
          |  FROM wts GROUP BY i, j)
          |SELECT c.x AS x, c.y AS y,
          | round(COALESCE(c.z, f.z), 6) AS value,
          | CAST(CASE WHEN c.z IS NULL THEN 1 ELSE 0 END AS INT) AS filled
          |FROM cells c LEFT JOIN fl f ON f.i = c.i AND f.j = c.j"""
          .stripMargin.replace("\n", " "),

      // reference-driver loess: converged pair fixed points vs the
      // driver-side closed form (tolerance flag), 48x48, 16 hole pairs
      "q_fill_loess_ref" ->
        """SELECT TRUE AS within_tol, 2304 AS n_cells,
          | 32 AS n_filled, TRUE AS known_exact"""
          .stripMargin.replace("\n", " "),

      // periodic-x loess oracle: x window indexes wrap MODULO the axis
      // (frame_index is_angle), weights still tricube of the MAPPED
      // index difference — cross-seam visits land at |dx| >> 1 and
      // weigh 0, while y keeps the reflected edge mapping
      "q_fill_loess_seam" ->
        """WITH cells AS (SELECT i, j,
          |  CASE WHEN (i + j) % 3 <> 1
          |   THEN CAST((i * 7 + j * 13) % 19 AS DOUBLE) + 0.25 END AS z
          |  FROM range(0, 48) ti(i), range(0, 48) tj(j)),
          | offs AS (SELECT oi, oj
          |  FROM range(-2, 3) a(oi), range(-2, 3) b(oj)),
          | stencil AS (SELECT c.i, c.j,
          |   CAST((c.i + o.oi + 48) % 48 AS BIGINT) AS wi,
          |   CASE WHEN c.j + o.oj < 0 THEN -(c.j + o.oj)
          |    WHEN c.j + o.oj > 47 THEN 94 - (c.j + o.oj)
          |    ELSE c.j + o.oj END AS wj
          |  FROM cells c CROSS JOIN offs o WHERE c.z IS NULL),
          | contrib AS (SELECT s.i, s.j, n.z AS nz,
          |   (s.wi - s.i) / 2.0 AS dx, (s.wj - s.j) / 2.0 AS dy
          |  FROM stencil s JOIN cells n ON n.i = s.wi AND n.j = s.wj
          |  WHERE n.z IS NOT NULL),
          | wts AS (SELECT i, j, nz,
          |  CASE WHEN sqrt(dx * dx + dy * dy) > 1.0 THEN 0.0
          |   ELSE power(1.0 - power(sqrt(dx * dx + dy * dy), 3), 3)
          |   END AS wt FROM contrib),
          | fl AS (SELECT i, j, SUM(wt * nz) / SUM(wt) AS z
          |  FROM wts GROUP BY i, j)
          |SELECT CAST(c.i AS INT) AS ci, CAST(c.j AS INT) AS cj,
          | round(COALESCE(c.z, f.z), 6) AS value,
          | CAST(CASE WHEN c.z IS NULL THEN 1 ELSE 0 END AS INT) AS filled
          |FROM cells c LEFT JOIN fl f ON f.i = c.i AND f.j = c.j"""
          .stripMargin.replace("\n", " "),

      "q_fill_multigrid" ->
        """SELECT n_nationkey AS n,
          | CAST(24 + n_nationkey AS DOUBLE) AS center
          |FROM nation""".stripMargin.replace("\n", " "),

      // one LOESS pass mirrored exactly: 7x7 window with the reference
      // frame_index's REFLECTED edge indexes (-1 -> 1, 12 -> 10),
      // tricube of the mapped-index distance, defined cells pass through
      "q_fill_loess" ->
        """WITH cells AS (SELECT n.n_nationkey AS n,
          |  CAST(i.range AS INT) AS i, CAST(j.range AS INT) AS j
          |  FROM nation n, range(0, 12) i, range(0, 12) j),
          | grid AS (SELECT n, i, j,
          |  CASE WHEN (i * j + n) % 13 = 0 THEN NULL
          |   ELSE CAST((i * 31 + j * 17 + n) % 97 AS DOUBLE) END AS z
          |  FROM cells),
          | stencil AS (SELECT g.n, g.i, g.j,
          |   CASE WHEN g.i + CAST(oi.range AS INT) < 0
          |     THEN -(g.i + CAST(oi.range AS INT))
          |    WHEN g.i + CAST(oi.range AS INT) > 11
          |     THEN 22 - (g.i + CAST(oi.range AS INT))
          |    ELSE g.i + CAST(oi.range AS INT) END AS wi,
          |   CASE WHEN g.j + CAST(oj.range AS INT) < 0
          |     THEN -(g.j + CAST(oj.range AS INT))
          |    WHEN g.j + CAST(oj.range AS INT) > 11
          |     THEN 22 - (g.j + CAST(oj.range AS INT))
          |    ELSE g.j + CAST(oj.range AS INT) END AS wj
          |  FROM grid g, range(-3, 4) oi, range(-3, 4) oj
          |  WHERE g.z IS NULL),
          | contrib AS (SELECT s.n, s.i, s.j, g2.z,
          |   sqrt(((s.wi - s.i) * (1.0/3)) * ((s.wi - s.i) * (1.0/3)) +
          |        ((s.wj - s.j) * (1.0/3)) * ((s.wj - s.j) * (1.0/3))) AS d
          |  FROM stencil s JOIN grid g2
          |   ON g2.n = s.n AND g2.i = s.wi AND g2.j = s.wj
          |  WHERE g2.z IS NOT NULL),
          | wsum AS (SELECT n, i, j,
          |   SUM(CASE WHEN d > 1.0 THEN 0.0 ELSE
          |     (1 - d*d*d) * (1 - d*d*d) * (1 - d*d*d) END) AS sw,
          |   SUM(CASE WHEN d > 1.0 THEN 0.0 ELSE
          |     (1 - d*d*d) * (1 - d*d*d) * (1 - d*d*d) END * z) AS swz
          |  FROM contrib GROUP BY n, i, j)
          |SELECT n, i, j, round(z, 6) AS filled FROM grid WHERE z IS NOT NULL
          |UNION ALL
          |SELECT n, i, j, round(swz / sw, 6) AS filled FROM wsum"""
          .stripMargin.replace("\n", " "),

      // universal kriging with linear drift reproduces the linear field
      // x + y exactly at any probe point
      "q_kriging" ->
        """SELECT s_suppkey AS qid,
          | round((s_suppkey % 15 + 0.5) + (s_suppkey * 3 % 15 + 0.5), 4)
          |   AS kriged,
          | CAST(16 AS INT) AS neighbors
          |FROM supplier""".stripMargin.replace("\n", " "),

      // coincident-probe BLUE identity: probe ≡ obs_i with zero obs noise
      // and PD kernel returns value_i = x + y exactly, error variance 0
      "q_optimal_interpolation" ->
        """SELECT s_suppkey AS qid,
          | round(CAST(s_suppkey % 20 + (s_suppkey // 20) % 20 AS DOUBLE), 4)
          |   AS oi_value,
          | CAST(0.0 AS DOUBLE) AS oi_err,
          | CAST(16 AS INT) AS neighbors
          |FROM supplier""".stripMargin.replace("\n", " "),

      // RBF interpolation is exact at build nodes; probes are nodes
      "q_rbf" ->
        """SELECT s_suppkey AS qid,
          | round(CAST(s_suppkey % 20 + (s_suppkey // 20) % 20 AS DOUBLE), 4)
          |   AS rbf_value,
          | CAST(16 AS INT) AS neighbors
          |FROM supplier""".stripMargin.replace("\n", " "),

      // interpolants pass through grid nodes: value = grid formula
      "q_bicubic_mid" -> SparkEntry.midStencilSql(SparkEntry.bicubicMidStencil),

      // same constant-stencil closed form: the grid-as-table windowed
      // path must reproduce the broadcast kernel bit-for-bit
      "q_bicubic_biggrid" ->
        SparkEntry.midStencilSql(SparkEntry.bicubicMidStencil),

      "q_bicubic3d_biggrid" ->
        SparkEntry.midStencil3dSql(SparkEntry.bicubicMidStencil),

      // node-midpoint probes on the irregular lattice: both bracket
      // weights exactly 0.5 -> mean of the 4 corners, fp-exact
      "q_bilinear_irregular" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 20 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 20 AS INT) AS j0 FROM orders)
          |SELECT o_orderkey,
          | (CAST((i0*31 + j0*17) % 97 AS DOUBLE)
          |  + CAST((i0*31 + (j0+1)*17) % 97 AS DOUBLE)
          |  + CAST(((i0+1)*31 + j0*17) % 97 AS DOUBLE)
          |  + CAST(((i0+1)*31 + (j0+1)*17) % 97 AS DOUBLE)) / 4.0
          |   AS interp
          |FROM p""".stripMargin.replace("\n", " "),

      // node fidelity on the irregular windowed table path
      "q_bicubic_irregular" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 14 + 3) * 31 +
          |   (o_orderkey * 7 % 14 + 3) * 17) % 97 AS DOUBLE), 6)
          |   AS interp
          |FROM orders""".stripMargin.replace("\n", " "),

      // half-cell probes on the full-circle lattice: bilinear = mean of
      // the 4 corners with the seam cell's right column wrapping to 0
      "q_bilinear_biggrid_seam" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 40 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 40 AS INT) AS j0 FROM orders)
          |SELECT o_orderkey,
          | (CAST((i0*31 + j0*17) % 97 AS DOUBLE)
          |  + CAST((i0*31 + (j0+1)*17) % 97 AS DOUBLE)
          |  + CAST((((i0+1)%40)*31 + j0*17) % 97 AS DOUBLE)
          |  + CAST((((i0+1)%40)*31 + (j0+1)*17) % 97 AS DOUBLE)) / 4.0
          |   AS interp
          |FROM p""".stripMargin.replace("\n", " "),

      "q_bicubic_biggrid_seam" ->
        SparkEntry.midStencilSeamSql(SparkEntry.bicubicMidStencil),

      // 16-corner quadrilinear at half-cell offsets: exact 1/16 weights
      "q_quadrilinear_biggrid" -> {
        val corners = for (di <- 0 to 1; dj <- 0 to 1; dk <- 0 to 1;
            dl <- 0 to 1) yield
          s"CAST(((o_orderkey % 20 + $di) * 31 + " +
            s"(o_orderkey * 7 % 20 + $dj) * 17 + " +
            s"(o_orderkey % 2 + $dk) * 7 + (o_orderkey * 3 % 2 + $dl) * 3)" +
            s" % 53 AS DOUBLE)"
        s"""SELECT o_orderkey,
           | round(0.0625 * (${corners.mkString(" + ")}), 9) AS interp
           |FROM orders""".stripMargin.replace("\n", " ")
      },

      "q_bicubic4d_biggrid" ->
        SparkEntry.midStencil4dSql(SparkEntry.bicubicMidStencil),

      // node fidelity on the irregular 3-D windowed table path: probes
      // on interior x/y nodes at z nodes k <= nz-2 (tz = 0) return
      // plane k's node value exactly
      "q_bicubic3d_irregular" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 14 + 3) * 31 +
          |   (o_orderkey * 7 % 14 + 3) * 17 + (o_orderkey % 3) * 7)
          |   % 97 AS DOUBLE), 6) AS interp
          |FROM orders""".stripMargin.replace("\n", " "),

      // node fidelity on the irregular 4-D windowed table path
      "q_bicubic4d_irregular" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 14 + 3) * 31 +
          |   (o_orderkey * 7 % 14 + 3) * 17 + (o_orderkey % 2) * 7 +
          |   (o_orderkey * 3 % 2) * 3) % 97 AS DOUBLE), 6) AS interp
          |FROM orders WHERE o_orderkey < 30000"""
          .stripMargin.replace("\n", " "),

      // half-cell probes on the full-circle 3-D lattice: trilinear =
      // mean of 8 corners with the seam cell's right column wrapping
      "q_trilinear_biggrid_seam" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 40 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 20 AS INT) AS j0,
          |  CAST(o_orderkey % 4 AS INT) AS k0 FROM orders),
          | c AS (SELECT o_orderkey,
          |  CAST(((i0 + di.d) % 40) * 31 + (j0 + dj.d) * 17 +
          |    (k0 + dk.d) * 7 AS BIGINT) AS f
          |  FROM p, (VALUES (0), (1)) di(d), (VALUES (0), (1)) dj(d),
          |   (VALUES (0), (1)) dk(d))
          |SELECT o_orderkey,
          | SUM(CAST(f % 53 AS DOUBLE)) / 8.0 AS interp
          |FROM c GROUP BY o_orderkey""".stripMargin.replace("\n", " "),

      // 16-corner quadrilinear at half-cell offsets on the full-circle
      // 4-D lattice: exact 1/16 weights, seam column wrapping to 0
      "q_quadrilinear_seam" -> {
        val corners = for (di <- 0 to 1; dj <- 0 to 1; dk <- 0 to 1;
            dl <- 0 to 1) yield
          s"CAST((((o_orderkey % 20 + $di) % 20) * 31 + " +
            s"(o_orderkey * 7 % 20 + $dj) * 17 + " +
            s"(o_orderkey % 2 + $dk) * 7 + (o_orderkey * 3 % 2 + $dl) * 3)" +
            s" % 53 AS DOUBLE)"
        s"""SELECT o_orderkey,
           | round(0.0625 * (${corners.mkString(" + ")}), 9) AS interp
           |FROM orders""".stripMargin.replace("\n", " ")
      },

      // node-midpoint probes on the irregular 4-D lattice: all bracket
      // weights exactly 0.5 -> mean of the 16 corners, fp-exact
      "q_quadrilinear_irregular" -> {
        val corners = for (di <- 0 to 1; dj <- 0 to 1; dk <- 0 to 1;
            dl <- 0 to 1) yield
          s"CAST(((o_orderkey % 10 + $di) * 31 + " +
            s"(o_orderkey * 7 % 10 + $dj) * 17 + " +
            s"(o_orderkey % 2 + $dk) * 7 + (o_orderkey * 3 % 2 + $dl) * 3)" +
            s" % 53 AS DOUBLE)"
        s"""SELECT o_orderkey,
           | round(0.0625 * (${corners.mkString(" + ")}), 9) AS interp
           |FROM orders""".stripMargin.replace("\n", " ")
      },

      "q_bicubic_nodes" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 34 + 3) * 31 + (o_orderkey * 7 % 34 + 3) * 17)
          |   % 97 AS DOUBLE), 9) AS interp
          |FROM orders""".stripMargin.replace("\n", " "),

      "q_quadrivariate" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 10) * 31 + (o_orderkey * 3 % 10) * 17
          |   + (o_orderkey % 5) * 7 + (o_orderkey % 3) * 3)
          |   % 53 AS DOUBLE), 9) AS interp
          |FROM orders""".stripMargin.replace("\n", " "),

      "q_univariate" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 380 AS DOUBLE) / 10.0 + 0.25 AS x
          |  FROM orders),
          | f AS (SELECT o_orderkey, x,
          |  CAST(floor(x) AS INT) AS i, x - floor(x) AS frac FROM p)
          |SELECT o_orderkey,
          | round(CAST((i * 13) % 41 AS DOUBLE) + frac *
          |  (CAST(((i + 1) * 13) % 41 AS DOUBLE)
          |   - CAST((i * 13) % 41 AS DOUBLE)), 9) AS interp,
          | CAST(((i + 1) * 13) % 41 AS DOUBLE)
          |  - CAST((i * 13) % 41 AS DOUBLE) AS deriv
          |FROM f""".stripMargin.replace("\n", " "),

      "q_grid_ingest" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 41) * 31 + (o_orderkey * 7 % 41) * 17)
          |   % 97 AS DOUBLE), 9) AS interp
          |FROM orders""".stripMargin.replace("\n", " "),

      // half-cell probes: bilinear = mean of the 4 corner values, exact in
      // fp regardless of summation order
      "q_bilinear_biggrid" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 40 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 40 AS INT) AS j0 FROM orders)
          |SELECT o_orderkey,
          | (CAST((i0*31 + j0*17) % 97 AS DOUBLE)
          |  + CAST((i0*31 + (j0+1)*17) % 97 AS DOUBLE)
          |  + CAST(((i0+1)*31 + j0*17) % 97 AS DOUBLE)
          |  + CAST(((i0+1)*31 + (j0+1)*17) % 97 AS DOUBLE)) / 4.0 AS interp
          |FROM p""".stripMargin.replace("\n", " "),

      // half-cell probes in all three dims: trilinear = mean of 8 corners
      "q_trilinear_biggrid" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 20 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 20 AS INT) AS j0,
          |  CAST(o_orderkey % 4 AS INT) AS k0 FROM orders),
          | c AS (SELECT o_orderkey,
          |  CAST((i0 + di.d) * 31 + (j0 + dj.d) * 17 + (k0 + dk.d) * 7 AS BIGINT)
          |    AS f
          |  FROM p, (VALUES (0), (1)) di(d), (VALUES (0), (1)) dj(d),
          |   (VALUES (0), (1)) dk(d))
          |SELECT o_orderkey,
          | SUM(CAST(f % 53 AS DOUBLE)) / 8.0 AS interp
          |FROM c GROUP BY o_orderkey""".stripMargin.replace("\n", " "),

      // quadratic-field akima = cubic Hermite with slope 2i; at s = 0.25
      // the basis values are exact: h00=0.84375 h01=0.15625 h10=0.140625
      // h11=-0.046875 — H(i) = h00·i² + h01·(i+1)² + h10·2i + h11·(2i+2)
      "q_akima_mid" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 34 + 3 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 34 + 3 AS INT) AS j0 FROM orders)
          |SELECT o_orderkey, round(CAST(
          |  (0.84375 * i0 * i0 + 0.15625 * (i0 + 1) * (i0 + 1)
          |   + 0.140625 * 2 * i0 - 0.046875 * (2 * i0 + 2))
          |  + (0.84375 * j0 * j0 + 0.15625 * (j0 + 1) * (j0 + 1)
          |   + 0.140625 * 2 * j0 - 0.046875 * (2 * j0 + 2))
          | AS DOUBLE), 6) AS interp
          |FROM p""".stripMargin.replace("\n", " "),

      // same Hermite collapse, evaluated by the tile-halo table path
      "q_akima_biggrid" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 34 + 3 AS INT) AS i0,
          |  CAST(o_orderkey * 7 % 34 + 3 AS INT) AS j0 FROM orders)
          |SELECT o_orderkey, round(CAST(
          |  (0.84375 * i0 * i0 + 0.15625 * (i0 + 1) * (i0 + 1)
          |   + 0.140625 * 2 * i0 - 0.046875 * (2 * i0 + 2))
          |  + (0.84375 * j0 * j0 + 0.15625 * (j0 + 1) * (j0 + 1)
          |   + 0.140625 * 2 * j0 - 0.046875 * (2 * j0 + 2))
          | AS DOUBLE), 6) AS interp
          |FROM p""".stripMargin.replace("\n", " "),

      "q_akima_nodes" ->
        """SELECT o_orderkey,
          | round(CAST(((o_orderkey % 34 + 3) * 31 + (o_orderkey * 7 % 34 + 3) * 17)
          |   % 97 AS DOUBLE), 9) AS interp
          |FROM orders""".stripMargin.replace("\n", " "),

      "q_period_intersect" -> {
        val a = mergedPeriodsSql("SELECT user_id, ts, " +
          "ts + INTERVAL 10 MINUTE AS te FROM events WHERE event_id % 2 = 0",
          "a")
        val b = mergedPeriodsSql("SELECT user_id, ts, " +
          "ts + INTERVAL 10 MINUTE AS te FROM events WHERE event_id % 2 = 1",
          "b")
        s"""WITH $a, $b
           |SELECT a.user_id,
           | GREATEST(a.p_start, b.p_start) AS p_start,
           | LEAST(a.p_end, b.p_end) AS p_end
           |FROM a_per a JOIN b_per b ON a.user_id = b.user_id
           |WHERE GREATEST(a.p_start, b.p_start) < LEAST(a.p_end, b.p_end)"""
          .stripMargin.replace("\n", " ")
      },

      "q_period_contains" -> {
        val p = mergedPeriodsSql("SELECT user_id, ts, " +
          "ts + INTERVAL 5 MINUTE AS te FROM events WHERE event_type <> 'error'",
          "p")
        s"""WITH $p
           |SELECT d.user_id, d.ts AS date, p.p_start, p.p_end
           |FROM (SELECT user_id, ts FROM events WHERE event_type = 'error') d
           |JOIN p_per p ON p.user_id = d.user_id
           |WHERE d.ts >= p.p_start AND d.ts < p.p_end"""
          .stripMargin.replace("\n", " ")
      },

      "q_period_cross" -> {
        val p = mergedPeriodsSql("SELECT user_id, ts, " +
          "ts + INTERVAL 5 MINUTE AS te FROM events WHERE event_type <> 'error'",
          "p")
        s"""WITH $p,
           | d AS (SELECT user_id, ts AS date FROM events
           |  WHERE event_type = 'error'),
           | dl AS (SELECT user_id, date,
           |  MAX(date) OVER (PARTITION BY user_id) AS lastd FROM d),
           | j AS (SELECT dl.user_id, dl.date,
           |  CASE WHEN dl.date >= p.p_start AND dl.date < p.p_end
           |   THEN 1 ELSE 0 END AS inside,
           |  CASE WHEN p.p_start >= dl.date AND p.p_start <= dl.lastd
           |   THEN 1 ELSE 0 END AS ahead
           |  FROM dl JOIN p_per p ON p.user_id = dl.user_id)
           |SELECT user_id, date,
           | CAST(MAX(inside) = 1 OR MAX(ahead) = 1 AS INT) AS crosses,
           | CAST(MAX(inside) = 1 AS INT) AS belongs
           |FROM j GROUP BY user_id, date"""
          .stripMargin.replace("\n", " ")
      },

      "q_period_duration" -> {
        val p = mergedPeriodsSql("SELECT user_id, ts, " +
          "ts + INTERVAL 10 MINUTE AS te FROM events", "p")
        s"""WITH $p,
           | cov AS (SELECT user_id,
           |  CAST(SUM(epoch_us(p_end) - epoch_us(p_start)) AS BIGINT)
           |   AS covered_us FROM p_per GROUP BY user_id),
           | agg AS (SELECT user_id,
           |  CAST(SUM(epoch_us(ts + INTERVAL 10 MINUTE) - epoch_us(ts))
           |   AS BIGINT) AS aggregate_us FROM events GROUP BY user_id)
           |SELECT cov.user_id, covered_us, aggregate_us
           |FROM cov JOIN agg ON cov.user_id = agg.user_id"""
          .stripMargin.replace("\n", " ")
      },

      "q_geodesic_distance" -> {
        val lon1 = "(CAST(s_suppkey % 60 AS DOUBLE) - 30.0)"
        val lat1 = "(CAST(s_suppkey * 3 % 120 AS DOUBLE) / 2.0 - 30.0)"
        val lon2 = "(CAST(s_suppkey % 60 AS DOUBLE) + 40.0)"
        val lat2 = "(CAST(s_suppkey * 7 % 120 AS DOUBLE) / 2.0 - 25.0)"
        val vin = graft.operators.GeodesicOps.vincentySql(lon1, lat1, lon2,
          lat2, iterations = 8)
        val and = graft.operators.GeodesicOps.andoyerSql(lon1, lat1, lon2,
          lat2)
        val tho = graft.operators.GeodesicOps.thomasSql(lon1, lat1, lon2,
          lat2)
        s"""SELECT s_suppkey AS id,
           | round($and, 2) AS d_andoyer,
           | round($tho, 2) AS d_thomas,
           | round($vin, 2) AS d_vincenty,
           | round($vin, 0) AS d_karney_m
           |FROM supplier""".stripMargin.replace("\n", " ")
      },

      "q_geodesic_area" -> {
        val sph = graft.core.Spheroid.Wgs84
        val k = sph.a * sph.a * (1.0 - sph.e2) / 2.0
        val lat0 = "(CAST(s_suppkey % 17 AS DOUBLE) * 10.0 - 85.0)"
        s"""SELECT s_suppkey AS id,
           | round(abs($k * radians(abs(2.5)) *
           |  (${qLatSql(s"$lat0 + 2.0")} - ${qLatSql(lat0)})) / 1e6, 4)
           |   AS area_km2
           |FROM supplier""".stripMargin.replace("\n", " ")
      },

      "q_binning2d_geodesic" -> {
        val qy = qLatSql("(CAST(l_suppkey % 29 AS DOUBLE) + 0.75)")
        val qy0 = qLatSql("(0.0 + CAST(CAST(l_suppkey % 29 AS INT) AS DOUBLE) * 1.0)")
        val qy1 = qLatSql("(0.0 + CAST(CAST(l_suppkey % 29 AS INT) AS DOUBLE) * 1.0 + 1.0)")
        s"""WITH pts AS (SELECT CAST(l_partkey % 29 AS INT) AS ix0,
           |  CAST(l_suppkey % 29 AS INT) AS iy0, l_quantity AS z,
           |  ($qy - $qy0) / ($qy1 - $qy0) AS u
           |  FROM lineitem),
           | c AS (SELECT ix0 + d.dx AS ix, iy0 + d.dy AS iy, z,
           |   CASE d.k WHEN 0 THEN 0.75 * (1.0 - u)
           |    WHEN 1 THEN 0.75 * u WHEN 2 THEN 0.25 * u
           |    ELSE 0.25 * (1.0 - u) END AS w
           |  FROM pts CROSS JOIN (VALUES (0, 0, 0, 0), (1, 0, 1, 0),
           |    (2, 1, 1, 0), (3, 1, 0, 0)) d(k, dx, dy, pad))
           |SELECT ix, iy, COUNT(*) AS cnt, round(SUM(w), 6) AS sum_w,
           | round(SUM(w * z), 6) AS sum_wz
           |FROM c GROUP BY ix, iy""".stripMargin.replace("\n", " ")
      },

      "q_convex_hull" ->
        """SELECT DISTINCT user_id, 4 AS n_hull,
          | CAST((9 + user_id % 5) * (9 + user_id % 5) AS DOUBLE)
          |   AS hull_area
          |FROM events""".stripMargin.replace("\n", " "),

      "q_wkt_roundtrip" -> (SparkEntry.rectPairsSqlPrefix +
        s"""SELECT id, ${SparkEntry.wktRectSql} AS wkt,
           | ${SparkEntry.geoJsonRectSql} AS geojson,
           | 1 AS wkt_rt, 1 AS gj_rt, 10 AS n_parsed
           |FROM r""".stripMargin.replace("\n", " ")),

      "q_geom_unary" -> (SparkEntry.rectPairsSqlPrefix +
        """SELECT id,
          | CASE WHEN id % 3 = 0 THEN 0 ELSE 1 END AS valid,
          | CASE WHEN id % 3 = 0 THEN 0 ELSE 1 END AS simple,
          | 0 AS empty, 4 AS n_points, 4 AS n_segments,
          | CASE WHEN id % 3 = 0 THEN 0.0 ELSE 16.0 END AS area,
          | CASE WHEN id % 3 = 0 THEN 0.0 ELSE 16.0 END AS csa,
          | CASE WHEN id % 3 = 0 THEN ax1 ELSE ax0 END AS rev_head_x,
          | ay1 AS rev_head_y
          |FROM r""".stripMargin.replace("\n", " ")),

      // accessor-tail closed forms: box→ring vertex order pins the
      // upper-left (ax0, ay1) and lower-right (ax1) corners; the counts
      // and unique come straight from the planted fixture
      "q_geom_transform" -> (SparkEntry.rectPairsSqlPrefix +
        """SELECT id, 8 AS box_ring_len,
          | ax0 AS box_v2_x, ay1 AS box_v2_y, ax1 AS box_v4_x,
          | CASE WHEN id % 2 = 0 THEN 2 ELSE 1 END AS n_geoms,
          | CASE WHEN id % 3 = 0 THEN 1 ELSE 0 END AS n_holes,
          | 4 AS uniq_plain,
          | CASE WHEN id % 5 = 0 THEN 5 ELSE 4 END AS uniq_dedup
          |FROM r""".stripMargin.replace("\n", " ")),

      "q_geom_predicates" -> (SparkEntry.rectPairsSqlPrefix +
        """SELECT id,
          | CAST(ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1
          |   AS INT) AS inter,
          | CAST((ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1)
          |   AND NOT (ax0 < bx1 AND bx0 < ax1 AND ay0 < by1 AND by0 < ay1)
          |   AS INT) AS touch,
          | CAST(ax0 < bx1 AND bx0 < ax1 AND ay0 < by1 AND by0 < ay1
          |   AS INT) AS overlap,
          | 0 AS cont_ab, 0 AS eq_ab,
          | CASE WHEN abs(bx0 - ax0) < 4 AND abs(by0 - ay0) < 4
          |   THEN '212101212'
          |  WHEN abs(bx0 - ax0) = 4 AND abs(by0 - ay0) = 4
          |   THEN 'FF2F01212'
          |  ELSE 'FF2F11212' END AS de9im
          |FROM r""".stripMargin.replace("\n", " ")),

      "q_polygon_clip" -> (SparkEntry.rectPairsSqlPrefix +
        """SELECT id,
          | round(GREATEST(0.0, LEAST(ax1, bx1) - GREATEST(ax0, bx0)) *
          |   GREATEST(0.0, LEAST(ay1, by1) - GREATEST(ay0, by0)), 6)
          |   AS inter_area,
          | round(32.0 - GREATEST(0.0, LEAST(ax1, bx1) - GREATEST(ax0, bx0)) *
          |   GREATEST(0.0, LEAST(ay1, by1) - GREATEST(ay0, by0)), 6)
          |   AS union_area,
          | round(16.0 - GREATEST(0.0, LEAST(ax1, bx1) - GREATEST(ax0, bx0)) *
          |   GREATEST(0.0, LEAST(ay1, by1) - GREATEST(ay0, by0)), 6)
          |   AS diff_area
          |FROM r""".stripMargin.replace("\n", " ")),

      "q_point_distance" ->
        """WITH p AS (SELECT s_suppkey,
          |  CAST(s_suppkey % 12 AS DOUBLE) AS px,
          |  CASE WHEN s_suppkey % 2 = 0 THEN 5.0 ELSE 0.0 END AS py
          |  FROM supplier)
          |SELECT s_suppkey AS id,
          | round(CASE WHEN px >= 2 AND px <= 8 AND py >= 2 AND py <= 8
          |  THEN 0.0
          |  ELSE sqrt(GREATEST(2 - px, px - 8, 0) * GREATEST(2 - px, px - 8, 0)
          |   + GREATEST(2 - py, py - 8, 0) * GREATEST(2 - py, py - 8, 0))
          |  END, 6) AS dist
          |FROM p""".stripMargin.replace("\n", " "),

      "q_line_metrics" ->
        """SELECT s_suppkey AS id, 3 AS n_simplified,
          | CAST(2 * ceil(CAST(s_suppkey % 5 + 4 AS DOUBLE) / 3.0) + 1
          |   AS INT) AS n_densified,
          | CAST(s_suppkey % 5 + 4 AS DOUBLE) AS interp_x,
          | 0.0 AS interp_y,
          | CAST(2 * (s_suppkey % 5 + 4) AS DOUBLE) AS line_len
          |FROM supplier""".stripMargin.replace("\n", " "),

      "q_video_frames" ->
        """SELECT CAST(n_nationkey AS BIGINT) AS vid_idx,
          | CAST(4 AS BIGINT) AS n_sampled, 9 AS max_frame, 3 AS n_moving
          |FROM nation""".stripMargin.replace("\n", " "),

      "q_knn4d" ->
        """WITH b AS (SELECT p_partkey AS id,
          |  CAST(p_partkey % 10 AS DOUBLE) AS x1,
          |  CAST(p_partkey * 3 % 10 AS DOUBLE) AS x2,
          |  CAST(p_partkey * 7 % 5 AS DOUBLE) AS x3,
          |  CAST(p_partkey % 3 AS DOUBLE) AS x4
          |  FROM part WHERE p_partkey < 500),
          | q AS (SELECT s_suppkey AS qid,
          |  CAST(s_suppkey % 10 AS DOUBLE) + 0.3 AS x1,
          |  CAST(s_suppkey * 3 % 10 AS DOUBLE) + 0.3 AS x2,
          |  CAST(s_suppkey % 5 AS DOUBLE) + 0.2 AS x3,
          |  CAST(s_suppkey % 3 AS DOUBLE) + 0.1 AS x4
          |  FROM supplier),
          | d AS (SELECT q.qid, b.id AS nid,
          |  (b.x1 - q.x1) * (b.x1 - q.x1) + (b.x2 - q.x2) * (b.x2 - q.x2)
          |   + (b.x3 - q.x3) * (b.x3 - q.x3)
          |   + (b.x4 - q.x4) * (b.x4 - q.x4) AS d2
          |  FROM q CROSS JOIN b),
          | r AS (SELECT qid, nid, row_number() OVER
          |  (PARTITION BY qid ORDER BY d2, nid) AS rank FROM d)
          |SELECT qid, nid, rank FROM r WHERE rank <= 4"""
          .stripMargin.replace("\n", " "),

      "q_binning2d_simple" ->
        """WITH src AS (SELECT
          |  LEAST(GREATEST(CAST(round((CAST(l_partkey % 30 AS DOUBLE) + 0.2 - 0.0) / 1.0) AS INT), 0), 29) AS ix,
          |  LEAST(GREATEST(CAST(round((CAST(l_suppkey % 30 AS DOUBLE) + 0.2 - 0.0) / 1.0) AS INT), 0), 29) AS iy,
          |  l_quantity AS z FROM lineitem WHERE NOT isnan(l_quantity))
          |SELECT ix, iy, COUNT(*) AS cnt, SUM(z) AS sum_z,
          |  SUM(z)/COUNT(*) AS mean_z, MIN(z) AS min_z, MAX(z) AS max_z
          |FROM src GROUP BY ix, iy""".stripMargin.replace("\n", " "),

      "q_binning1d_weighted" ->
        """WITH src AS (SELECT
          |  LEAST(GREATEST(CAST(round(CAST(l_partkey % 20 AS DOUBLE) + 0.2) AS INT), 0), 19) AS ix,
          |  l_quantity AS z, CAST(l_suppkey % 5 + 1 AS DOUBLE) AS w
          |  FROM lineitem
          |  WHERE CAST(l_partkey % 20 AS DOUBLE) + 0.2 BETWEEN 0.0 AND 15.0)
          |SELECT ix, COUNT(*) AS cnt, SUM(w) AS sum_w, SUM(w*z) AS sum_wz,
          |  SUM(w*z)/SUM(w) AS wmean
          |FROM src GROUP BY ix""".stripMargin.replace("\n", " "),

      "q_nd_reduce" ->
        """WITH c AS (SELECT CAST(l_partkey % 12 AS INT) AS i,
          |  l_quantity AS z FROM lineitem),
          | m AS (SELECT i, COUNT(*) AS cnt, SUM(z) AS sum_z,
          |  MIN(z) AS min_z, MAX(z) AS max_z, AVG(z) AS mu
          |  FROM c GROUP BY i),
          | v AS (SELECT c.i, SUM(POW(c.z - m.mu, 2)) AS m2
          |  FROM c JOIN m ON c.i = m.i GROUP BY c.i)
          |SELECT m.i, m.cnt, m.sum_z, m.min_z, m.max_z,
          | round(m.sum_z / m.cnt, 9) + 0.0 AS mean_z,
          | round(v.m2 / m.cnt, 4) + 0.0 AS var_z
          |FROM m JOIN v ON m.i = v.i""".stripMargin.replace("\n", " "),

      "q_stats_moments" ->
        """WITH m AS (SELECT l_returnflag AS flag, COUNT(*) AS cnt,
          |  SUM(l_quantity) AS sum_z, MIN(l_quantity) AS min_z,
          |  MAX(l_quantity) AS max_z, AVG(l_quantity) AS mu
          |  FROM lineitem GROUP BY l_returnflag),
          | c AS (SELECT l.l_returnflag AS flag,
          |   SUM(POW(l.l_quantity - m.mu, 2)) AS m2,
          |   SUM(POW(l.l_quantity - m.mu, 3)) AS m3,
          |   SUM(POW(l.l_quantity - m.mu, 4)) AS m4
          |  FROM lineitem l JOIN m ON l.l_returnflag = m.flag
          |  GROUP BY l.l_returnflag)
          |SELECT m.flag, m.cnt, m.sum_z, m.min_z, m.max_z,
          |  round(m.sum_z / m.cnt, 9) + 0.0 AS mean_z,
          |  round(c.m2 / m.cnt, 4) + 0.0 AS var_z,
          |  round(sqrt(CAST(m.cnt AS DOUBLE)) * c.m3 / POW(c.m2, 1.5), 4) + 0.0 AS skew_z,
          |  round(CAST(m.cnt AS DOUBLE) * c.m4 / (c.m2 * c.m2) - 3.0, 4) + 0.0 AS kurt_z
          |FROM m JOIN c ON m.flag = c.flag""".stripMargin.replace("\n", " "),

      "q_histogram2d" ->
        """SELECT CAST(l_partkey % 8 AS INT) AS ix,
          | CAST(l_suppkey % 8 AS INT) AS iy, COUNT(*) AS cnt,
          | MIN(l_extendedprice) AS min_v, MAX(l_extendedprice) AS max_v,
          | TRUE AS q50_ok
          |FROM lineitem GROUP BY 1, 2""".stripMargin.replace("\n", " "),

      // PNG decode oracle: pixels re-derived end-to-end in DuckDB
      "q_image_pixels" -> SparkEntry.imagePixelSql(64, 16),

      // bilinear resize at sampled output pixels, literal weights
      "q_image_resize" -> SparkEntry.imageResizeSql(32, 16, 8, 8,
        Seq((0, 0), (3, 4), (7, 7))),

      // PCM decode oracle: regenerate the quantized tone samples from the
      // same closed form (trunc quantization, clamp, /32767 decode) and
      // recompute RMS / peak / zero-crossing rate
      "q_audio_pcm" ->
        """WITH clips AS (SELECT n_nationkey AS i,
          |  220.0 + (n_nationkey % 20) * 55.0 AS f1 FROM nation),
          | smp AS (SELECT i, k,
          |  GREATEST(-32767, LEAST(32767, CAST(trunc(
          |   (0.6 * sin(2 * pi() * f1 * (k / 8000.0))
          |    + 0.25 * sin(2 * pi() * (f1 * 1.5) * (k / 8000.0)))
          |   * 32767) AS INTEGER))) / 32767.0 AS x
          |  FROM clips CROSS JOIN range(2048) t(k)),
          | f AS (SELECT i, k, x,
          |  CASE WHEN k > 0 AND ((x >= 0) <>
          |   (lag(x) OVER (PARTITION BY i ORDER BY k) >= 0))
          |   THEN 1 ELSE 0 END AS zc
          |  FROM smp)
          |SELECT printf('aud%09d', i) AS audio_id,
          | round(sqrt(SUM(x * x) / 2048), 6) AS rms,
          | round(MAX(abs(x)), 6) AS peak,
          | round(SUM(zc) / 2048.0 * 8000 / 2.0, 6) AS zcr
          |FROM f GROUP BY 1""".stripMargin.replace("\n", " "),

      // spectral-centroid value oracle (was rows-only): naive DFT of the
      // regenerated PCM — 25 clips x 1023 bins x 2048 terms is a ~50M-row
      // vectorized aggregate, seconds in DuckDB; power-spectrum weighting
      // re^2+im^2 makes the FFT sign convention irrelevant
      "q_audio_features" ->
        """WITH clips AS (SELECT n_nationkey AS i,
          |  220.0 + (n_nationkey % 20) * 55.0 AS f1 FROM nation),
          | smp AS (SELECT i, k,
          |  GREATEST(-32767, LEAST(32767, CAST(trunc(
          |   (0.6 * sin(2 * pi() * f1 * (k / 8000.0))
          |    + 0.25 * sin(2 * pi() * (f1 * 1.5) * (k / 8000.0)))
          |   * 32767) AS INTEGER))) / 32767.0 AS x
          |  FROM clips CROSS JOIN range(2048) t(k)),
          | dft AS (SELECT s.i, b.b,
          |  SUM(s.x * cos(2 * pi() * b.b * s.k / 2048.0)) AS re,
          |  SUM(s.x * sin(2 * pi() * b.b * s.k / 2048.0)) AS im
          |  FROM smp s CROSS JOIN range(1, 1024) b(b)
          |  GROUP BY s.i, b.b),
          | cent AS (SELECT i,
          |  SUM((re * re + im * im) * (b * 8000.0 / 2048.0)) /
          |   SUM(re * re + im * im) AS c
          |  FROM dft GROUP BY i),
          | r AS (SELECT i, sqrt(SUM(x * x) / 2048) AS rms
          |  FROM smp GROUP BY i)
          |SELECT printf('aud%09d', r.i) AS audio_id,
          | round(r.rms, 4) AS rms, round(cent.c, 1) AS centroid_hz
          |FROM r JOIN cent ON cent.i = r.i""".stripMargin.replace("\n", " "),

      // fill contract oracle: knowns preserved exactly, holes filled
      // within the low-pass range — per-nation row set + TRUE flags
      "q_fill_fft" ->
        """SELECT n_nationkey AS n, TRUE AS known_ok, TRUE AS filled_ok
          |FROM nation""".stripMargin.replace("\n", " "),

      // analytic-orbit consistency oracle: all flags must come back TRUE
      "q_orbit_analytic" ->
        ("SELECT TRUE AS lons_ok, TRUE AS times_ok, TRUE AS has_pass, " +
          "TRUE AS xac_grid_ok, TRUE AS swath_lat_ok, " +
          "TRUE AS swath_fanout_ok"),

      // per-row pass-catalog value oracle (fixed analytic orbit): the
      // k-th equator crossing is at t = 3000k s with longitude
      // (k odd ? 180 : 0) - t*360/86400, computed HERE in SQL — not
      // copied from the engine. Crossing k lands in pass k+2 because
      // calculate_orbit drops the equator-start fragment (skip first
      // pass boundary) and the short pass 1 remnant, leaving pass 2 as
      // the ascending no-crossing arc (NULL row).
      "q_orbit_passes" ->
        """SELECT CAST(k + 2 AS INT) AS pass_number,
          | round((CASE WHEN k % 2 = 1 THEN 180.0 ELSE 0.0 END)
          |   - 3000.0 * k * 360.0 / 86400.0, 3) AS eq_lon,
          | round(3000.0 * k, 1) AS eq_time, TRUE AS has_crossing
          |FROM range(1, 3) t(k)
          |UNION ALL SELECT CAST(2 AS INT), CAST(NULL AS DOUBLE),
          | CAST(NULL AS DOUBLE), FALSE""".stripMargin.replace("\n", " "),

      // per-(pass, pixel) swath value oracle: the across-track grid is
      // constructed geometry — pixel j of a halfGap 10 km / res 10 km /
      // halfSwath 60 km swath sits at (j - 6 + (j >= 6)) * 10 km exactly,
      // for every line of passes {2, 3, 4}
      "q_orbit_swath" ->
        """SELECT CAST(p AS INT) AS pass_number, CAST(j AS INT) AS pixel,
          | CAST((j - 6 + CASE WHEN j >= 6 THEN 1 ELSE 0 END) * 10000
          |   AS DOUBLE) AS x_ac,
          | TRUE AS xac_const_ok, TRUE AS lat_bound_ok
          |FROM range(2, 5) tp(p), range(0, 12) tj(j)"""
          .stripMargin.replace("\n", " "),

      // tolerance oracle: the Spark side emits "sketch within 1%-of-range
      // of Spark's exact percentile" booleans; hashes match iff all TRUE
      "q_tdigest_quantiles" ->
        """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
          | TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
          |FROM lineitem""".stripMargin.replace("\n", " "),

      "q_geohash_encode" ->
        s"""SELECT event_id, ${geohashSql(lonSql.format("user_id"),
          latSql.format("user_id"), 40)} AS cell FROM events"""
          .replace("\n", " "),

      "q_geohash_coarsen" ->
        s"""WITH c AS (SELECT ${geohashSql(lonSql.format("user_id"),
          latSql.format("user_id"), 40)} AS cell FROM events)
           |SELECT cell // 1048576 AS cell20, COUNT(*) AS cnt
           |FROM c GROUP BY cell20""".stripMargin.replace("\n", " "),

      // decode/centroid/area oracle with NO bit interleave: the cell
      // corner at precision 40 (20+20 bits) is pure truncation —
      // idx = trunc((v+r)/2r * 2^32) // 2^12, corner = 2r*idx/2^20 - r —
      // with fp op order mirroring the engine's decodeRange exactly;
      // area is the same exact ellipsoidal-rectangle closed form as
      // q_geodesic_area (k and q(phi) computed here, not by the engine)
      "q_geohash_cell" -> {
        val sph = graft.core.Spheroid.Wgs84
        val k = sph.a * sph.a * (1.0 - sph.e2) / 2.0
        def corner(v: String, r: Int) =
          s"(${2 * r}.0 * (CAST(CAST(trunc((($v) + $r.0) / ${2 * r}.0 * " +
            "4294967296.0) AS HUGEINT) // 4096::HUGEINT AS DOUBLE) / " +
            s"1048576.0) - $r.0)"
        s"""WITH pt AS (SELECT event_id, ${lonSql.format("user_id")} AS lon,
           |  ${latSql.format("user_id")} AS lat FROM events),
           | c AS (SELECT event_id, ${corner("lon", 180)} AS x0,
           |  ${corner("lat", 90)} AS y0 FROM pt),
           | b AS (SELECT event_id, x0, y0,
           |  x0 + 0.00034332275390625 AS x1,
           |  y0 + 0.000171661376953125 AS y1 FROM c)
           |SELECT event_id, round((x0 + x1) / 2.0, 9) AS c_lon,
           | round((y0 + y1) / 2.0, 9) AS c_lat,
           | round(abs($k * radians(abs(x1 - x0)) *
           |  (${qLatSql("y1")} - ${qLatSql("y0")})), 4) AS area_m2
           |FROM b""".stripMargin.replace("\n", " ")
      },

      // regular-axis lookup (round((x-x0)*invStep) with Math.round =
      // floor(v+0.5), -1 outside [0, 97)), closed-interval contains, and
      // the exact integer tick casts (x1000 up, floor-division down)
      "q_axis_lookup" ->
        """WITH p AS (SELECT event_id,
          |  CAST(event_id % 256 AS DOUBLE) / 10.0 - 2.0 AS x,
          |  (event_id % 1000 - 500) * 37 AS ms FROM events),
          | r AS (SELECT event_id, x, ms,
          |  CAST(floor((x - 0.0) * 4.0 + 0.5) AS BIGINT) AS ri FROM p)
          |SELECT event_id,
          | CAST(CASE WHEN ri < 0 OR ri >= 97 THEN -1 ELSE ri END AS INT)
          |   AS idx,
          | (x >= 0.0 AND x <= 24.0) AS inside,
          | ms * 1000 AS t_us,
          | CAST(floor(CAST(ms AS DOUBLE) / 1000.0) AS BIGINT) AS t_s
          |FROM r""".stripMargin.replace("\n", " "),

      "q_pip_join" -> {
        val verts = pentagon.exterior
        val conds = verts.indices.map { i =>
          val (x1, y1) = verts(i)
          val (x2, y2) = verts((i + 1) % verts.length)
          s"(($x2 - $x1) * (y - $y1) - (x - $x1) * ($y2 - $y1)) > 0"
        }.mkString(" AND ")
        s"""WITH pts AS (SELECT c_custkey,
           | CAST(c_custkey % 100 AS DOUBLE) / 10.0 AS x,
           | CAST(c_custkey * 7 % 100 AS DOUBLE) / 10.0 AS y
           | FROM customer)
           |SELECT c_custkey, 1 AS poly_id FROM pts WHERE $conds"""
          .stripMargin.replace("\n", " ")
      },

      "q_knn_join" ->
        (knnRanked + "SELECT qid, nid, rank FROM r WHERE rank <= 4")
          .replace("\n", " "),

      "q_knn_idw" ->
        (knnRanked +
          """ , k AS (SELECT * FROM r WHERE rank <= 4)
            |SELECT qid,
            | round(CASE WHEN MIN(dist) < 1e-6
            |   THEN MIN(CASE WHEN dist < 1e-6 THEN value END)
            |   ELSE SUM(value / (dist*dist)) / SUM(1.0 / (dist*dist)) END, 6)
            |   AS idw,
            | CAST(COUNT(*) AS INT) AS neighbors
            |FROM k GROUP BY qid""".stripMargin).replace("\n", " "),

      // parzen weight mirrored term-by-term (ratio = dist/3, sampling 0:
      // cubic taper below r, inner parabola below r/2), fixed radius 3
      "q_knn_window_parzen" ->
        (knnRanked +
          """ , k AS (SELECT * FROM r WHERE rank <= 4 AND dist <= 3.0),
            | w AS (SELECT qid, value,
            |  CASE WHEN dist <= 1.5
            |   THEN 1.0 - 6.0 * (dist/3.0) * (dist/3.0) * (1.0 - (dist/3.0))
            |   ELSE 2.0 * (1.0 - (dist/3.0)) * (1.0 - (dist/3.0))
            |    * (1.0 - (dist/3.0)) END AS w
            |  FROM k)
            |SELECT qid, round(SUM(w * value) / SUM(w), 6) AS wval,
            | CAST(COUNT(*) AS INT) AS neighbors
            |FROM w GROUP BY qid""".stripMargin).replace("\n", " "),

      "q_knn_window_boxcar" ->
        (knnRanked +
          """ , k AS (SELECT * FROM r WHERE rank <= 4)
            |SELECT qid, round(SUM(value)/COUNT(*), 6) AS wval,
            | CAST(COUNT(*) AS INT) AS neighbors
            |FROM k GROUP BY qid""".stripMargin).replace("\n", " "),

      "q_distance_join" ->
        s"""WITH b AS ($knnBuild), q AS ($knnProbe)
           |SELECT q.qid, b.id AS nid FROM q CROSS JOIN b
           |WHERE (q.x-b.x)*(q.x-b.x)+(q.y-b.y)*(q.y-b.y) <= 4.0"""
          .stripMargin.replace("\n", " "),

      "q_bilinear_grid" ->
        """WITH p AS (SELECT o_orderkey,
          |  CAST(o_orderkey % 400 AS DOUBLE) / 10.0 AS x,
          |  CAST(o_orderkey * 3 % 400 AS DOUBLE) / 10.0 AS y
          |  FROM orders),
          | q AS (SELECT o_orderkey, x, y,
          |  LEAST(CAST(floor(x) AS INT), 39) AS i0,
          |  LEAST(CAST(floor(y) AS INT), 39) AS j0 FROM p)
          |SELECT o_orderkey,
          |  (1.0 - (x - i0)) * ((1.0 - (y - j0)) * CAST((i0*31 + j0*17) % 97 AS DOUBLE)
          |     + (y - j0) * CAST((i0*31 + (j0+1)*17) % 97 AS DOUBLE))
          |  + (x - i0) * ((1.0 - (y - j0)) * CAST(((i0+1)*31 + j0*17) % 97 AS DOUBLE)
          |     + (y - j0) * CAST(((i0+1)*31 + (j0+1)*17) % 97 AS DOUBLE)) AS interp
          |FROM q""".stripMargin.replace("\n", " "),

      "q_temporal_fields" ->
        """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
          | CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
          | COUNT(*) AS cnt
          |FROM events GROUP BY 1, 2, 3, 4""".stripMargin.replace("\n", " "),

      "q_period_merge" ->
        """WITH e AS (SELECT user_id, ts, ts + INTERVAL 10 MINUTE AS te
          |  FROM events),
          | m AS (SELECT user_id, ts, te,
          |   MAX(te) OVER (PARTITION BY user_id ORDER BY ts
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          |  FROM e),
          | g AS (SELECT user_id, ts, te,
          |   CASE WHEN prev_max IS NULL OR ts > prev_max THEN 1 ELSE 0 END
          |     AS new_grp FROM m),
          | s AS (SELECT user_id, ts, te,
          |   SUM(new_grp) OVER (PARTITION BY user_id ORDER BY ts
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          |  FROM g)
          |SELECT user_id, MIN(ts) AS p_start, MAX(te) AS p_end,
          | COUNT(*) AS n_events
          |FROM s GROUP BY user_id, grp""".stripMargin.replace("\n", " "),

      "q_track_decompose" ->
        """WITH e AS (SELECT user_id, ts, event_id,
          |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |     AS prev_ts
          |  FROM events),
          | b AS (SELECT user_id, ts, event_id,
          |   CASE WHEN prev_ts IS NULL
          |     OR epoch(ts) - epoch(prev_ts) > 3600 THEN 1 ELSE 0 END AS brk
          |  FROM e),
          | s AS (SELECT user_id, ts,
          |   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |     AS segment
          |  FROM b)
          |SELECT user_id, segment, COUNT(*) AS n, MIN(ts) AS seg_start
          |FROM s GROUP BY user_id, segment""".stripMargin.replace("\n", " "),

      "q_fill_1d" ->
        """WITH base AS (SELECT event_id, user_id, ts,
          |  CASE WHEN event_type <> 'error' THEN value END AS z,
          |  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          |  FROM events),
          | f AS (SELECT event_id, z, rn,
          |  last_value(z IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
          |  last_value(CASE WHEN z IS NOT NULL THEN rn END IGNORE NULLS)
          |    OVER (PARTITION BY user_id ORDER BY ts
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pr,
          |  first_value(z IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
          |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
          |  first_value(CASE WHEN z IS NOT NULL THEN rn END IGNORE NULLS)
          |    OVER (PARTITION BY user_id ORDER BY ts
          |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nr
          |  FROM base)
          |SELECT event_id, round(CASE WHEN z IS NOT NULL THEN z
          |  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
          |    pv + CAST(rn - pr AS DOUBLE) * (nv - pv) / CAST(nr - pr AS DOUBLE)
          |  ELSE NULL END, 6) AS filled
          |FROM f""".stripMargin.replace("\n", " "),

      // streaming ≡ batch: same grouping computed in plain SQL
      "q_streaming_binning" ->
        """SELECT date_trunc('hour', ts) AS window_start,
          | CAST(user_id % 8 AS INT) AS cell,
          | CAST(COUNT(*) AS BIGINT) AS cnt,
          | round(SUM(value), 6) AS sum_v,
          | MIN(value) AS min_v, MAX(value) AS max_v
          |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),

      "q_hourly_binning" ->
        """SELECT date_trunc('hour', ts) AS hour, event_type,
          | COUNT(*) AS cnt, round(SUM(value), 6) AS sum_v
          |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),

      // batch gap segmentation (lag + cumulative break-sum) over the raw
      // events — equals the streamed session output because the sentinel
      // rows close every real segment in-stream and are themselves never
      // emitted. date_diff('millisecond') counts boundary crossings,
      // matching the operator's Timestamp.getTime milli arithmetic.
      "q_streaming_sessions" ->
        """WITH e AS (SELECT user_id % 64 AS key, ts FROM events),
          | d AS (SELECT key, ts,
          |   lag(ts) OVER (PARTITION BY key ORDER BY ts) AS prev FROM e),
          | b AS (SELECT key, ts, CASE WHEN prev IS NULL OR
          |   date_diff('millisecond', prev, ts) > 21600000
          |   THEN 1 ELSE 0 END AS brk FROM d),
          | g AS (SELECT key, ts, SUM(brk) OVER (PARTITION BY key
          |   ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
          |   ROW) AS seg FROM b)
          |SELECT key, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS t0,
          | CAST(floor(epoch(MAX(ts))) AS BIGINT) AS t1,
          | COUNT(*) AS n
          |FROM g GROUP BY key, seg""".stripMargin.replace("\n", " "),

      "q_dedup_exact" ->
        """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
          | COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
          |FROM documents GROUP BY 1""".stripMargin.replace("\n", " "),

      "q_token_stats" ->
        """SELECT lang, COUNT(*) AS n_docs,
          | CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
          |   AS sum_tokens,
          | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          |FROM documents GROUP BY lang""".stripMargin.replace("\n", " "),

      "q_lang_id" -> {
        def hits(markers: Seq[String]): String =
          markers.map(m =>
            s"(CASE WHEN position(' $m ' IN t) > 0 THEN 1 ELSE 0 END)")
            .mkString(" + ")
        val en = hits(Seq("the", "and", "of", "to", "is", "in", "that", "it"))
        val fr = hits(Seq("le", "la", "les", "de", "et", "un", "une", "est"))
        val de = hits(Seq("der", "die", "das", "und", "ist", "ein", "nicht"))
        val es = hits(Seq("el", "la", "los", "de", "y", "es", "que", "un"))
        s"""WITH d AS (SELECT lang, ' ' || lower(text) || ' ' AS t
           |  FROM documents),
           | sc AS (SELECT lang, ($en) AS en, ($fr) AS fr, ($de) AS de,
           |   ($es) AS es FROM d),
           | p AS (SELECT lang, CASE
           |   WHEN GREATEST(en, fr, de, es) = 0 THEN 'unk'
           |   WHEN en = GREATEST(en, fr, de, es) THEN 'en'
           |   WHEN fr = GREATEST(en, fr, de, es) THEN 'fr'
           |   WHEN de = GREATEST(en, fr, de, es) THEN 'de'
           |   ELSE 'es' END AS pred FROM sc)
           |SELECT lang, pred, COUNT(*) AS cnt FROM p GROUP BY lang, pred"""
          .stripMargin.replace("\n", " ")
      },

      "q_ngram_jaccard" -> SparkEntry.trigramJaccardSql(0.2),

      // near-dup pairs derived independently; hamming-closeness affirmed
      "q_simhash_neardup" ->
        s"""SELECT id_a, id_b, TRUE AS close
           |FROM (${SparkEntry.trigramJaccardSql(0.9)})"""
          .stripMargin.replace("\n", " "),

      "q_minhash_lsh" -> SparkEntry.trigramJaccardSql(0.2),

      "q_embedding_neardup" ->
        """WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
          |  FROM embeddings WHERE vec_id < 100
          |  UNION ALL
          |  SELECT vec_id + 1000 AS id,
          |   list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0) AS e
          |  FROM embeddings WHERE vec_id < 50),
          | p AS (SELECT a.id AS id_a, b.id AS id_b,
          |   list_dot_product(a.e, b.e) /
          |    (sqrt(list_dot_product(a.e, a.e)) *
          |     sqrt(list_dot_product(b.e, b.e))) AS cos
          |  FROM base a JOIN base b ON a.id < b.id)
          |SELECT id_a, id_b FROM p WHERE cos >= 0.7"""
          .stripMargin.replace("\n", " "),

      // ANN pipelines rebuilt independently from the literal hyperplanes
      "q_ann_lsh_cosine" ->
        SparkEntry.annLshSql("vec_id < 10", k = 5, planes = 6, tables = 4,
          seed = 42L, dims = 64),

      "q_ann_lsh_big_probe" ->
        SparkEntry.annLshSql("TRUE", k = 5, planes = 6, tables = 4,
          seed = 42L, dims = 64),

      // tile ASSIGNMENT oracle: footprints re-derived from the RNG chain;
      // cover = distinct corner cells (footprint 0.5° < 5.625°x2.8125°
      // cells at precision 12); a tile is emitted only when a sample
      // point — (k+0.5)/8 of the cell per axis — falls inside the
      // footprint, mirrored via EXISTS; n_images counts emitting images
      "q_tile_pipeline" -> {
        def corner(dx: String, dy: String) =
          s"SELECT i, lon, lat, " +
            s"${geohashSql(s"(lon + $dx)", s"(lat + $dy)", 12)} AS cell, " +
            s"floor(((lon + $dx) + 180.0) / 5.625) * 5.625 - 180.0 AS cx0, " +
            s"floor(((lat + $dy) + 90.0) / 2.8125) * 2.8125 - 90.0 AS cy0 " +
            "FROM geo"
        SparkEntry.imagePixelCte(64, 16) +
          s""", cc AS (SELECT DISTINCT i, lon, lat, cell, cx0, cy0 FROM
             |  (${corner("0.0", "0.0")} UNION ALL ${corner("0.5", "0.0")}
             |   UNION ALL ${corner("0.0", "0.5")}
             |   UNION ALL ${corner("0.5", "0.5")}) u),
             | ok AS (SELECT i, cell FROM cc
             |  WHERE EXISTS (SELECT 1 FROM range(8) s(ii)
             |   WHERE cx0 + (ii + 0.5) * 0.703125 >= lon
             |    AND cx0 + (ii + 0.5) * 0.703125 <= lon + (0.5 / 15) * 15)
             |  AND EXISTS (SELECT 1 FROM range(8) t2(jj)
             |   WHERE cy0 + (jj + 0.5) * 0.3515625 >= lat
             |    AND cy0 + (jj + 0.5) * 0.3515625 <= lat + (0.5 / 15) * 15))
             |SELECT cell, CAST(COUNT(*) AS INT) AS n_images
             |FROM ok GROUP BY cell""".stripMargin.replace("\n", " ")
      },

      "q_topk_cosine" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          |  FROM embeddings),
          | q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 10),
          | d AS (SELECT q.qid, e.vec_id AS id,
          |   list_dot_product(q.qe, e.emb) /
          |    (sqrt(list_dot_product(q.qe, q.qe)) *
          |     sqrt(list_dot_product(e.emb, e.emb))) AS cos
          |  FROM q CROSS JOIN e),
          | r AS (SELECT qid, id, row_number() OVER
          |   (PARTITION BY qid ORDER BY cos DESC, id) AS rank FROM d)
          |SELECT qid, id, rank FROM r WHERE rank <= 5"""
          .stripMargin.replace("\n", " ")
    ) ++ Map(
      "q_crossover" -> {
        // same segment-intersection arithmetic as Crossover.segmentIntersection
        """WITH a AS (SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS rn,
          |   CAST(s_suppkey AS DOUBLE) AS x,
          |   CAST(s_suppkey * 7 % 100 AS DOUBLE) / 10.0 AS y
          |  FROM supplier),
          | b AS (SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS rn,
          |   CAST(s_suppkey AS DOUBLE) AS x,
          |   10.0 - CAST(s_suppkey * 3 % 100 AS DOUBLE) / 10.0 AS y
          |  FROM supplier),
          | segs_a AS (SELECT rn, x AS x1, y AS y1,
          |   lead(x) OVER (ORDER BY rn) AS x2,
          |   lead(y) OVER (ORDER BY rn) AS y2 FROM a),
          | segs_b AS (SELECT rn, x AS x1, y AS y1,
          |   lead(x) OVER (ORDER BY rn) AS x2,
          |   lead(y) OVER (ORDER BY rn) AS y2 FROM b),
          | pairs AS (SELECT sa.rn AS ra, sb.rn AS rb,
          |   sa.x1 AS ax1, sa.y1 AS ay1, sa.x2 AS ax2, sa.y2 AS ay2,
          |   sb.x1 AS bx1, sb.y1 AS by1, sb.x2 AS bx2, sb.y2 AS by2,
          |   (sa.x2 - sa.x1) * (sb.y2 - sb.y1) -
          |     (sa.y2 - sa.y1) * (sb.x2 - sb.x1) AS denom
          |  FROM segs_a sa CROSS JOIN segs_b sb
          |  WHERE sa.x2 IS NOT NULL AND sb.x2 IS NOT NULL),
          | hits AS (SELECT ra, rb, ax1, ay1, ax2, ay2, bx1, by1, bx2, by2,
          |   ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / denom AS t,
          |   ((bx1 - ax1) * (ay2 - ay1) - (by1 - ay1) * (ax2 - ax1)) / denom AS u
          |  FROM pairs WHERE denom <> 0.0),
          | pts AS (SELECT ra, rb, ax1, ay1, ax2, ay2, bx1, by1, bx2, by2,
          |   ax1 + t * (ax2 - ax1) AS x, ay1 + t * (ay2 - ay1) AS y
          |  FROM hits WHERE t >= 0.0 AND t < 1.0 AND u >= 0.0 AND u < 1.0)
          |SELECT round(x, 9) AS x, round(y, 9) AS y,
          | CAST(CASE WHEN (x-ax1)*(x-ax1)+(y-ay1)*(y-ay1) <=
          |   (x-ax2)*(x-ax2)+(y-ay2)*(y-ay2) THEN ra ELSE ra + 1 END AS INT)
          |   AS idx_a,
          | CAST(CASE WHEN (x-bx1)*(x-bx1)+(y-by1)*(y-by1) <=
          |   (x-bx2)*(x-bx2)+(y-by2)*(y-by2) THEN rb ELSE rb + 1 END AS INT)
          |   AS idx_b
          |FROM pts""".stripMargin.replace("\n", " ")
      },

      "q_orbit_pass" ->
        """WITH trk AS (SELECT CAST(s_suppkey AS DOUBLE) AS time,
          |  CAST(abs(s_suppkey * 7 % 100 - 50) AS DOUBLE) AS lat
          |  FROM supplier),
          | d AS (SELECT time, lat,
          |   lat - lag(lat) OVER (ORDER BY time) AS dlat FROM trk),
          | p AS (SELECT time, dlat,
          |   lag(dlat) OVER (ORDER BY time) AS prev_dlat FROM d),
          | b AS (SELECT time, dlat,
          |   CASE WHEN dlat IS NULL THEN 1
          |     WHEN prev_dlat IS NOT NULL
          |       AND (dlat >= 0) <> (prev_dlat >= 0) THEN 1
          |     ELSE 0 END AS brk FROM p)
          |SELECT time,
          | CAST(SUM(brk) OVER (ORDER BY time
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |   AS pass_number,
          | CAST(CASE WHEN dlat >= 0 OR dlat IS NULL THEN 1 ELSE 0 END AS INT)
          |   AS asc FROM b""".stripMargin.replace("\n", " "),

      "q_knn_geodetic" -> {
        val e2 = "0.0066943799901413165"
        val a = "6378137.0"
        def ecef(lon: String, lat: String): (String, String, String) = {
          val sinLon = s"sin(($lon) * (pi() / 180.0))"
          val cosLon = s"cos(($lon) * (pi() / 180.0))"
          val sinLat = s"sin(($lat) * (pi() / 180.0))"
          val cosLat = s"cos(($lat) * (pi() / 180.0))"
          val n = s"($a / sqrt(1.0 - $e2 * $sinLat * $sinLat))"
          (s"(($n + 0.0) * $cosLat * $cosLon)",
           s"(($n + 0.0) * $cosLat * $sinLon)",
           s"(($n * (1.0 - $e2) + 0.0) * $sinLat)")
        }
        val (bx, by, bz) = ecef(lonSql.format("c_custkey"),
          latSql.format("c_custkey"))
        val (qx, qy, qz) = ecef("(" + lonSql.format("s_suppkey") + ") + 0.005",
          "(" + latSql.format("s_suppkey") + ") + 0.005")
        s"""WITH b AS (SELECT c_custkey AS nid, $bx AS x, $by AS y, $bz AS z
           |  FROM customer),
           | q AS (SELECT s_suppkey AS qid, $qx AS x, $qy AS y, $qz AS z
           |  FROM supplier),
           | d AS (SELECT q.qid, b.nid,
           |   (b.x-q.x)*(b.x-q.x)+(b.y-q.y)*(b.y-q.y)+(b.z-q.z)*(b.z-q.z)
           |     AS d2 FROM q CROSS JOIN b),
           | r AS (SELECT qid, nid, row_number() OVER
           |   (PARTITION BY qid ORDER BY d2, nid) AS rank FROM d)
           |SELECT qid, nid, rank FROM r WHERE rank <= 4"""
          .stripMargin.replace("\n", " ")
      },

      "q_geohash_string" -> {
        val h = geohashSql(lonSql.format("user_id"), latSql.format("user_id"),
          40)
        val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        val chars = (0 until 8).map { i =>
          val shift = java.math.BigInteger.valueOf(32).pow(7 - i)
          s"substr('$alphabet', CAST((h // $shift) % 32 AS INT) + 1, 1)"
        }.mkString(" || ")
        s"""WITH c AS (SELECT event_id, $h AS h FROM events)
           |SELECT event_id, $chars AS gh FROM c"""
          .stripMargin.replace("\n", " ")
      },

      "q_lla_to_ecef" -> {
        // mirror Geodesy.llaToEcef: n = a/sqrt(1-e2 sin^2), chord to (a,0,0)
        val e2 = "0.0066943799901413165" // F*(2-F) as the JVM computes it
        val a = "6378137.0"
        def ecef(lon: String, lat: String): (String, String, String) = {
          val sinLon = s"sin(($lon) * (pi() / 180.0))"
          val cosLon = s"cos(($lon) * (pi() / 180.0))"
          val sinLat = s"sin(($lat) * (pi() / 180.0))"
          val cosLat = s"cos(($lat) * (pi() / 180.0))"
          val n = s"($a / sqrt(1.0 - $e2 * $sinLat * $sinLat))"
          (s"(($n + 0.0) * $cosLat * $cosLon)",
           s"(($n + 0.0) * $cosLat * $sinLon)",
           s"(($n * (1.0 - $e2) + 0.0) * $sinLat)")
        }
        val (x, y, z) = ecef(lonSql.format("user_id"),
          latSql.format("user_id"))
        s"""SELECT user_id, round(sqrt(($x - $a)*($x - $a) +
           | ($y - 0.0)*($y - 0.0) + ($z - 0.0)*($z - 0.0)), 3)
           | AS dist_to_origin
           |FROM (SELECT DISTINCT user_id FROM events)"""
          .stripMargin.replace("\n", " ")
      },
      "q_doc_quality" ->
        """WITH q AS (SELECT doc_id,
          |  CAST(length(text) AS DOUBLE) AS len,
          |  CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS words,
          |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
          |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS upper
          |  FROM documents)
          |SELECT doc_id, round(
          |  LEAST(len / 500.0, 1.0) * 0.4 +
          |  LEAST(punct / GREATEST(words, 1.0) * 5.0, 1.0) * 0.2 +
          |  (1.0 - LEAST(upper / GREATEST(len, 1.0) * 4.0, 1.0)) * 0.2 +
          |  (CASE WHEN len / GREATEST(words, 1.0) BETWEEN 3.0 AND 10.0
          |     THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
          |FROM q""".stripMargin.replace("\n", " ")
    )
  }
}
