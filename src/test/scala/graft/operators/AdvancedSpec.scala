package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{Fill, GeoHash, Kriging, OptimalInterpolation}

class KrigingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("simple kriging is exact at data points and smooth between") {
    val coords = (for { i <- 0 to 4; j <- 0 to 4 }
      yield Array(i.toDouble, j.toDouble, 0.0)).toArray
    val values = coords.map(c => math.sin(c(0) * 0.5) + math.cos(c(1) * 0.5))
    val model = new Kriging(1.0, 2.0, 0.0, "matern_32")
    // exact at a node
    val (v0, var0) = model.solve(coords, values, Array(2.0, 2.0, 0.0))
    assert(math.abs(v0 - values(2 * 5 + 2)) < 1e-8)
    assert(var0 < 1e-8)
    // close to truth between nodes
    val (v1, _) = model.solve(coords, values, Array(2.5, 2.5, 0.0))
    val truth = math.sin(2.5 * 0.5) + math.cos(2.5 * 0.5)
    assert(math.abs(v1 - truth) < 0.05, s"$v1 vs $truth")
  }

  test("universal kriging with linear drift reproduces linear fields") {
    val coords = (for { i <- 0 to 4; j <- 0 to 4 }
      yield Array(i.toDouble, j.toDouble, 0.0)).toArray
    val values = coords.map(c => 2.0 + 3.0 * c(0) - c(1))
    val model = new Kriging(1.0, 1.0, 0.0, "gaussian", Some("linear"))
    val (v, _) = model.solve(coords, values, Array(1.7, 3.2, 0.0))
    assert(math.abs(v - (2.0 + 3.0 * 1.7 - 3.2)) < 1e-6)
  }

  test("all covariance kernels are positive at 0 and decay") {
    for (k <- Seq("matern_12", "matern_32", "matern_52", "cauchy",
        "spherical", "gaussian", "wendland")) {
      val m = new Kriging(2.0, 1.5, 0.0, k)
      assert(math.abs(m.cov(0.0) - 4.0) < 1e-12, k)
      assert(m.cov(0.25) > m.cov(1.0), k)
      assert(m.cov(100.0) < 0.5, k)
    }
  }

  test("kriging dataframe operator") {
    val rows = for { i <- 0 to 4; j <- 0 to 4 }
      yield (i.toDouble, j.toDouble, (i + j).toDouble, (i * 5 + j).toLong)
    val build = rows.toDF("x", "y", "value", "id")
    val probe = Seq((0L, 2.0, 2.0)).toDF("qid", "x", "y")
    val out = KnnJoin.kriging(spark, build, probe,
      KnnJoin.Config(k = 25, geodetic = false), sigma = 1.0, lambda = 2.0,
      covariance = "matern_32", drift = Some("linear")).head
    assert(math.abs(out.getDouble(1) - 4.0) < 1e-6)
  }

  test("optimal interpolation BLUE recovers values with error estimate") {
    val coords = (for { i <- 0 to 4; j <- 0 to 4 }
      yield Array(i.toDouble, j.toDouble)).toArray
    val values = coords.map(c => c(0) * 0.5 + c(1) * 0.25)
    val oi = new OptimalInterpolation(1.0, Array(2.0, 2.0))
    val (v, err, n) = oi.solve(coords, values, Array.fill(25)(1e-6),
      Array(2.0, 2.0))
    assert(n == 25)
    assert(math.abs(v - 1.5) < 0.01)
    assert(err >= 0.0 && err < 0.1)
  }
}

class FillSpec extends AnyFunSuite {
  test("fill.vector interpolates interior NaN runs linearly") {
    val ys = Array(1.0, Double.NaN, Double.NaN, 4.0, 5.0, Double.NaN)
    val out = Fill.vector(ys)
    assert(math.abs(out(1) - 2.0) < 1e-12)
    assert(math.abs(out(2) - 3.0) < 1e-12)
    assert(out(5).isNaN) // trailing NaN untouched
  }

  test("fill.matrixRows fills along rows") {
    // 2x4 grid x-major: row 0 has a hole
    val vals = Array(1.0, Double.NaN, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0)
    val out = Fill.matrixRows(vals, 2, 4)
    assert(math.abs(out(1) - 2.0) < 1e-12)
    assert(out(5) == 20.0)
  }

  test("fill frame_index edge reflection matches the reference mapping") {
    import graft.core.GeoMath.reflectIndex
    // reference fill/helpers.hpp:79-110 non-angle branch: reflect about
    // the edge NODES
    assert(reflectIndex(-1, 48) === 1)
    assert(reflectIndex(-2, 48) === 2)
    assert(reflectIndex(48, 48) === 46)
    assert(reflectIndex(49, 48) === 45)
    assert(reflectIndex(-3, 12) === 3)
    assert(reflectIndex(13, 12) === 9)
    assert(reflectIndex(0, 12) === 0)
    assert(reflectIndex(11, 12) === 11)
    assert(reflectIndex(5, 1) === 0)
  }

  test("loess edge holes use reflected (not clamped) windows") {
    // constant field: any weighting fills the corner hole with the
    // constant; asymmetric field: the reflected window's duplicate
    // interior visits shift the mean INWARD vs a clamped window
    val nx = 8; val ny = 8
    val const = Array.fill(nx * ny)(7.5)
    const(0) = Double.NaN
    val cOut = graft.core.Fill.loess(const, nx, ny, 2, 2, "undefined")
    assert(math.abs(cOut(0) - 7.5) < 1e-12)
    // linear-in-i field: reflection makes the corner window symmetric
    // about i=0 in MAPPED index space: neighbors at mapped i in
    // {0,1,2} × j in {0,1,2} with reflected duplicates; the exact value
    // is recomputed here independently via the reference mapping
    val lin = Array.tabulate(nx * ny)(k => (k / ny).toDouble)
    lin(0) = Double.NaN
    val lOut = graft.core.Fill.loess(lin, nx, ny, 2, 2, "undefined")
    var ws = 0.0; var wvs = 0.0
    for (oi <- -2 to 2; oj <- -2 to 2) {
      val wi = graft.core.GeoMath.reflectIndex(oi, nx)
      val wj = graft.core.GeoMath.reflectIndex(oj, ny)
      if (!(wi == 0 && wj == 0)) {
        val d = math.sqrt(wi * wi / 4.0 + wj * wj / 4.0)
        if (d <= 1.0) {
          val t = 1 - d * d * d; val w = t * t * t
          ws += w; wvs += w * wi
        }
      }
    }
    assert(math.abs(lOut(0) - wvs / ws) < 1e-12)
  }

  test("loess fills holes with tri-cube weighted neighborhood") {
    val nx = 10
    val ny = 10
    def f(i: Int, j: Int) = 0.1 * i + 0.05 * j
    val vals = Array.tabulate(nx * ny)(k => f(k / ny, k % ny))
    vals(5 * ny + 5) = Double.NaN
    val out = Fill.loess(vals, nx, ny, 3, 3, "undefined")
    assert(!out(5 * ny + 5).isNaN)
    assert(math.abs(out(5 * ny + 5) - f(5, 5)) < 0.05)
    // defined values untouched in "undefined" mode
    assert(out(2 * ny + 2) == f(2, 2))
  }

  test("loessReference matches the reference iterative driver on a " +
      "hole blob") {
    // reference fill/loess.hpp:216-250 semantics: global-mean first
    // guess of EVERY hole, then each pass re-smooths the ORIGINAL holes
    // against the previous full state, converging on max |change|.
    // Expected values recomputed here by an independent direct loop.
    val nx = 12; val ny = 12
    def f(i: Int, j: Int) = 0.3 * i - 0.2 * j + 1.5
    val vals = Array.tabulate(nx * ny)(k => f(k / ny, k % ny))
    // a 3x3 hole blob (windows see other holes -> iteration matters)
    for (i <- 4 to 6; j <- 4 to 6) vals(i * ny + j) = Double.NaN
    val holes = for (i <- 4 to 6; j <- 4 to 6) yield (i, j)
    val maxIt = 4
    val (got, its) = Fill.loessReference(vals, nx, ny, 2, 2,
      maxIterations = maxIt, epsilon = 0.0) // run all passes
    assert(its === maxIt)
    // independent reimplementation of the driver
    var known = 0.0; var cnt = 0
    for (k <- vals.indices if !vals(k).isNaN) { known += vals(k); cnt += 1 }
    val mean = known / cnt
    var st = vals.map(v => if (v.isNaN) mean else v)
    for (_ <- 0 until maxIt) {
      val nxt = st.clone()
      for ((i, j) <- holes) {
        var ws = 0.0; var wvs = 0.0
        for (oi <- -2 to 2; oj <- -2 to 2) {
          val wi = graft.core.GeoMath.reflectIndex(i + oi, nx)
          val wj = graft.core.GeoMath.reflectIndex(j + oj, ny)
          val dx = (wi - i) / 2.0; val dy = (wj - j) / 2.0
          val d = math.sqrt(dx * dx + dy * dy)
          if (d <= 1.0) {
            val t = 1 - d * d * d; val w = t * t * t
            ws += w; wvs += w * st(wi * ny + wj)
          }
        }
        nxt(i * ny + j) = wvs / ws
      }
      st = nxt
    }
    for (k <- vals.indices)
      assert(got(k) === st(k), s"cell $k: ${got(k)} vs ${st(k)}")
    // the first-guess bias is visible: pass-1 hole values pull toward
    // the global mean, unlike the progressive loessIterative
    val (prog, _) = Fill.loessIterative(vals, nx, ny, 2, 2,
      maxIterations = maxIt, epsilon = 0.0)
    assert(holes.exists { case (i, j) =>
      math.abs(got(i * ny + j) - prog(i * ny + j)) > 1e-9 })
    // maxIterations == 1 takes the reference single-pass branch: no
    // first guess, raw one-pass smoothing (loess.hpp:221-225)
    val single = Array.tabulate(nx * ny)(k => f(k / ny, k % ny))
    single(5 * ny + 5) = Double.NaN
    val (refOne, _) = Fill.loessReference(single, nx, ny, 2, 2,
      maxIterations = 1)
    val progOne = Fill.loess(single, nx, ny, 2, 2, "undefined")
    assert(refOne(5 * ny + 5) === progOne(5 * ny + 5))
  }

  test("gauss_seidel converges to harmonic fill") {
    val n = 16
    // boundary = linear field (harmonic), interior NaN -> must recover it
    val vals = Array.tabulate(n * n) { k =>
      val i = k / n
      val j = k % n
      if (i == 0 || j == 0 || i == n - 1 || j == n - 1) 1.0 * i + 2.0 * j
      else Double.NaN
    }
    val (filled, iters, residual) = Fill.gaussSeidel(vals, n, n,
      maxIterations = 2000, epsilon = 1e-10, relaxation = 1.5)
    assert(residual < 1e-9, s"iters=$iters residual=$residual")
    for (i <- 1 until n - 1; j <- 1 until n - 1)
      assert(math.abs(filled(i * n + j) - (1.0 * i + 2.0 * j)) < 1e-6,
        s"($i,$j): ${filled(i * n + j)}")
  }
}

class CrossoverSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two crossing diagonal tracks intersect at the center") {
    val a = Array.tabulate(11)(i => (i.toDouble, i.toDouble))
    val b = Array.tabulate(11)(i => (i.toDouble, 10.0 - i))
    val found = Crossover.findLocal(a, b)
    assert(found.length == 1)
    val (x, y, ia, ib) = found(0)
    assert(math.abs(x - 5.0) < 1e-12 && math.abs(y - 5.0) < 1e-12)
    assert(ia == 5 && ib == 5)
  }

  test("parallel tracks do not intersect") {
    val a = Array.tabulate(5)(i => (i.toDouble, 0.0))
    val b = Array.tabulate(5)(i => (i.toDouble, 1.0))
    assert(Crossover.findLocal(a, b).isEmpty)
  }

  test("dataframe crossover join") {
    val a = (0 to 10).map(i => (i, i.toDouble, i.toDouble)).toDF("idx", "x", "y")
    val b = (0 to 10).map(i => (i, i.toDouble, 10.0 - i)).toDF("idx", "x", "y")
    val out = Crossover.join(spark, a, b).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(0) == 5.0)
  }

  test("geodetic crossover across the antimeridian (no spurious lon-0 hit)") {
    // A ascends lat through the seam going east, B descends; in the
    // unwrapped frame A: lat = u - 180, B: lat = 180.5 - u -> crossing at
    // u = 180.25 (lon -179.75), lat 0.25
    val a = Seq((0, 178.0, -2.0), (1, 179.0, -1.0), (2, -180.0, 0.0),
      (3, -179.0, 1.0), (4, -178.0, 2.0)).toDF("idx", "x", "y")
    val b = Seq((0, 178.0, 2.5), (1, 179.0, 1.5), (2, -180.0, 0.5),
      (3, -179.0, -0.5), (4, -178.0, -1.5)).toDF("idx", "x", "y")
    val out = Crossover.join(spark, a, b, geodetic = true).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(math.abs(out(0).getDouble(0) - (-179.75)) < 1e-9)
    assert(math.abs(out(0).getDouble(1) - 0.25) < 1e-9)
    // planar mode on the same wrapped input WOULD see ~360°-wide segments;
    // geodetic mode must not report anything near lon 0
    assert(math.abs(out(0).getDouble(0)) > 170.0)
  }

  test("exact-seam opposite-direction crossover reported exactly once") {
    // r3 ADVICE: A eastbound and B westbound cross EXACTLY on the
    // antimeridian (mid-segment). Their outgoing pieces land in different
    // frames (-180 vs +180), so the old outgoing-only (t = 0) rule missed
    // the point entirely; the closed-seam-endpoint acceptance + dedup must
    // report it exactly once, at normalized lon -180.
    val a = Seq((0, 179.0, -1.0), (1, -179.0, 1.0)).toDF("idx", "x", "y")
    val b = Seq((0, -179.0, 1.0), (1, 179.0, -1.0))
      .map { case (i, x, y) => (i, x, -y) }.toDF("idx", "x", "y")
    val out = Crossover.join(spark, a, b, geodetic = true).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out(0).getDouble(0) == -180.0)
    assert(math.abs(out(0).getDouble(1)) < 1e-9)
  }

  test("exact-seam shared-vertex crossover reported exactly once") {
    // both tracks carry a vertex exactly at lon ±180 (rounded-lon-grid
    // ephemeris shape) and cross there travelling in opposite directions
    val a = Seq((0, 179.0, -1.0), (1, -180.0, 0.0), (2, -179.0, 1.0))
      .toDF("idx", "x", "y")
    val b = Seq((0, -179.0, -1.0), (1, -180.0, 0.0), (2, 179.0, 1.0))
      .toDF("idx", "x", "y")
    val out = Crossover.join(spark, a, b, geodetic = true).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out(0).getDouble(0) == -180.0)
    assert(math.abs(out(0).getDouble(1)) < 1e-9)
    assert(out(0).getInt(2) == 1 && out(0).getInt(3) == 1)
  }

  test("supercover cell cover is O(ix+iy) for a long diagonal, not ix*iy") {
    // one segment spanning 100x100 cells diagonally: bbox-product cover
    // would replicate it 10000x; the supercover must stay ~3 per column
    val seg = Seq((0, 0.0, 0.0, 100.0, 100.0))
      .toDF("ia", "ax1", "ay1", "ax2", "ay2")
    // exact-corner diagonal sweeps 2 cells per column + ±1 fp armor = 4
    val n = Crossover.coverCells(seg, "a", 1.0).count()
    assert(n <= 4 * 101 + 4, s"cover exploded to $n cells")
    assert(n >= 101)
    // and the hit is still found end-to-end with the default cell derive
    val ta = Seq((0, 0.0, 0.0), (1, 100.0, 100.0)).toDF("idx", "x", "y")
    val tb = Seq((0, 0.0, 100.0), (1, 100.0, 0.0)).toDF("idx", "x", "y")
    val out = Crossover.join(spark, ta, tb).collect()
    assert(out.length == 1 && out(0).getDouble(0) == 50.0 &&
      out(0).getDouble(1) == 50.0)
  }
}

class GeohashStringSpec extends AnyFunSuite {
  test("base32 string round trip and known prefix nesting") {
    val (lon, lat) = (-5.6, 42.6)
    val s = GeoHash.toString(lon, lat, 8)
    assert(s.length == 8)
    val (h, bits) = GeoHash.fromString(s)
    assert(bits == 40)
    val (x0, y0, x1, y1) = GeoHash.boundingBox(h, bits)
    assert(lon >= x0 && lon < x1 && lat >= y0 && lat < y1)
    // prefix property: shorter string = coarser containing cell
    assert(GeoHash.toString(lon, lat, 4) == s.take(4))
  }

  test("known geohash value (paris ~ u09t)") {
    // published geohash of (2.35, 48.85) starts with u09
    assert(GeoHash.toString(2.35, 48.85, 4).startsWith("u09"))
  }
}

class StreamingBinningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming windowed stats equal batch result (memory sink)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = graft.streaming.StreamingBinning.windowedStats(
      stream, "ts", col("event_type"), col("value"),
      windowLength = "6 hours", lateness = "1 minute")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT window_start, cell, count, sum FROM stream_out")
      .collect()
      .map(r => ((r.get(0).toString, r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // batch reference (same TIMESTAMP cast as the streaming operator)
    val batch = spark.read.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "6 hours").getField("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("s"))
      .collect()
      .map(r => ((r.get(0).toString, r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == batch.keySet)
    batch.foreach { case (k, (c, s)) =>
      assert(got(k)._1 == c)
      assert(math.abs(got(k)._2 - s) < 1e-9)
    }
  }
}

class ImageOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def imagesDf() = {
    import spark.implicits._
    graft.pipeline.ImageTableGen.generate(spark, 10, 16).toDF()
  }

  test("decode appends pixel arrays with matching dims") {
    val out = ImageOps.decode(imagesDf()).select("dec_w", "dec_h", "pixels")
      .collect()
    out.foreach { r =>
      assert(r.getInt(0) == 16 && r.getInt(1) == 16)
      assert(r.getSeq[Float](2).length == 256)
    }
  }

  test("resize preserves smooth content") {
    val out = ImageOps.resize(imagesDf(), 8, 8).select("image_id", "resized")
      .collect()
    out.foreach { r =>
      val resized = r.getSeq[Float](1)
      assert(resized.length == 64)
      assert(resized.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("features include valid stats and stable ahash") {
    val df = imagesDf()
    val a = ImageOps.features(df).select("image_id", "px_mean", "ahash")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2))))
      .toMap
    val b = ImageOps.features(df).select("image_id", "px_mean", "ahash")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2))))
      .toMap
    assert(a == b) // deterministic
    a.values.foreach { case (mean, _) => assert(mean > 0.0 && mean < 1.0) }
  }
}

class OrbitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Synthetic inclined-orbit ground track: lat oscillates, lon advances. */
  def track(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      val t = i.toDouble
      (t, (t * 2.0) % 360.0 - 180.0, 60.0 * math.sin(2 * math.Pi * t / 100.0))
    }.toDF("time", "lon", "lat")

  test("pass decomposition splits at latitude extrema") {
    val out = Orbit.passDecomposition(track(300), "time", "lat")
    val passes = out.select("pass_number").distinct().count()
    // 300 samples over 3 sine periods = 6 half-orbits (+1 partial)
    assert(passes >= 6 && passes <= 8, s"passes=$passes")
    // ascending flag alternates between consecutive passes
    val byPass = out.groupBy("pass_number")
      .agg(avg(col("ascending").cast("int")).as("asc"))
      .orderBy("pass_number").collect().map(_.getDouble(1))
    byPass.sliding(2).drop(1).foreach { case Array(a, b) =>
      assert((a > 0.5) != (b > 0.5), byPass.mkString(","))
    }
  }

  test("resampled track stays on the original path") {
    val out = Orbit.resampleTrack(spark, track(200), factor = 4)
    assert(out.count() > 600)
    val sample = out.filter(col("pass_number") === 2).collect()
    sample.foreach { r =>
      val lat = r.getDouble(3)
      assert(lat >= -60.5 && lat <= 60.5)
    }
  }
}

class IrregularBinningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("irregular axis nearest-bin matches core Axis.findIndex(bounded)") {
    val ax = graft.core.Axis(Array(0.0, 1.0, 4.0, 9.0, 16.0))
    val binning = new Binning2D(ax, ax)
    val xs = Seq(-3.0, 0.4, 2.4, 2.6, 7.0, 12.0, 20.0)
    val df = xs.map(x => (x, 0.0, 1.0)).toDF("x", "y", "z")
    val got = df.select(col("x"), binning.binIndex(ax, col("x")).as("ix"))
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    xs.foreach { x =>
      assert(got(x) == ax.findIndex(x, bounded = true), s"x=$x")
    }
  }
}
