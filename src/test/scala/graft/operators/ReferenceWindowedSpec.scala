package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Axis

/** Direct replication of the reference's windowed interpolation suites
  * (`pyinterp/tests/core/windowed/test_bivariate.py`,
  * `test_trivariate.py`, `test_univariate.py`) — the faces BASELINE.md
  * names in its correctness gate: same analytic fixtures
  * (sin(x)·cos(y) on the 25×20 [0,2π]×[0,π] grid, ·exp(−z/10) on the
  * 15×12×8 cube, sin(x) / x² on 50 nodes), same probe points, same
  * published tolerances.
  */
class ReferenceWindowedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Pi = math.Pi

  private def grid2d(): Grid2D = {
    val xA = Axis.regular(0.0, 2 * Pi, 25)
    val yA = Axis.regular(0.0, Pi, 20)
    val v = new Array[Double](25 * 20)
    for (i <- 0 until 25; j <- 0 until 20)
      v(i * 20 + j) = math.sin(xA(i)) * math.cos(yA(j))
    Grid2D(xA, yA, v)
  }

  private def biv(g: Grid2D, pts: Seq[(Double, Double)], method: String)
      : Array[Double] =
    GridInterpolator.bivariate(spark, pts.toDF("x", "y"), "x", "y", g,
      method).select("value").as[Double].collect()

  test("bivariate single point bilinear at (pi/2, pi/4), rtol 0.02") {
    val expected = math.sin(Pi / 2) * math.cos(Pi / 4)
    val r = biv(grid2d(), Seq((Pi / 2, Pi / 4)), "bilinear")(0)
    assert(math.abs(r - expected) <= 0.02 * math.abs(expected), s"$r")
  }

  test("bivariate multiple points bilinear, rtol 0.05 (eps-zeroed)") {
    val pts = Seq((Pi / 4, Pi / 4), (Pi / 2, Pi / 2), (3 * Pi / 4, 3 * Pi / 4))
    val out = biv(grid2d(), pts, "bilinear")
    pts.zip(out).foreach { case ((x, y), r0) =>
      val e0 = math.sin(x) * math.cos(y)
      // the reference zeroes |v| < 1e-12 in BOTH arrays before allclose —
      // the (pi/2, pi/2) probe is an exact symmetric zero
      val r = if (math.abs(r0) < 1e-12) 0.0 else r0
      val e = if (math.abs(e0) < 1e-12) 0.0 else e0
      assert(r.isFinite)
      assert(math.abs(r - e) <= 0.05 * math.abs(e) + 1e-12, s"($x,$y): $r vs $e")
    }
  }

  test("bivariate all 10 windowed methods within 0.1 at (1.5, 1.2)") {
    val expected = math.sin(1.5) * math.cos(1.2)
    val methods = Seq("akima", "akima_periodic", "bicubic", "bilinear",
      "c_spline", "c_spline_not_a_knot", "c_spline_periodic", "linear",
      "polynomial", "steffen")
    val g = grid2d()
    methods.foreach { m =>
      val r = biv(g, Seq((1.5, 1.2)), m)(0)
      assert(r.isFinite, s"method $m produced NaN")
      assert(math.abs(r - expected) < 0.1, s"method $m: $r vs $expected")
    }
  }

  test("bivariate out-of-bounds probe yields NaN") {
    assert(biv(grid2d(), Seq((3 * Pi, 0.5)), "bilinear")(0).isNaN)
  }

  test("bivariate NaN block poisons a probe inside it") {
    val g0 = grid2d()
    val v = g0.values.clone()
    for (i <- 12 until 15; j <- 10 until 13) v(i * 20 + j) = Double.NaN
    val g = Grid2D(g0.xAxis, g0.yAxis, v)
    val r = biv(g, Seq((g.xAxis(13), g.yAxis(11))), "bilinear")(0)
    assert(r.isNaN)
  }

  test("bivariate mixed valid/invalid points") {
    val out = biv(grid2d(),
      Seq((Pi / 2, Pi / 4), (10.0, 0.5), (Pi / 4, Pi / 3)), "bilinear")
    assert(out(0).isFinite && out(2).isFinite && out(1).isNaN,
      out.mkString(","))
  }

  private def grid3d(): Grid3D = {
    val xA = Axis.regular(0.0, 2 * Pi, 15)
    val yA = Axis.regular(0.0, Pi, 12)
    val zA = Axis.regular(0.0, 10.0, 8)
    val v = new Array[Double](15 * 12 * 8)
    for (i <- 0 until 15; j <- 0 until 12; k <- 0 until 8)
      v(i * 12 * 8 + j * 8 + k) =
        math.sin(xA(i)) * math.cos(yA(j)) * math.exp(-zA(k) / 10.0)
    Grid3D(xA, yA, zA, v)
  }

  test("trivariate single point bilinear at (pi/2, pi/4, 5), rtol 0.04") {
    val expected = math.sin(Pi / 2) * math.cos(Pi / 4) * math.exp(-0.5)
    val r = GridInterpolator.trivariate(spark,
        Seq((Pi / 2, Pi / 4, 5.0)).toDF("x", "y", "z"), "x", "y", "z",
        grid3d(), "bilinear")
      .select("value").as[Double].head()
    assert(math.abs(r - expected) <= 0.04 * math.abs(expected), s"$r")
  }

  test("trivariate z-axis linear vs nearest combine differ off-plane") {
    val df = Seq((Pi / 2, Pi / 4, 5.0)).toDF("x", "y", "z")
    val lin = GridInterpolator.trivariate(spark, df, "x", "y", "z",
      grid3d(), "bilinear", zMethod = "linear")
      .select("value").as[Double].head()
    val near = GridInterpolator.trivariate(spark, df, "x", "y", "z",
      grid3d(), "bilinear", zMethod = "nearest")
      .select("value").as[Double].head()
    assert(math.abs(lin - near) > 0.01 * math.abs(lin), s"$lin vs $near")
  }

  private def sineGrid1d(): Grid1D = {
    val xA = Axis.regular(0.0, 2 * Pi, 50)
    Grid1D(xA, Array.tabulate(50)(i => math.sin(xA(i))))
  }

  private def squareGrid1d(): Grid1D = {
    val xA = Axis.regular(0.0, 10.0, 50)
    Grid1D(xA, Array.tabulate(50)(i => xA(i) * xA(i)))
  }

  test("univariate linear at pi/2 rtol 0.02; all methods within 0.1") {
    val r = GridInterpolator.univariate(spark, Seq(Pi / 2).toDF("x"), "x",
        sineGrid1d(), "linear").select("value").as[Double].head()
    assert(math.abs(r - 1.0) <= 0.02)
    val expected = math.sin(1.5)
    Seq("akima", "c_spline", "c_spline_not_a_knot", "linear", "polynomial",
        "steffen").foreach { m =>
      val v = GridInterpolator.univariate(spark, Seq(1.5).toDF("x"), "x",
        sineGrid1d(), m).select("value").as[Double].head()
      assert(v.isFinite && math.abs(v - expected) < 0.1, s"$m: $v")
    }
  }

  test("univariate derivative: f = x^2 gives 2x; sine gives cosine") {
    val d = GridInterpolator.univariate(spark,
        Seq(2.0, 5.0, 8.0).toDF("x"), "x", squareGrid1d(), "linear",
        derivative = true)
      .select(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("value"))
      .as[(Double, Double)].collect().toMap
    Seq(2.0, 5.0, 8.0).foreach { x =>
      assert(math.abs(d(x) - 2 * x) <= 0.1 * 2 * x, s"$x -> ${d(x)}")
    }
    val ds = GridInterpolator.univariate(spark,
        Seq(Pi / 4, Pi / 2, 3 * Pi / 4).toDF("x"), "x", sineGrid1d(),
        "c_spline", derivative = true)
      .select(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("value"))
      .as[(Double, Double)].collect().toMap
    ds.foreach { case (x, v) =>
      assert(math.abs(v - math.cos(x)) < 0.05, s"$x -> $v")
    }
  }
}
