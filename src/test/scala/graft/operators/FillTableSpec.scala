package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Distributed (grid-as-table) Gauss-Seidel fill: harmonic-plane closed
  * form, preservation of known cells, and parity with the in-core
  * solver — including the periodic-x seam, where the halo wraps.
  */
class FillTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val n = 32

  /** Boundary ring = i + 2j (harmonic), interior NaN. */
  private def planeGrid() = spark.range(n.toLong * n).select(
    floor(col("id") / n).cast("double").as("x"),
    (col("id") % n).cast("double").as("y"),
    when(floor(col("id") / n) === 0 || col("id") % n === 0 ||
      floor(col("id") / n) === n - 1 || col("id") % n === n - 1,
      floor(col("id") / n) + (col("id") % n) * 2.0)
      .otherwise(lit(Double.NaN)).as("v"))

  test("harmonic plane is recovered exactly (to solver tolerance)") {
    val out = FillTable.gaussSeidelTable(spark, planeGrid(), "x", "y", "v",
      blockSize = 8, haloWidth = 4, innerSweeps = 40,
      maxSuperIterations = 80, epsilon = 1e-8)
    val rows = out.collect()
    assert(rows.length === n * n)
    rows.foreach { r =>
      val x = r.getDouble(0); val y = r.getDouble(1)
      val v = r.getDouble(2); val filled = r.getBoolean(3)
      assert(math.abs(v - (x + 2 * y)) < 1e-4, s"($x,$y): $v")
      // knowns (boundary ring) preserved EXACTLY, not relaxed
      if (!filled) assert(v === x + 2 * y, s"known ($x,$y) changed")
      assert(filled === (x != 0 && y != 0 && x != n - 1 && y != n - 1))
    }
  }

  test("parity with the in-core solver, non-periodic and periodic-x") {
    // non-separable boundary data -> no closed form; both solvers must
    // converge to the same discrete Laplace solution
    def bnd(i: Int, j: Int): Double =
      math.sin(2 * math.Pi * i / n) * 3 + j * 0.5 + (i % 5)
    val vals = Array.tabulate(n * n) { k =>
      val i = k / n; val j = k % n
      if (i == 0 || j == 0 || i == n - 1 || j == n - 1) bnd(i, j)
      else Double.NaN
    }
    val iC = floor(col("id") / n)
    val jC = col("id") % n
    val gridDf = spark.range(n.toLong * n).select(
      iC.cast("double").as("x"), jC.cast("double").as("y"),
      when(iC === 0 || jC === 0 || iC === n - 1 || jC === n - 1,
        sin(iC.cast("double") * (2 * math.Pi / n)) * 3 +
          jC.cast("double") * 0.5 + (iC % 5).cast("double"))
        .otherwise(lit(Double.NaN)).as("v"))
    for (per <- Seq(false, true)) {
      val (core, _, _) = graft.core.Fill.gaussSeidel(vals.clone(), n, n,
        periodicX = per, maxIterations = 5000, epsilon = 1e-9)
      val dist = FillTable.gaussSeidelTable(spark, gridDf, "x", "y", "v",
          blockSize = 8, haloWidth = 4, innerSweeps = 40,
          maxSuperIterations = 120, epsilon = 1e-8, periodicX = per)
        .collect().map(r => (r.getDouble(0).toInt, r.getDouble(1).toInt) ->
          r.getDouble(2)).toMap
      var maxDiff = 0.0
      for (i <- 0 until n; j <- 0 until n) {
        val d = math.abs(dist((i, j)) - core(i * n + j))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff < 1e-4, s"periodicX=$per maxDiff $maxDiff")
    }
  }
}
