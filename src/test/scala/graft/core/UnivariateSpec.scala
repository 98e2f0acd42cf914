package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's univariate interpolation expectations
  * (`cxx/tests/math/interpolate/univariate/...`): exact reproduction of
  * polynomials within each method's degree, monotonicity for steffen,
  * derivative accuracy, NaN outside the domain.
  */
class UnivariateSpec extends AnyFunSuite {
  val xs = (0 to 20).map(_ * 0.5).toArray

  def fitEval(method: String, f: Double => Double, x: Double): Double = {
    val interp = Univariate1D(method)
    assert(interp.fit(xs, xs.map(f)))
    interp.value(x)
  }

  test("all methods reproduce a straight line exactly") {
    def f(x: Double) = 2.0 * x + 1.0
    for (m <- Seq("linear", "c_spline", "c_spline_not_a_knot", "akima",
        "steffen", "polynomial")) {
      val v = fitEval(m, f, 3.7)
      assert(math.abs(v - f(3.7)) < 1e-9, s"$m: $v")
    }
  }

  test("cubic-capable methods reproduce smooth fields tightly") {
    def f(x: Double) = math.sin(x)
    for (m <- Seq("c_spline", "c_spline_not_a_knot", "akima", "steffen")) {
      val v = fitEval(m, f, 4.3)
      assert(math.abs(v - f(4.3)) < 5e-2, s"$m: $v vs ${f(4.3)}")
    }
  }

  test("not-a-knot reproduces a cubic polynomial exactly") {
    def f(x: Double) = x * x * x - 2 * x * x + 3
    val v = fitEval("c_spline_not_a_knot", f, 2.25)
    assert(math.abs(v - f(2.25)) < 1e-8)
    // natural spline does NOT (curvature forced to 0 at ends)
    val vn = fitEval("c_spline", f, 0.25)
    assert(math.abs(vn - f(0.25)) > 1e-6)
  }

  test("polynomial reproduces a degree-5 polynomial exactly") {
    def f(x: Double) = 1 + x - x * x + 0.1 * x * x * x * x * x
    val small = (0 to 6).map(_ * 1.0).toArray
    val interp = Univariate1D("polynomial")
    assert(interp.fit(small, small.map(f)))
    assert(math.abs(interp.value(2.5) - f(2.5)) < 1e-8)
  }

  test("steffen preserves monotonicity (no overshoot)") {
    val x = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val y = Array(0.0, 0.0, 0.0, 1.0, 1.0, 1.0) // step
    val interp = Univariate1D("steffen")
    assert(interp.fit(x, y))
    var t = 0.0
    while (t <= 5.0) {
      val v = interp.value(t)
      assert(v >= -1e-12 && v <= 1.0 + 1e-12, s"overshoot at $t: $v")
      t += 0.05
    }
    // natural cspline overshoots on the same data
    val cs = Univariate1D("c_spline")
    cs.fit(x, y)
    val overshoot = (0 to 100).map(i => cs.value(i * 0.05))
      .exists(v => v < -1e-6 || v > 1.0 + 1e-6)
    assert(overshoot)
  }

  test("periodic cspline matches value and slope across the seam") {
    val n = 17
    val x = (0 until n).map(i => i * 2 * math.Pi / (n - 1)).toArray
    val y = x.map(math.sin)
    val interp = Univariate1D("c_spline_periodic")
    assert(interp.fit(x, y))
    val dLeft = interp.derivative(1e-9)
    val dRight = interp.derivative(2 * math.Pi - 1e-9)
    assert(math.abs(dLeft - dRight) < 1e-3)
    assert(math.abs(interp.value(1.0) - math.sin(1.0)) < 1e-3)
  }

  test("akima_periodic fits periodic data") {
    val n = 17
    val x = (0 until n).map(i => i * 2 * math.Pi / (n - 1)).toArray
    val y = x.map(math.cos)
    val interp = Univariate1D("akima_periodic")
    assert(interp.fit(x, y))
    assert(math.abs(interp.value(3.0) - math.cos(3.0)) < 1e-2)
  }

  test("derivatives approximate analytic derivative") {
    def f(x: Double) = math.sin(x)
    for (m <- Seq("c_spline", "akima")) {
      val interp = Univariate1D(m)
      assert(interp.fit(xs, xs.map(f)))
      val d = interp.derivative(5.0)
      assert(math.abs(d - math.cos(5.0)) < 0.05, s"$m: $d")
    }
    // steffen limits slopes near extrema; check in a monotonic region
    val st = Univariate1D("steffen")
    assert(st.fit(xs, xs.map(f)))
    assert(math.abs(st.derivative(0.3) - math.cos(0.3)) < 0.1)
  }

  test("NaN outside domain for every method") {
    for (m <- Seq("linear", "c_spline", "c_spline_not_a_knot",
        "c_spline_periodic", "akima", "akima_periodic", "steffen",
        "polynomial")) {
      val interp = Univariate1D(m)
      interp.fit(xs, xs.map(math.sin))
      assert(interp.value(-1.0).isNaN, m)
      assert(interp.value(99.0).isNaN, m)
    }
  }
}
