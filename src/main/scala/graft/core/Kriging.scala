package graft.core

/** Kriging over a neighbor set (3-D coordinates, e.g. ECEF), matching
  * the reference semantics
  * (`/root/reference/cxx/include/pyinterp/math/interpolate/kriging.hpp`):
  * covariances matern12/32/52, cauchy, spherical, gaussian, wendland
  * (`:40-112`); simple kriging = Cholesky solve of C w = c (`:441-457`),
  * universal kriging = saddle-point system with linear (4) or quadratic
  * (10) drift basis (`:459-487`). Returns (prediction, variance).
  */
final class Kriging(sigma: Double, lambda: Double, nugget: Double,
                    covariance: String, drift: Option[String] = None)
    extends Serializable {
  require(sigma > 0 && lambda > 0 && nugget >= 0)

  private val sigma2 = sigma * sigma

  /** Covariance from squared distance (`kriging.hpp:45-112`). */
  def cov(r2: Double): Double = covariance match {
    case "matern_12" => sigma2 * math.exp(-math.sqrt(r2) / lambda)
    case "matern_32" =>
      val d = math.sqrt(r2) / lambda
      val s3 = math.sqrt(3.0)
      sigma2 * Math.fma(s3, d, 1.0) * math.exp(-s3 * d)
    case "matern_52" =>
      val d2 = r2 / (lambda * lambda)
      val d = math.sqrt(d2)
      val s5 = math.sqrt(5.0)
      sigma2 * Math.fma(5.0 / 3.0, d2, Math.fma(s5, d, 1.0)) *
        math.exp(-s5 * d)
    case "cauchy" => sigma2 / (1.0 + r2 / (lambda * lambda))
    case "spherical" =>
      if (r2 >= lambda * lambda) 0.0
      else {
        val t = math.sqrt(r2) / lambda
        sigma2 * Math.fma(0.5, t * t * t, Math.fma(-1.5, t, 1.0))
      }
    case "gaussian" => sigma2 * math.exp(-r2 / (lambda * lambda))
    case "wendland" =>
      if (r2 >= lambda * lambda) 0.0
      else {
        val t = 1.0 - math.sqrt(r2) / lambda
        sigma2 * t * t
      }
    case other => throw new IllegalArgumentException(s"covariance $other")
  }

  private def driftBasisSize: Int = drift match {
    case Some("quadratic") => 10
    case _ => 4
  }

  private def evalDrift(p: Array[Double]): Array[Double] = {
    val f = new Array[Double](driftBasisSize)
    f(0) = 1.0; f(1) = p(0); f(2) = p(1); f(3) = p(2)
    if (driftBasisSize == 10) {
      f(4) = p(0) * p(0); f(5) = p(1) * p(1); f(6) = p(2) * p(2)
      f(7) = p(0) * p(1); f(8) = p(0) * p(2); f(9) = p(1) * p(2)
    }
    f
  }

  @inline private def dist2(a: Array[Double], b: Array[Double]): Double = {
    val dx = a(0) - b(0); val dy = a(1) - b(1); val dz = a(2) - b(2)
    dx * dx + dy * dy + dz * dz
  }

  /** (prediction, variance); NaN when no neighbors. */
  def solve(coords: Array[Array[Double]], values: Array[Double],
            query: Array[Double]): (Double, Double) = {
    val n = coords.length
    if (n == 0) return (Double.NaN, Double.NaN)
    if (drift.isEmpty) {
      val a = Array.ofDim[Double](n, n + 1)
      var i = 0
      while (i < n) {
        a(i)(i) = sigma2 + nugget
        var j = i + 1
        while (j < n) {
          val cv = cov(dist2(coords(i), coords(j)))
          a(i)(j) = cv; a(j)(i) = cv
          j += 1
        }
        a(i)(n) = cov(dist2(query, coords(i)))
        i += 1
      }
      val c = Array.tabulate(n)(i => a(i)(n))
      val w = LinAlg.solve(a, n)
      if (w == null) return (Double.NaN, Double.NaN)
      var pred = 0.0
      var cw = 0.0
      i = 0
      while (i < n) { pred += values(i) * w(i); cw += c(i) * w(i); i += 1 }
      (pred, math.max(sigma2 + nugget - cw, 0.0))
    } else {
      val p = driftBasisSize
      if (n < p) return (Double.NaN, Double.NaN)
      val m = n + p
      val a = Array.ofDim[Double](m, m + 1)
      val fq = evalDrift(query)
      var i = 0
      while (i < n) {
        a(i)(i) = sigma2 + nugget
        var j = i + 1
        while (j < n) {
          val cv = cov(dist2(coords(i), coords(j)))
          a(i)(j) = cv; a(j)(i) = cv
          j += 1
        }
        val fi = evalDrift(coords(i))
        var k = 0
        while (k < p) {
          a(i)(n + k) = fi(k)
          a(n + k)(i) = fi(k)
          k += 1
        }
        a(i)(m) = cov(dist2(query, coords(i)))
        i += 1
      }
      var k = 0
      while (k < p) { a(n + k)(m) = fq(k); k += 1 }
      val b = Array.tabulate(m)(i => a(i)(m))
      // keep a copy for the rank-deficient retry (padded 2-D data zeroes
      // whole drift columns; the reference's colPivHouseholderQr absorbs
      // this — we regularize the saddle block instead)
      val aCopy = Array.tabulate(m)(i => a(i).clone())
      var x = LinAlg.solve(a, m)
      if (x == null) {
        var i2 = n
        while (i2 < m) { aCopy(i2)(i2) -= 1e-10; i2 += 1 }
        x = LinAlg.solve(aCopy, m)
      }
      if (x == null) return (Double.NaN, Double.NaN)
      var pred = 0.0
      i = 0
      while (i < n) { pred += values(i) * x(i); i += 1 }
      var bx = 0.0
      i = 0
      while (i < m) { bx += b(i) * x(i); i += 1 }
      (pred, math.max(sigma2 + nugget - bx, 0.0))
    }
  }
}

/** Shared small dense solver (Gaussian elimination, partial pivoting). */
object LinAlg {
  /** Solve a * x = rhs where rhs is column n of the augmented matrix;
    * destroys `a`; null when singular.
    */
  def solve(a: Array[Array[Double]], n: Int): Array[Double] = {
    var i = 0
    while (i < n) {
      var piv = i
      var j = i + 1
      while (j < n) {
        if (math.abs(a(j)(i)) > math.abs(a(piv)(i))) piv = j
        j += 1
      }
      val tmp = a(i); a(i) = a(piv); a(piv) = tmp
      if (a(i)(i) == 0.0) return null
      j = i + 1
      while (j < n) {
        val f = a(j)(i) / a(i)(i)
        var k = i
        while (k <= n) { a(j)(k) -= f * a(i)(k); k += 1 }
        j += 1
      }
      i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = a(i)(n)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }
}

/** Optimal interpolation (BLUE, 4-D capable), mirroring
  * `/root/reference/pyinterp/optimal_interpolation.py:5-153`: anisotropic
  * covariance C = sigma2 * K(r), r^2 = sum((delta_d / L_d)^2); observation
  * noise R = diag(sigma_obs^2); weights w = (C_oo + R)^-1 c_og; returns
  * (value, formal error variance, neighbor count).
  */
final class OptimalInterpolation(sigma2: Double, lengthScales: Array[Double],
                                 kernel: String = "gaussian")
    extends Serializable {

  private def k(r2: Double): Double = kernel match {
    case "gaussian" => math.exp(-0.5 * r2)
    case "matern_12" => math.exp(-math.sqrt(r2))
    case "matern_32" =>
      val d = math.sqrt(3.0 * r2)
      (1.0 + d) * math.exp(-d)
    case other => throw new IllegalArgumentException(s"kernel $other")
  }

  private def scaledR2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < lengthScales.length) {
      val delta = (a(d) - b(d)) / lengthScales(d)
      s += delta * delta
      d += 1
    }
    s
  }

  /** @param obsSigma2 per-observation noise variances (diag of R) */
  def solve(coords: Array[Array[Double]], values: Array[Double],
            obsSigma2: Array[Double], query: Array[Double])
      : (Double, Double, Int) = {
    val n = coords.length
    if (n == 0) return (Double.NaN, Double.NaN, 0)
    val a = Array.ofDim[Double](n, n + 1)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        a(i)(j) = sigma2 * k(scaledR2(coords(i), coords(j)))
        j += 1
      }
      a(i)(i) += obsSigma2(i)
      a(i)(n) = sigma2 * k(scaledR2(query, coords(i)))
      i += 1
    }
    val c = Array.tabulate(n)(i => a(i)(n))
    val w = LinAlg.solve(a, n)
    if (w == null) return (Double.NaN, Double.NaN, 0)
    var v = 0.0
    var cw = 0.0
    i = 0
    while (i < n) { v += values(i) * w(i); cw += c(i) * w(i); i += 1 }
    (v, math.max(sigma2 - cw, 0.0), n)
  }
}
