package graft.core

/** Geodesic strategy family over a configurable spheroid — the engine's
  * analog of the reference's Andoyer/Karney/Thomas/Vincenty strategies
  * (`geometry/geographic/algorithms/strategy.hpp:16-21`, used by
  * distance/azimuth/area/... in the same directory). All formulas are the
  * published ones:
  *
  *  - andoyer: Andoyer-Lambert first-order (in flattening) closed form.
  *  - thomas: Thomas (1965/1970) second-order closed form.
  *  - vincenty: Vincenty (1975) iterative inverse.
  *  - karney: the Karney (2013) series inverse on the principal branch
  *    (auxiliary-sphere ε-series, Illinois bracket on the departure
  *    azimuth), with the narrow near-antipodal ambiguity region answered
  *    by exact-ODE Newton shooting and capped Vincenty as the last
  *    resort. µm-class agreement with converged Vincenty everywhere the
  *    λ iteration converges; sub-mm vs the shooting solution in the
  *    antipodal band.
  *
  * Plus spheroid area primitives: the EXACT ellipsoidal area of a
  * lon/lat-aligned rectangle (the kernel behind geographic linear-binning
  * weights, `math/interpolate/bilinear_weights.hpp:87-146`, and geohash
  * `cell area`, `geohash/int64.hpp:124-136`) and an authalic-sphere
  * polygon area.
  */
final case class Spheroid(a: Double, f: Double) extends Serializable {
  val b: Double = a * (1.0 - f)
  val e2: Double = f * (2.0 - f)
  /** Authalic (equal-area) sphere radius. */
  val authalicRadius: Double = {
    val e = math.sqrt(e2)
    if (e < 1e-12) a
    else math.sqrt(a * a / 2.0 *
      (1.0 + (1.0 - e2) / e * 0.5 * math.log((1.0 + e) / (1.0 - e))))
  }
}

object Spheroid {
  /** WGS84 (`geometry/geographic/spheroid.hpp` default). */
  val Wgs84: Spheroid = Spheroid(6378137.0, 1.0 / 298.257223563)
}

object Geodesics {

  /** Inverse solution: (distance m, forward azimuth deg, reverse azimuth
    * deg). Azimuths measured clockwise from north in [-180, 180].
    */
  final case class Inverse(distance: Double, azimuth: Double,
                           reverseAzimuth: Double)

  def inverse(method: String, lon1: Double, lat1: Double, lon2: Double,
              lat2: Double, s: Spheroid = Spheroid.Wgs84): Inverse =
    method match {
      case "andoyer" => andoyer(lon1, lat1, lon2, lat2, s)
      case "thomas" => thomas(lon1, lat1, lon2, lat2, s)
      case "vincenty" => vincenty(lon1, lat1, lon2, lat2, s, 100)
      case "karney" => karney(lon1, lat1, lon2, lat2, s)
      case other => throw new IllegalArgumentException(s"strategy $other")
    }

  def distance(method: String, lon1: Double, lat1: Double, lon2: Double,
               lat2: Double, s: Spheroid = Spheroid.Wgs84): Double =
    inverse(method, lon1, lat1, lon2, lat2, s).distance

  def azimuth(method: String, lon1: Double, lat1: Double, lon2: Double,
              lat2: Double, s: Spheroid = Spheroid.Wgs84): Double =
    inverse(method, lon1, lat1, lon2, lat2, s).azimuth

  @inline private def normLonDiff(d: Double): Double = {
    var x = d % 360.0
    if (x > 180.0) x -= 360.0
    if (x < -180.0) x += 360.0
    x
  }

  /** Spherical azimuths on the reduced-latitude sphere — the azimuth
    * companion of the closed-form distance approximations.
    */
  private def reducedAzimuths(lon1: Double, lat1: Double, lon2: Double,
      lat2: Double, s: Spheroid): (Double, Double) = {
    val u1 = math.atan((1.0 - s.f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1.0 - s.f) * math.tan(math.toRadians(lat2)))
    val dl = math.toRadians(normLonDiff(lon2 - lon1))
    val a1 = math.atan2(math.cos(u2) * math.sin(dl),
      math.cos(u1) * math.sin(u2) - math.sin(u1) * math.cos(u2) * math.cos(dl))
    val a2 = math.atan2(math.cos(u1) * math.sin(dl),
      -math.sin(u1) * math.cos(u2) + math.cos(u1) * math.sin(u2) * math.cos(dl))
    (math.toDegrees(a1), math.toDegrees(a2))
  }

  /** Andoyer-Lambert first-order formula (Forsythe's form). */
  def andoyer(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
              s: Spheroid = Spheroid.Wgs84): Inverse = {
    val p1 = math.toRadians(lat1)
    val p2 = math.toRadians(lat2)
    val dl = math.toRadians(normLonDiff(lon2 - lon1))
    val fM = (p1 + p2) / 2.0
    val gM = (p1 - p2) / 2.0
    val lM = dl / 2.0
    val sinG = math.sin(gM); val cosG = math.cos(gM)
    val sinF = math.sin(fM); val cosF = math.cos(fM)
    val sinL = math.sin(lM); val cosL = math.cos(lM)
    val sS = sinG * sinG * cosL * cosL + cosF * cosF * sinL * sinL
    val cC = cosG * cosG * cosL * cosL + sinF * sinF * sinL * sinL
    if (sS == 0.0) return Inverse(0.0, 0.0, 0.0)
    val omega = math.atan(math.sqrt(sS / cC))
    val rR = math.sqrt(sS * cC) / omega
    val dD = 2.0 * omega * s.a
    val h1 = (3.0 * rR - 1.0) / (2.0 * cC)
    val h2 = (3.0 * rR + 1.0) / (2.0 * sS)
    val dist = dD * (1.0 +
      s.f * h1 * sinF * sinF * cosG * cosG -
      s.f * h2 * cosF * cosF * sinG * sinG)
    val (a1, a2) = reducedAzimuths(lon1, lat1, lon2, lat2, s)
    Inverse(dist, a1, a2)
  }

  /** Thomas second-order formula (Thomas 1965, the f^2 expansion on
    * reduced latitudes).
    */
  def thomas(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
             s: Spheroid = Spheroid.Wgs84): Inverse = {
    val f = s.f
    val t1 = math.atan((1.0 - f) * math.tan(math.toRadians(lat1)))
    val t2 = math.atan((1.0 - f) * math.tan(math.toRadians(lat2)))
    val dl = math.toRadians(normLonDiff(lon2 - lon1))
    val tm = (t1 + t2) / 2.0
    val dtm = (t2 - t1) / 2.0
    val dlm = dl / 2.0
    val sinTm = math.sin(tm); val cosTm = math.cos(tm)
    val sinDtm = math.sin(dtm); val cosDtm = math.cos(dtm)
    val sinDlm = math.sin(dlm)
    val hH = cosTm * cosTm - sinDtm * sinDtm
    val lL = sinDtm * sinDtm + hH * sinDlm * sinDlm
    if (lL <= 0.0 || lL >= 1.0)
      return Inverse(if (lL <= 0.0) 0.0 else math.Pi * s.b, 0.0, 0.0)
    val cosD = 1.0 - 2.0 * lL
    val d = math.acos(cosD)
    val sinD = math.sin(d)
    val uU = 2.0 * sinTm * sinTm * cosDtm * cosDtm / (1.0 - lL)
    val vV = 2.0 * sinDtm * sinDtm * cosTm * cosTm / lL
    val xX = uU + vV
    val yY = uU - vV
    val tT = d / sinD
    val dD = 4.0 * tT * tT
    val eE = 2.0 * cosD
    val aA = dD * eE
    val bB = 2.0 * dD
    val cC = tT - (aA - eE) / 2.0
    val n1 = xX * (aA + cC * xX)
    val n2 = yY * (bB + eE * yY)
    val n3 = dD * xX * yY
    val delta1 = f * (tT * xX - yY) / 4.0
    val delta2 = (f * f / 64.0) * (n1 - n2 + n3)
    val dist = s.a * sinD * (tT - delta1 + delta2)
    val (a1, a2) = reducedAzimuths(lon1, lat1, lon2, lat2, s)
    Inverse(dist, a1, a2)
  }

  /** Vincenty (1975) iterative inverse; NaN-free: returns the converged
    * (or capped-iteration) value. `fixedIterations > 0` runs EXACTLY that
    * many iterations (deterministic across engines — used by the unrolled
    * SQL oracle); 0 means converge to 1e-12 with a 100 cap.
    */
  def vincenty(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
               s: Spheroid = Spheroid.Wgs84, maxIter: Int = 100,
               fixedIterations: Int = 0): Inverse =
    vincentyImpl(lon1, lat1, lon2, lat2, s, maxIter, fixedIterations)._1

  /** Like [[vincenty]] but also reports CONVERGENCE: false when the λ
    * iteration was still moving ≥1e-12 at the cap (the silent-wrong-answer
    * region just outside any fixed near-antipodal gate). [[karney]] routes
    * those to [[shootingInverse]]. `fixedIterations > 0` counts as
    * converged by definition (deterministic-SQL mode).
    */
  private[core] def vincentyImpl(lon1: Double, lat1: Double, lon2: Double,
               lat2: Double, s: Spheroid = Spheroid.Wgs84, maxIter: Int = 100,
               fixedIterations: Int = 0): (Inverse, Boolean) = {
    val f = s.f
    val lRad = math.toRadians(normLonDiff(lon2 - lon1))
    val u1 = math.atan((1.0 - f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1.0 - f) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lam = lRad
    var sinSigma = 0.0
    var cosSigma = 0.0
    var sigma = 0.0
    var sinAlpha = 0.0
    var cos2Alpha = 1.0
    var cos2Sm = 0.0
    var it = 0
    val iters = if (fixedIterations > 0) fixedIterations else maxIter
    var done = false
    while (it < iters && !done) {
      val sinLam = math.sin(lam)
      val cosLam = math.cos(lam)
      val t1 = cosU2 * sinLam
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLam
      sinSigma = math.sqrt(t1 * t1 + t2 * t2)
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
      sigma = math.atan2(sinSigma, cosSigma)
      if (sinSigma == 0.0) return (Inverse(0.0, 0.0, 0.0), true) // coincident
      sinAlpha = cosU1 * cosU2 * sinLam / sinSigma
      cos2Alpha = 1.0 - sinAlpha * sinAlpha
      cos2Sm =
        if (cos2Alpha == 0.0) 0.0 // equatorial line
        else cosSigma - 2.0 * sinU1 * sinU2 / cos2Alpha
      val c = f / 16.0 * cos2Alpha * (4.0 + f * (4.0 - 3.0 * cos2Alpha))
      val lamPrev = lam
      lam = lRad + (1.0 - c) * f * sinAlpha *
        (sigma + c * sinSigma *
          (cos2Sm + c * cosSigma * (-1.0 + 2.0 * cos2Sm * cos2Sm)))
      it += 1
      if (fixedIterations == 0 && math.abs(lam - lamPrev) < 1e-12) done = true
    }
    val u2sq = cos2Alpha * (s.a * s.a - s.b * s.b) / (s.b * s.b)
    val aA = 1.0 + u2sq / 16384.0 *
      (4096.0 + u2sq * (-768.0 + u2sq * (320.0 - 175.0 * u2sq)))
    val bB = u2sq / 1024.0 *
      (256.0 + u2sq * (-128.0 + u2sq * (74.0 - 47.0 * u2sq)))
    val dSigma = bB * sinSigma * (cos2Sm + bB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2Sm * cos2Sm) -
        bB / 6.0 * cos2Sm * (-3.0 + 4.0 * sinSigma * sinSigma) *
          (-3.0 + 4.0 * cos2Sm * cos2Sm)))
    val dist = s.b * aA * (sigma - dSigma)
    val sinLam = math.sin(lam)
    val cosLam = math.cos(lam)
    val az1 = math.atan2(cosU2 * sinLam,
      cosU1 * sinU2 - sinU1 * cosU2 * cosLam)
    val az2 = math.atan2(cosU1 * sinLam,
      -sinU1 * cosU2 + cosU1 * sinU2 * cosLam)
    (Inverse(dist, math.toDegrees(az1), math.toDegrees(az2)),
      done || fixedIterations > 0)
  }

  /** Karney strategy: the SERIES inverse of Karney (2013), "Algorithms
    * for geodesics", J. Geodesy 87(1):43-55 (public), on the principal
    * branch — the auxiliary-sphere formulation with the published
    * ε-series for the I1 (distance) and I3 (longitude) integrals,
    * solved by bracketed bisection on the departure azimuth (λ12(α1) is
    * monotone on the canonical arrangement, paper §4). Inside the
    * narrow near-antipodal ambiguity region, where the shortest
    * geodesic leaves the principal branch (the paper resolves it with
    * the astroid construction), the bracket fails by construction and
    * the answer comes from [[shootingInverse]] — 2-D Newton shooting on
    * the exact geodesic ODEs (no series truncation) — with the
    * raised-cap Vincenty chain as the last resort.
    */
  def karney(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
             s: Spheroid = Spheroid.Wgs84): Inverse =
    karneySeries(lon1, lat1, lon2, lat2, s).getOrElse {
      shootingInverse(lon1, lat1, lon2, lat2, s).getOrElse {
        val (res, converged) = vincentyImpl(lon1, lat1, lon2, lat2, s, 200)
        if (converged) res
        else {
          val u1 = math.atan((1.0 - s.f) * math.tan(math.toRadians(lat1)))
          val u2 = math.atan((1.0 - s.f) * math.tan(math.toRadians(lat2)))
          val dlr = math.toRadians(math.abs(normLonDiff(lon2 - lon1)))
          val cosd = math.sin(u1) * math.sin(u2) +
            math.cos(u1) * math.cos(u2) * math.cos(dlr)
          val d = math.acos(math.max(-1.0, math.min(1.0, cosd)))
          val r = (2.0 * s.a + s.b) / 3.0
          val (a1, a2) = reducedAzimuths(lon1, lat1, lon2, lat2, s)
          Inverse(d * r, a1, a2)
        }
      }
    }

  /** Series inverse on the principal branch (Karney 2013; series
    * truncated at the order where WGS84 residuals are far below a
    * micrometre — ε ≈ n ≈ 1.7e-3, so dropped ε⁴⁺ terms of the I3 series
    * enter λ at ~1e-13 rad). Validated against the exact meridian-arc
    * quadrature, the equatorial closed form, and converged Vincenty
    * (see GeodesicsSpec). Returns None when the target longitude cannot
    * be bracketed on [tiny, π − tiny] — the near-antipodal region whose
    * shortest geodesic needs the astroid branch; callers fall back to
    * the exact-ODE shooting solver there.
    */
  private[core] def karneySeries(lon1: Double, lat1: Double, lon2: Double,
      lat2: Double, s: Spheroid): Option[Inverse] = {
    val f = s.f
    val n = f / (2.0 - f)
    val ep2 = s.e2 / (1.0 - s.e2)
    val tiny = 1e-14

    // ---- canonical arrangement: lam12 = |Δλ| ∈ [0, π], |φ1| ≥ |φ2|,
    // φ1 ≤ 0; azimuth signs restored at the end ----
    val lon12 = normLonDiff(lon2 - lon1)
    var lonSign = if (lon12 >= 0) 1.0 else -1.0
    val lam12 = math.toRadians(math.abs(lon12))
    var phi1 = lat1; var phi2 = lat2
    val swapP = math.abs(phi1) < math.abs(phi2)
    // swapping the endpoints negates the longitude difference, so the
    // mirror that made it positive flips with it (Karney 2013 §4)
    if (swapP) { val t = phi1; phi1 = phi2; phi2 = t; lonSign = -lonSign }
    val latSign = if (phi1 <= 0) 1.0 else -1.0
    phi1 *= latSign; phi2 *= latSign

    if (math.abs(phi1 - phi2) < 1e-13 && lam12 < 1e-13)
      return Some(Inverse(0.0, 0.0, 0.0))

    def sincosBeta(phi: Double): (Double, Double) = {
      val b = math.atan((1.0 - f) * math.tan(math.toRadians(phi)))
      // clamp cos β away from an exact 0 (GeographicLib's tiny*): the
      // pole algebra below (salp0/cb2, the /cb2 in calp2, the pole omg1
      // cancellation) relies on cosβ being tiny-but-nonzero, which today
      // is a floating-point artifact of toRadians(90) != pi/2; the clamp
      // makes the invariant explicit instead of inherited. No current
      // input is affected (cos(toRadians(±90)) ≈ 6.1e-17 >> 1.5e-154).
      (math.sin(b), math.max(math.cos(b), 1.49e-154))
    }
    val (sb1raw, cb1) = sincosBeta(phi1)
    val (sb2, cb2) = sincosBeta(phi2)
    // both points exactly on the equator: the σ parametrization is
    // degenerate (sinβ = 0 along the whole path), but the geodesic IS
    // the equator whenever λ12 ≤ (1−f)·π (Karney 2013 §4) — closed form
    if (sb1raw == 0.0 && sb2 == 0.0) {
      if (lam12 <= (1.0 - f) * math.Pi) {
        val sw = if (swapP) -1.0 else 1.0
        val az = math.toDegrees(math.atan2(sw * lonSign, 0.0))
        return Some(Inverse(s.a * lam12, az, az))
      } else return None // equator no longer shortest: astroid territory
    }
    // past this point sb1raw != 0: an exactly-equatorial phi1 forces an
    // exactly-equatorial phi2 on the canonical arrangement, which the
    // closed-form branch above always returns from
    val sb1 = sb1raw

    // ---- series coefficients (Karney 2013 expansions in ε) ----
    @inline def a1f(eps: Double): Double = {
      val e2 = eps * eps
      (1.0 + e2 * (1.0 / 4 + e2 * (1.0 / 64 + e2 / 256))) / (1.0 - eps)
    }
    def c1f(eps: Double): Array[Double] = {
      val e2 = eps * eps
      Array(
        eps * (-1.0 / 2 + e2 * (3.0 / 16 - e2 / 32)),
        e2 * (-1.0 / 16 + e2 * (1.0 / 32 - 9.0 * e2 / 2048)),
        e2 * eps * (-1.0 / 48 + e2 * 3.0 / 256),
        e2 * e2 * (-5.0 / 512 + e2 * 3.0 / 512),
        e2 * e2 * eps * (-7.0 / 1280),
        e2 * e2 * e2 * (-7.0 / 2048))
    }
    @inline def a3f(eps: Double): Double =
      1.0 + eps * ((-1.0 + n) / 2 +
        eps * ((-1.0 / 4 - n / 8 + 3.0 * n * n / 8) +
          eps * ((-1.0 / 16 - 3.0 * n / 16 - n * n / 16) +
            eps * (-3.0 / 64 - n / 32 + eps * (-3.0 / 128)))))
    def c3f(eps: Double): Array[Double] = {
      val e2 = eps * eps
      Array(
        eps * ((1.0 - n) / 4 +
          eps * ((1.0 / 8 - n * n / 8) +
            eps * ((3.0 + 3.0 * n - n * n) / 64 +
              eps * ((5.0 / 128 + n / 64) + eps * 3.0 / 128)))),
        e2 * ((1.0 / 16 - 3.0 * n / 32 + n * n / 32) +
          eps * ((3.0 / 64 - n / 32 - 3.0 * n * n / 64) +
            eps * ((3.0 / 128 + n / 128) + eps * 5.0 / 256))),
        e2 * eps * ((5.0 / 192 - 3.0 * n / 64 + 5.0 * n * n / 192) +
          eps * ((3.0 / 128 - 5.0 * n / 192) + eps * 7.0 / 512)),
        e2 * e2 * ((7.0 / 512 - 7.0 * n / 256) + eps * 7.0 / 512),
        e2 * e2 * eps * (21.0 / 2560))
    }
    @inline def sinSeries(c: Array[Double], sinSig: Double,
                          cosSig: Double): Double = {
      // Σ c(l−1)·sin(2lσ) by the double-angle recurrence
      val s2 = 2.0 * sinSig * cosSig          // sin 2σ
      val c2 = (cosSig - sinSig) * (cosSig + sinSig) // cos 2σ
      var sk = s2; var ck = c2
      var acc = 0.0
      var l = 0
      while (l < c.length) {
        acc += c(l) * sk
        val sn = sk * c2 + ck * s2
        ck = ck * c2 - sk * s2
        sk = sn
        l += 1
      }
      acc
    }

    // ---- λ12, s12 and end azimuth for a trial departure azimuth ----
    // (sα1 ≥ 0 on the canonical branch; cosα2 ≥ 0: first crossing of
    // latitude β2 — the shortest-geodesic configuration, paper §4)
    def eval(salp1: Double, calp1: Double)
        : (Double, Double, Double, Double) = {
      val salp0 = salp1 * cb1
      val calp0 = math.sqrt(math.max(0.0,
        1.0 - salp0 * salp0)) // cos α0 ≥ 0
      val ssig1 = sb1; val csig1 = cb1 * calp1
      val h1 = math.hypot(ssig1, csig1)
      val sig1 = math.atan2(ssig1, csig1)
      val omg1 = math.atan2(salp0 * ssig1, csig1)
      val salp2 = math.min(1.0, salp0 / cb2)
      val calp2 = math.sqrt(math.max(0.0,
        calp1 * calp1 * cb1 * cb1 + (cb2 * cb2 - cb1 * cb1))) / cb2
      val ssig2 = sb2; val csig2 = cb2 * calp2
      val h2 = math.hypot(ssig2, csig2)
      val sig2 = math.atan2(ssig2, csig2)
      val omg2 = math.atan2(salp0 * ssig2, csig2)
      val k2 = ep2 * calp0 * calp0
      val sq = math.sqrt(1.0 + k2)
      val eps = k2 / (2.0 * (1.0 + sq) + k2)
      val c1 = c1f(eps)
      val b1 = sinSeries(c1, ssig1 / h1, csig1 / h1)
      val b2 = sinSeries(c1, ssig2 / h2, csig2 / h2)
      val s12 = s.b * a1f(eps) * ((sig2 - sig1) + (b2 - b1))
      val c3 = c3f(eps)
      val i3 = a3f(eps) * ((sig2 - sig1) +
        (sinSeries(c3, ssig2 / h2, csig2 / h2) -
          sinSeries(c3, ssig1 / h1, csig1 / h1)))
      val lam = (omg2 - omg1) - f * salp0 * i3
      (lam, s12, salp2, calp2)
    }

    // meridional target: α1 = 0 solves it exactly (no bracket needed);
    // through-pole meridians (λ12 = π) are NOT on this branch -> None
    if (lam12 < 1e-12) {
      val (_, s12, _, _) = eval(0.0, 1.0)
      var (s1c, c1c) = (0.0, 1.0)
      var (s2c, c2c) = (0.0, 1.0)
      if (swapP) { val ts = s1c; val tc = c1c
        s1c = s2c; c1c = c2c; s2c = ts; c2c = tc }
      val sw = if (swapP) -1.0 else 1.0
      val az1 = math.atan2(s1c * sw * lonSign, c1c * sw * latSign)
      val az2 = math.atan2(s2c * sw * lonSign, c2c * sw * latSign)
      return Some(Inverse(s12, math.toDegrees(az1), math.toDegrees(az2)))
    }

    // bracketed root solve on α1 ∈ [tiny, π − tiny]: λ12(α1) is
    // monotone increasing on the canonical arrangement. Illinois
    // false position keeps the bisection's bracket guarantee but
    // converges superlinearly (~10 evals instead of 80 — this runs
    // per row as a geodesic strategy, so evals are the hot path);
    // any degenerate step falls back to the midpoint.
    var lastEval: (Double, Double, Double, Double) = null
    def g(alp1: Double): Double = {
      val e = eval(math.sin(alp1), math.cos(alp1))
      lastEval = e
      e._1 - lam12
    }
    val lo0 = 1e-12
    val hi0 = math.Pi - 1e-12
    val gLo = g(lo0)
    val gHi = g(hi0)
    if (!(gLo <= 0.0 && gHi >= 0.0)) return None // astroid region etc.
    var lo = lo0; var hi = hi0
    var gL = gLo; var gH = gHi
    var alp1 = 0.5 * (lo + hi)
    var side = 0 // +1: last kept hi side, -1: last kept lo side
    var it = 0
    var done = false
    while (it < 80 && !done) {
      val den = gH - gL
      var mid =
        if (den != 0.0) (lo * gH - hi * gL) / den else 0.5 * (lo + hi)
      if (!(mid > lo && mid < hi)) mid = 0.5 * (lo + hi)
      val gm = g(mid)
      alp1 = mid
      if (math.abs(gm) < 1e-15 || hi - lo < 1e-15) done = true
      else if (gm <= 0.0) {
        lo = mid; gL = gm
        if (side == -1) gH *= 0.5 // Illinois: de-stale the kept side
        side = -1
      } else {
        hi = mid; gH = gm
        if (side == 1) gL *= 0.5
        side = 1
      }
      it += 1
    }
    // alp1 is always the argument of the LAST g() call, so the solved
    // eval tuple is already in hand — no extra series evaluation
    val (lamF, s12, salp2, calp2) = lastEval
    // reject a pseudo-root at a jump (defensive; monotone case converges)
    if (math.abs(lamF - lam12) > 1e-9) return None
    var s1c = math.sin(alp1); var c1c = math.cos(alp1)
    var s2c = salp2; var c2c = calp2
    if (swapP) { val ts = s1c; val tc = c1c
      s1c = s2c; c1c = c2c; s2c = ts; c2c = tc }
    val sw = if (swapP) -1.0 else 1.0
    val az1 = math.atan2(s1c * sw * lonSign, c1c * sw * latSign)
    val az2 = math.atan2(s2c * sw * lonSign, c2c * sw * latSign)
    Some(Inverse(s12, math.toDegrees(az1), math.toDegrees(az2)))
  }

  /** Direct geodesic problem by RK4 integration of the exact Cartesian
    * geodesic ODE on the ellipsoid surface g = x^2/a^2 + y^2/a^2 +
    * z^2/b^2 = 1:
    *   r'' = -(S1/S2) (x/a^2, y/a^2, z/b^2),
    *   S1 = x'^2/a^2 + y'^2/a^2 + z'^2/b^2,
    *   S2 = (x/a^2)^2 + (y/a^2)^2 + (z/b^2)^2
    * (acceleration normal to the surface — pole-free, unlike the
    * (phi, lambda, alpha) form). Returns (lat2, lon2, alpha2) degrees
    * after arc length `dist`.
    */
  def direct(lon1: Double, lat1: Double, azimuthDeg: Double, dist: Double,
             s: Spheroid = Spheroid.Wgs84, steps: Int = 4096)
      : (Double, Double, Double) = {
    val a2 = s.a * s.a
    val b2 = s.b * s.b
    val lam = math.toRadians(lon1)
    val phi = math.toRadians(lat1)
    val alp = math.toRadians(azimuthDeg)
    val (x0, y0, z0) = Geodesy.llaToEcef(lon1, lat1, 0.0)
    // local geodetic east / north tangents
    val ex = -math.sin(lam); val ey = math.cos(lam); val ez = 0.0
    val nx = -math.sin(phi) * math.cos(lam)
    val ny = -math.sin(phi) * math.sin(lam)
    val nz = math.cos(phi)
    var px = x0; var py = y0; var pz = z0
    var vx = nx * math.cos(alp) + ex * math.sin(alp)
    var vy = ny * math.cos(alp) + ey * math.sin(alp)
    var vz = nz * math.cos(alp) + ez * math.sin(alp)
    val h = dist / steps
    @inline def acc(x: Double, y: Double, z: Double, ux: Double,
                    uy: Double, uz: Double): (Double, Double, Double) = {
      val s1 = ux * ux / a2 + uy * uy / a2 + uz * uz / b2
      val gx = x / a2; val gy = y / a2; val gz = z / b2
      val s2 = gx * gx + gy * gy + gz * gz
      val mu = -s1 / s2
      (mu * gx, mu * gy, mu * gz)
    }
    var i = 0
    while (i < steps) {
      val (a1x, a1y, a1z) = acc(px, py, pz, vx, vy, vz)
      val k2px = vx + h / 2 * a1x; val k2py = vy + h / 2 * a1y
      val k2pz = vz + h / 2 * a1z
      val (a2x, a2y, a2z) = acc(px + h / 2 * vx, py + h / 2 * vy,
        pz + h / 2 * vz, k2px, k2py, k2pz)
      val k3px = vx + h / 2 * a2x; val k3py = vy + h / 2 * a2y
      val k3pz = vz + h / 2 * a2z
      val (a3x, a3y, a3z) = acc(px + h / 2 * k2px, py + h / 2 * k2py,
        pz + h / 2 * k2pz, k3px, k3py, k3pz)
      val k4px = vx + h * a3x; val k4py = vy + h * a3y
      val k4pz = vz + h * a3z
      val (a4x, a4y, a4z) = acc(px + h * k3px, py + h * k3py,
        pz + h * k3pz, k4px, k4py, k4pz)
      px += h / 6 * (vx + 2 * k2px + 2 * k3px + k4px)
      py += h / 6 * (vy + 2 * k2py + 2 * k3py + k4py)
      pz += h / 6 * (vz + 2 * k2pz + 2 * k3pz + k4pz)
      vx += h / 6 * (a1x + 2 * a2x + 2 * a3x + a4x)
      vy += h / 6 * (a1y + 2 * a2y + 2 * a3y + a4y)
      vz += h / 6 * (a1z + 2 * a2z + 2 * a3z + a4z)
      // unit-speed renormalization (controls RK drift)
      val vn = math.sqrt(vx * vx + vy * vy + vz * vz)
      vx /= vn; vy /= vn; vz /= vn
      i += 1
    }
    val (lonE, latE, _) = Geodesy.ecefToLla(px, py, pz)
    val lamE = math.toRadians(lonE)
    val phiE = math.toRadians(latE)
    val e2x = -math.sin(lamE); val e2y = math.cos(lamE)
    val n2x = -math.sin(phiE) * math.cos(lamE)
    val n2y = -math.sin(phiE) * math.sin(lamE)
    val n2z = math.cos(phiE)
    val azEnd = math.atan2(vx * e2x + vy * e2y,
      vx * n2x + vy * n2y + vz * n2z)
    (latE, lonE, math.toDegrees(azEnd))
  }

  /** Inverse by 2-D Newton shooting over (alpha1, s) with the exact-ODE
    * direct solver — the no-series answer for the near-antipodal region.
    * Deterministic multi-start over departure azimuths; keeps the
    * shortest converged geodesic.
    */
  private[core] def shootingInverse(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double, s: Spheroid): Option[Inverse] = {
    val targetPhi = lat2
    def err(az: Double, dist: Double): (Double, Double, Double) = {
      val (p, l, a2) = direct(lon1, lat1, az, dist, s, steps = 2048)
      (p - targetPhi, normLonDiff(l - lon2), a2)
    }
    val d0 = math.Pi * s.b // initial arc guess: half meridian scale
    var best: Option[Inverse] = None
    for (az0 <- Seq(0.1, 30.0, 60.0, 90.0, 120.0, 150.0, 179.9,
        -30.0, -90.0, -150.0)) {
      var az = az0
      var dist = d0
      var converged = false
      var it = 0
      while (it < 30 && !converged) {
        val (ep, el, _) = err(az, dist)
        if (math.abs(ep) < 1e-9 && math.abs(el) < 1e-9) converged = true
        else {
          // numerical Jacobian
          val dAz = 1e-6
          val dS = 1.0
          val (ep1, el1, _) = err(az + dAz, dist)
          val (ep2, el2, _) = err(az, dist + dS)
          val j11 = (ep1 - ep) / dAz
          val j12 = (ep2 - ep) / dS
          val j21 = (el1 - el) / dAz
          val j22 = (el2 - el) / dS
          val det = j11 * j22 - j12 * j21
          if (det == 0.0 || det.isNaN) it = 30
          else {
            var stepAz = (-ep * j22 + el * j12) / det
            var stepS = (-el * j11 + ep * j21) / det
            // damp wild steps
            if (math.abs(stepAz) > 20.0) stepAz = math.signum(stepAz) * 20.0
            if (math.abs(stepS) > 2e6) stepS = math.signum(stepS) * 2e6
            az += stepAz
            dist += stepS
            if (dist < 1e6 || dist > 2.1e7 || dist.isNaN) it = 30
          }
        }
        it += 1
      }
      if (converged && best.forall(_.distance > dist)) {
        val (_, _, a2) = err(az, dist)
        best = Some(Inverse(dist, normLonDiff(az), a2))
      }
    }
    best
  }

  /** EXACT ellipsoidal area of the lon/lat-aligned rectangle
    * [lon0,lon1]x[lat0,lat1] (m^2): the standard closed form
    * A = a^2 (1-e^2)/2 * dLon * [q(lat1) - q(lat0)],
    * q(phi) = sin(phi)/(1-e^2 sin^2 phi)
    *        + (1/(2e)) ln((1+e sin phi)/(1-e sin phi)).
    */
  def rectangleArea(lon0: Double, lat0: Double, lon1: Double, lat1: Double,
                    s: Spheroid = Spheroid.Wgs84): Double = {
    val e = math.sqrt(s.e2)
    def q(latDeg: Double): Double = {
      val sp = math.sin(math.toRadians(latDeg))
      if (e < 1e-12) 2.0 * sp
      else sp / (1.0 - s.e2 * sp * sp) +
        math.log((1.0 + e * sp) / (1.0 - e * sp)) / (2.0 * e)
    }
    val dLon = math.toRadians(math.abs(lon1 - lon0))
    math.abs(s.a * s.a * (1.0 - s.e2) / 2.0 * dLon * (q(lat1) - q(lat0)))
  }

  /** Authalic latitude (series in e^2, milli-degree accurate). */
  def authalicLatitude(latDeg: Double, s: Spheroid): Double = {
    val e2 = s.e2
    val phi = math.toRadians(latDeg)
    val xi = phi - e2 / 3.0 * math.sin(2.0 * phi) * (1.0 +
      e2 * (31.0 / 60.0 + e2 * 59.0 / 105.0)) +
      e2 * e2 * (17.0 / 360.0 + e2 * 61.0 / 630.0) * math.sin(4.0 * phi) -
      e2 * e2 * e2 * 383.0 / 45360.0 * math.sin(6.0 * phi)
    xi
  }

  /** Spheroid polygon area (m^2): spherical-excess line integral on the
    * authalic sphere (Chamberlain & Duquette 2007 form), exact in the
    * small-edge limit — the regime of grid cells and geohash boxes.
    * `ring`: closed or open (lon, lat) sequence.
    */
  def polygonArea(ring: IndexedSeq[(Double, Double)],
                  s: Spheroid = Spheroid.Wgs84): Double = {
    val n0 = ring.length
    if (n0 < 3) return 0.0
    val closed = ring.head == ring.last
    val n = if (closed) n0 - 1 else n0
    if (n < 3) return 0.0
    var sum = 0.0
    var i = 0
    while (i < n) {
      val (lo1, la1) = ring(i)
      val (lo2, la2) = ring((i + 1) % n)
      val l1 = math.toRadians(lo1)
      val l2 = l1 + math.toRadians(normLonDiff(lo2 - lo1))
      val x1 = authalicLatitude(la1, s)
      val x2 = authalicLatitude(la2, s)
      sum += (l2 - l1) * (2.0 + math.sin(x1) + math.sin(x2))
      i += 1
    }
    val r = s.authalicRadius
    math.abs(sum * r * r / 2.0)
  }

  /** Geographic bilinear weights of a query point inside a lon/lat cell
    * (`bilinear_weights.hpp:87-146`): the four sub-rectangle areas around
    * the point, normalized by the cell area; each corner takes the area
    * of the OPPOSITE sub-rectangle. Returns (w00, w01, w11, w10).
    */
  def bilinearWeights(lon: Double, lat: Double, lon0: Double, lat0: Double,
                      lon1: Double, lat1: Double,
                      s: Spheroid = Spheroid.Wgs84)
      : (Double, Double, Double, Double) = {
    val total = rectangleArea(lon0, lat0, lon1, lat1, s)
    if (total == 0.0) return (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    val aA = rectangleArea(lon0, lat, lon, lat1, s) // upper-left
    val bA = rectangleArea(lon, lat, lon1, lat1, s) // upper-right
    val cA = rectangleArea(lon0, lat0, lon, lat, s) // lower-left
    val dA = rectangleArea(lon, lat0, lon1, lat, s) // lower-right
    (bA / total, dA / total, cA / total, aA / total)
  }
}
