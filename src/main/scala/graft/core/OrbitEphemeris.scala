package graft.core

import scala.collection.mutable.ArrayBuffer

/** Ephemeris → Orbit → Pass → Swath pipeline — the engine's analog of the
  * reference orbit module (`/root/reference/pyinterp/orbit.py:48-848`,
  * swath kernel `geometry/satellite/transforms/swath.hpp:35-78`, rotation
  * `geometry/satellite/rotation.hpp`):
  *
  *  - [[interpolateTrack]]: windowed-cspline track interpolation done in
  *    ECEF with the geocentric-radius correction (`orbit.py:48-130`);
  *  - [[calculateOrbit]]: normalize lon, upsample coarse ephemerides,
  *    clip to one cycle, rearrange to start at pass 1 (first southernmost
  *    passage), resample to a fixed along-track step, and derive the
  *    per-pass start times (`orbit.py:602-718`);
  *  - [[calculatePass]]: slice one half-orbit + its equator crossing
  *    (longitude + time at latitude 0, `orbit.py:524-599,721-783`);
  *  - [[calculateSwath]]: across-track pixel expansion by Rodrigues
  *    rotation of the nadir ECEF vector about the flight direction
  *    (`swath.hpp:35-78`).
  *
  * The Orbit model is one satellite repeat cycle — driver-scale metadata
  * (10^4-10^5 points); the DISTRIBUTED axes are passes x pixels (see
  * `operators.OrbitOps.swathPoints`).
  */
object OrbitEphemeris {

  final case class OrbitModel(
      height: Double,
      lonNadir: Array[Double],
      latNadir: Array[Double],
      passTime: Array[Double], // sorted start time of each half-orbit (s)
      time: Array[Double],     // seconds since cycle start
      xAl: Array[Double])      // along-track distance (km)
      extends Serializable {
    def passesPerCycle: Int = passTime.length

    /** Cycle duration = last sample time (`orbit.py:237-239`). */
    def cycleDuration: Double = time.last

    /** One orbital revolution (`orbit.py:251-263`: cycle / (n div 2)). */
    def orbitDuration: Double = cycleDuration / (passesPerCycle / 2)

    /** Duration of 1-based pass `number` (`orbit.py:282-305`; the last
      * pass extends one sample step past the final time).
      */
    def passDuration(number: Int): Double = {
      require(number >= 1 && number <= passesPerCycle, s"pass $number")
      if (number == passesPerCycle)
        time.last - passTime.last +
          (if (time.length > 1) time(1) - time(0) else 0.0)
      else passTime(number) - passTime(number - 1)
    }

    /** (cycle, pass) of a 1-based absolute pass number
      * (`orbit.py:306-327`).
      */
    def decodeAbsolutePassNumber(number: Int): (Int, Int) = {
      val n0 = number - 1
      (n0 / passesPerCycle + 1, n0 % passesPerCycle + 1)
    }

    /** Absolute pass number of (cycle, pass) (`orbit.py:328-345`). */
    def encodeAbsolutePassNumber(cycle: Int, pass: Int): Int = {
      require(pass >= 1 && pass <= passesPerCycle, s"pass $pass")
      (cycle - 1) * passesPerCycle + pass
    }

    /** Mean measurement spacing in seconds (`orbit.py:346-358`). */
    def deltaT: Double =
      if (time.length < 2) 0.0
      else (time.last - time.head) / (time.length - 1)

    /** The reference's `Orbit.iterate` contract (`orbit.py:359-399`):
      * start at `firstDate` on `absolutePassNumber`, yield
      * (cycle, pass, startDate) and advance by each pass's own duration —
      * sequential accumulation, so windows never drift from the catalog's
      * per-pass durations.
      */
    def iterateFrom(firstDate: Double, lastDate: Double,
                    absolutePassNumber: Int = 1)
        : Iterator[(Int, Int, Double)] =
      Iterator.iterate((absolutePassNumber, firstDate)) { case (apn, date) =>
        val (_, pass) = decodeAbsolutePassNumber(apn)
        (apn + 1, date + passDuration(pass))
      }.takeWhile(_._2 <= lastDate).map { case (apn, date) =>
        val (cycle, pass) = decodeAbsolutePassNumber(apn)
        (cycle, pass, date)
      }

    /** Absolute pass numbers of every half-orbit intersecting
      * [first, last) in absolute seconds — an overlap-window QUERY face,
      * not the reference's sequential generator ([[iterateFrom]] is that).
      * Pass p of cycle c is positioned at (c-1)·cycleDuration +
      * passTime(p-1); because per-cycle pass durations sum to
      * cycleDuration − passTime.head + deltaT, these catalog-anchored
      * windows can differ from sequential accumulation by ~deltaT per
      * cycle — catalog positioning is authoritative here.
      */
    def iterate(first: Double, last: Double): Iterator[Int] = {
      val cd = cycleDuration
      // start one cycle early: a cycle's last pass can end after its
      // nominal [.., c*cd) window
      val c0 = math.max(1, (first / cd).toInt)
      Iterator.from(c0).takeWhile(c => (c - 1) * cd < last).flatMap { c =>
        (1 to passesPerCycle).iterator
          .map(p => (c, p))
          .filter { case (cc, p) =>
            val start = (cc - 1) * cd + passTime(p - 1)
            val end = start + passDuration(p)
            end > first && start < last
          }
          .map { case (cc, p) => encodeAbsolutePassNumber(cc, p) }
      }
    }
  }

  final case class PassData(
      passNumber: Int,
      lonNadir: Array[Double],
      latNadir: Array[Double],
      time: Array[Double],
      xAl: Array[Double],
      equatorLon: Double,
      equatorTime: Double)

  private val MinPoints = 2

  @inline private def normLon(l: Double): Double =
    ((l + 180.0) % 360.0 + 360.0) % 360.0 - 180.0

  /** Windowed natural-cubic-spline interpolation of a 1-D series with
    * shrink boundary (the reference's windowed univariate with
    * half_window_size).
    */
  private def windowedSpline(xp: Array[Double], yp: Array[Double],
                             xi: Array[Double], hw: Int): Array[Double] = {
    val out = new Array[Double](xi.length)
    val sp = new CSplineInterp(Univariate1D.NaturalBC)
    var cachedLo = -1
    var cachedHi = -1
    var cachedFit = false
    var k = 0
    while (k < xi.length) {
      val x = xi(k)
      var i = Univariate1D.bracket(xp, x)
      val lo = math.max(0, i - hw + 1)
      val hi = math.min(xp.length, i + hw + 1)
      var fitted = true
      if (lo != cachedLo || hi != cachedHi) {
        fitted = sp.fit(java.util.Arrays.copyOfRange(xp, lo, hi),
          java.util.Arrays.copyOfRange(yp, lo, hi))
        cachedLo = lo
        cachedHi = hi
      } else fitted = cachedFit
      cachedFit = fitted
      out(k) =
        if (fitted) sp.value(x)
        else linInterp(x, xp, yp) // window too small: linear fallback
      k += 1
    }
    out
  }

  /** ECEF windowed-spline track interpolation (`orbit.py:48-130`):
    * interpolate x/y/z and the stretched radius r = |(x, y, z*mz)|, then
    * rescale so the point sits back on the (stretched) sphere.
    */
  def interpolateTrack(lon: Array[Double], lat: Array[Double],
                       xp: Array[Double], xi: Array[Double],
                       height: Double = 0.0, halfWindow: Int = 3,
                       spheroid: Spheroid = Spheroid.Wgs84)
      : (Array[Double], Array[Double]) = {
    val n = lon.length
    val mz = spheroid.a / spheroid.b
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    val zs = new Array[Double](n)
    val rs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val (x, y, z) = Geodesy.llaToEcef(lon(i), lat(i), height)
      xs(i) = x; ys(i) = y; zs(i) = z
      rs(i) = math.sqrt(x * x + y * y + z * z * mz * mz)
      i += 1
    }
    val x0 = xp(0)
    val xps = xp.map(_ - x0)
    val xis = xi.map(_ - x0)
    val xq = windowedSpline(xps, xs, xis, halfWindow)
    val yq = windowedSpline(xps, ys, xis, halfWindow)
    val zq = windowedSpline(xps, zs, xis, halfWindow)
    val rq = windowedSpline(xps, rs, xis, halfWindow)
    val lonOut = new Array[Double](xi.length)
    val latOut = new Array[Double](xi.length)
    i = 0
    while (i < xi.length) {
      val norm = math.sqrt(xq(i) * xq(i) + yq(i) * yq(i) + zq(i) * zq(i))
      val scale = rq(i) / norm
      val x = xq(i) * scale
      val y = yq(i) * scale
      val z = zq(i) * scale / mz
      val (lo, la, _) = Geodesy.ecefToLla(x, y, z)
      lonOut(i) = lo
      latOut(i) = la
      i += 1
    }
    (lonOut, latOut)
  }

  /** Pass-boundary indexes: where dlat (vs previous point, wrapped) flips
    * sign (`orbit.py:178-202`).
    */
  private def passBoundaryIdx(lat: Array[Double]): Array[Int] = {
    val n = lat.length
    val dy = Array.tabulate(n)(i => lat((i - 1 + n) % n) - lat(i))
    val idx = ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      val prev = dy((i - 1 + n) % n)
      if ((dy(i) < 0 && prev >= 0) || (dy(i) > 0 && prev <= 0)) idx += i
      i += 1
    }
    idx.toArray
  }

  /** Rearrange to start at pass 1 = first southernmost passage
    * (`orbit.py:133-176`).
    */
  private def rearrange(cycleDuration: Double, lon: Array[Double],
                        lat: Array[Double], time: Array[Double])
      : (Array[Double], Array[Double], Array[Double]) = {
    val n = lat.length
    val dy = Array.tabulate(n)(i => lat((i - 1 + n) % n) - lat(i))
    val idx = (0 until n).filter(i =>
      dy(i) < 0 && dy((i - 1 + n) % n) >= 0)
    if (idx.isEmpty) return (lon, lat, time)
    if (idx.head < idx.sum.toDouble / idx.length) return (lon, lat, time)
    val shift = idx.last
    def roll(a: Array[Double]) = a.drop(shift) ++ a.take(shift)
    val t2 = roll(time)
    val t0 = t2(0)
    (roll(lon), roll(lat),
      t2.map(t => (((t - t0) % cycleDuration) + cycleDuration) %
        cycleDuration))
  }

  /** Thomas-strategy cumulative curvilinear distance (m). */
  def curvilinearDistance(lon: Array[Double], lat: Array[Double],
                          spheroid: Spheroid = Spheroid.Wgs84)
      : Array[Double] = {
    val out = new Array[Double](lon.length)
    var i = 1
    while (i < lon.length) {
      out(i) = out(i - 1) + Geodesics.thomas(lon(i - 1), lat(i - 1),
        lon(i), lat(i), spheroid).distance
      i += 1
    }
    out
  }

  private def linInterp(x: Double, xs: Array[Double],
                        ys: Array[Double]): Double = {
    if (x <= xs(0)) return ys(0)
    if (x >= xs(xs.length - 1)) return ys(ys.length - 1)
    val i = Univariate1D.bracket(xs, x)
    val t = (x - xs(i)) / (xs(i + 1) - xs(i))
    ys(i) + t * (ys(i + 1) - ys(i))
  }

  /** Build the orbit model (`orbit.py:602-718`). `time` in seconds from
    * the ephemeris start; `upsampleStep`/`alongTrackResolutionKm` mirror
    * the 500 ms / 2 km reference defaults.
    */
  def calculateOrbit(height: Double, lonNadir0: Array[Double],
                     latNadir0: Array[Double], time0: Array[Double],
                     cycleDuration: Double = Double.NaN,
                     alongTrackResolutionKm: Double = 2.0,
                     upsampleStep: Double = 0.5,
                     spheroid: Spheroid = Spheroid.Wgs84): OrbitModel = {
    var lon = lonNadir0
    var lat = latNadir0
    var time = time0
    // skew a first pass that starts on the equator (`orbit.py:630-643`):
    // drop everything before the SECOND pass boundary
    if (math.abs(lat(0)) <= 40.0) {
      val idx = passBoundaryIdx(lat)
      if (idx.length > 1) {
        val from = idx(1)
        lon = lon.drop(from)
        lat = lat.drop(from)
        time = time.drop(from)
      }
    }
    lon = lon.map(normLon)
    // upsample coarse ephemerides to ~upsampleStep seconds
    val meanDt = (time.last - time.head) / (time.length - 1)
    if (meanDt > upsampleStep) {
      val hr = ArrayBuffer.empty[Double]
      var t = time.head
      while (t < time.last) { hr += t; t += upsampleStep }
      val (l2, b2) = interpolateTrack(lon, lat, time, hr.toArray, height,
        halfWindow = 50, spheroid = spheroid)
      lon = l2; lat = b2; time = hr.toArray
    }
    if (!cycleDuration.isNaN) {
      val keep = time.indices.filter(i => time(i) < cycleDuration)
      lon = keep.map(lon).toArray
      lat = keep.map(lat).toArray
      time = keep.map(time).toArray
    }
    val cycle = time.last + (time(1) - time(0))
    val (l3, b3, t3) = rearrange(cycle, lon, lat, time)
    val distKm = curvilinearDistance(l3, b3, spheroid).map(_ * 1e-3)
    // resample at the along-track resolution
    val xAl = ArrayBuffer.empty[Double]
    var x = distKm(0)
    while (x < distKm(distKm.length - 2)) {
      xAl += x
      x += alongTrackResolutionKm
    }
    val (l4, b4) = interpolateTrack(l3.dropRight(1), b3.dropRight(1),
      distKm.dropRight(1), xAl.toArray, height, halfWindow = 10,
      spheroid = spheroid)
    val t4 = xAl.map(v => linInterp(v, distKm.dropRight(1),
      t3.dropRight(1))).toArray
    val passTimes = {
      val idx = passBoundaryIdx(b4)
      val withFirst = if (idx.nonEmpty) { idx(0) = 0; idx } else Array(0)
      withFirst.map(t4).sorted
    }
    OrbitModel(height, l4, b4, passTimes, t4, xAl.toArray)
  }

  /** Slice pass `passNumber` (1-based) out of the orbit + its equator
    * crossing (`orbit.py:721-783`).
    */
  def calculatePass(passNumber: Int, orbit: OrbitModel,
                    spheroid: Spheroid = Spheroid.Wgs84): Option[PassData] = {
    val index = passNumber - 1
    val t = orbit.time
    val sel =
      if (index == orbit.passTime.length - 1)
        t.indices.filter(i => t(i) >= orbit.passTime(index))
      else
        t.indices.filter(i => t(i) >= orbit.passTime(index) &&
          t(i) < orbit.passTime(index + 1))
    if (sel.length < MinPoints) return None
    val lon = sel.map(orbit.lonNadir).toArray
    val lat = sel.map(orbit.latNadir).toArray
    val time = sel.map(orbit.time).toArray
    val xAl = sel.map(orbit.xAl).toArray
    val (eqLon, eqTime) = equatorProperties(lon, lat, time, spheroid)
    Some(PassData(passNumber, lon, lat, time, xAl, eqLon, eqTime))
  }

  /** Equator crossing (`orbit.py:524-599`): bracket the minimum |lat|,
    * intersect the segment with the equator, time by Thomas-distance
    * interpolation.
    */
  private[core] def equatorProperties(lon: Array[Double], lat: Array[Double],
                                      time: Array[Double], spheroid: Spheroid)
      : (Double, Double) = {
    if (lon.length < MinPoints) return (Double.NaN, Double.NaN)
    var i1 = 0
    var best = Double.MaxValue
    var k = 0
    while (k < lat.length) {
      val a = math.abs(lat(k))
      if (a < best) { best = a; i1 = k }
      k += 1
    }
    var i0 = if (i1 > 0) i1 - 1 else 1
    if (lat(math.min(i0, i1)) * lat(math.max(i0, i1)) > 0) {
      val p = if (i1 < lat.length - 1) (i1, i1 + 1) else (i1 - 1, i1)
      i0 = p._1; i1 = p._2
    } else if (i0 > i1) { val t = i0; i0 = i1; i1 = t }
    // unwrap lon(i1) relative to lon(i0) before the planar intersection: a
    // pass crossing the equator near ±180 would otherwise be a ~360°-wide
    // planar segment with a spurious crossing near lon 0 (the geographic
    // intersection the reference uses is wrap-aware)
    val lon1u = lon(i1) -
      360.0 * math.round((lon(i1) - lon(i0)) / 360.0).toDouble
    val hit = graft.operators.Crossover.segmentIntersection(
      lon(i0), lat(i0), lon1u, lat(i1),
      lon(i0) - 0.5, 0.0, lon1u + 0.5, 0.0)
    hit match {
      case None => (Double.NaN, Double.NaN)
      case Some((eqLonRaw, _)) =>
        // normalize the unwrapped-frame crossing back into [-180, 180)
        val eqLon = eqLonRaw - 360.0 * math.floor((eqLonRaw + 180.0) / 360.0)
        val lons = Array(lon(i0), eqLonRaw, lon1u)
        val lats = Array(lat(i0), 0.0, lat(i1))
        val xal = curvilinearDistance(lons, lats, spheroid)
        val xEq = xal(1)
        val eqTime = linInterp(xEq, Array(xal(0), xal(2)),
          Array(time(i0), time(i1)))
        (eqLon, eqTime)
    }
  }

  /** Geocentric radius at latitude (deg). */
  def geocentricRadius(latDeg: Double, s: Spheroid = Spheroid.Wgs84): Double = {
    val phi = math.toRadians(latDeg)
    val a2c = s.a * s.a * math.cos(phi)
    val b2s = s.b * s.b * math.sin(phi)
    val ac = s.a * math.cos(phi)
    val bs = s.b * math.sin(phi)
    math.sqrt((a2c * a2c + b2s * b2s) / (ac * ac + bs * bs))
  }

  /** Flight-direction unit vectors from central differences of the ECEF
    * track (`rotation.hpp:9-30`).
    */
  def satelliteDirection(loc: Array[Array[Double]]): Array[Array[Double]] = {
    val n = loc.length
    val out = Array.ofDim[Double](n, 3)
    var i = 1
    while (i < n - 1) {
      val dx = loc(i + 1)(0) - loc(i - 1)(0)
      val dy = loc(i + 1)(1) - loc(i - 1)(1)
      val dz = loc(i + 1)(2) - loc(i - 1)(2)
      val norm = math.sqrt(dx * dx + dy * dy + dz * dz)
      out(i)(0) = dx / norm; out(i)(1) = dy / norm; out(i)(2) = dz / norm
      i += 1
    }
    if (n > 1) { out(0) = out(1).clone(); out(n - 1) = out(n - 2).clone() }
    out
  }

  /** Rodrigues rotation of `v` by angle theta about the NEGATED unit
    * axis (Eigen AngleAxis(theta, -axis) in `rotation.hpp:32-38`).
    */
  def rotate(v: Array[Double], axis: Array[Double], theta: Double)
      : Array[Double] = {
    val ax = -axis(0); val ay = -axis(1); val az = -axis(2)
    val c = math.cos(theta)
    val s = math.sin(theta)
    val dot = ax * v(0) + ay * v(1) + az * v(2)
    val crx = ay * v(2) - az * v(1)
    val cry = az * v(0) - ax * v(2)
    val crz = ax * v(1) - ay * v(0)
    Array(
      v(0) * c + crx * s + ax * dot * (1 - c),
      v(1) * c + cry * s + ay * dot * (1 - c),
      v(2) * c + crz * s + az * dot * (1 - c))
  }

  /** Across-track swath expansion for one pass (`swath.hpp:35-78`):
    * for each nadir point, rotate its ECEF vector about the flight
    * direction by ±(halfGap + j*acrossRes)/R. Returns (lon, lat) of shape
    * (nPoints, 2*halfSwathPixels), pixel columns west→east like the
    * reference ordering, plus the x_ac row (m).
    */
  def calculateSwath(pass: PassData, acrossTrackResolutionKm: Double = 2.0,
                     halfSwathKm: Double = 70.0, halfGapKm: Double = 2.0,
                     spheroid: Spheroid = Spheroid.Wgs84)
      : (Array[Array[Double]], Array[Array[Double]], Array[Double]) = {
    val halfPixels =
      ((halfSwathKm - halfGapKm) / acrossTrackResolutionKm).toInt + 1
    val deltaAc = acrossTrackResolutionKm * 1e3
    val halfGap = halfGapKm * 1e3
    val n = pass.lonNadir.length
    val loc = Array.tabulate(n) { i =>
      val (x, y, z) = Geodesy.llaToEcef(pass.lonNadir(i), pass.latNadir(i),
        0.0)
      Array(x, y, z)
    }
    val dir = satelliteDirection(loc)
    val lon = Array.ofDim[Double](n, 2 * halfPixels)
    val lat = Array.ofDim[Double](n, 2 * halfPixels)
    var i = 0
    while (i < n) {
      val radius = geocentricRadius(pass.latNadir(i), spheroid)
      var j = 0
      while (j < halfPixels) {
        val theta = -(j * deltaAc + halfGap) / radius
        val p = rotate(loc(i), dir(i), theta)
        val (lo1, la1, _) = Geodesy.ecefToLla(p(0), p(1), p(2))
        lon(i)(halfPixels + j) = lo1
        lat(i)(halfPixels + j) = la1
        val q = rotate(loc(i), dir(i), -theta)
        val (lo2, la2, _) = Geodesy.ecefToLla(q(0), q(1), q(2))
        lon(i)(halfPixels - j - 1) = lo2
        lat(i)(halfPixels - j - 1) = la2
        j += 1
      }
      i += 1
    }
    val xAc = new Array[Double](2 * halfPixels)
    var j = 0
    while (j < halfPixels) {
      val d = j * deltaAc + halfGap
      xAc(halfPixels + j) = d
      xAc(halfPixels - j - 1) = -d
      j += 1
    }
    (lon, lat, xAc)
  }
}
