package graft.core

import org.scalatest.funsuite.AnyFunSuite

class OrbitEphemerisSpec extends AnyFunSuite {

  // inclined circular orbit nadir track with Earth rotation
  private val incl = math.toRadians(66.0)
  private val period = 6000.0
  private val earthRate = 360.0 / 86400.0

  private def nadir(t: Double): (Double, Double) = {
    val u = 2.0 * math.Pi * t / period
    val lat = math.toDegrees(math.asin(math.sin(incl) * math.sin(u)))
    val lon = math.toDegrees(math.atan2(
      math.cos(incl) * math.sin(u), math.cos(u))) - earthRate * t
    (((lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0, lat)
  }

  private def ephemeris(n: Int, dt: Double)
      : (Array[Double], Array[Double], Array[Double]) = {
    val t = Array.tabulate(n)(_ * dt)
    val pts = t.map(nadir)
    (pts.map(_._1), pts.map(_._2), t)
  }

  test("interpolateTrack stays on the analytic track") {
    // the reference's stretched-sphere rescale (`orbit.py:119-126`) is a
    // radial projection, NOT node-exact: it shifts geodetic latitude by
    // O(f) (~0.03 deg). Assert we track the analytic nadir within that
    // design tolerance, at nodes and at midpoints.
    val (lon, lat, t) = ephemeris(200, 30.0)
    val queries = Array.tabulate(380)(k => 150.0 + k * 15.0)
    val (li, bi) = OrbitEphemeris.interpolateTrack(lon, lat, t, queries,
      halfWindow = 8)
    for (k <- queries.indices) {
      val (elon, elat) = nadir(queries(k))
      val dLon = math.abs(((li(k) - elon + 540.0) % 360.0) - 180.0)
      assert(dLon < 0.1, s"lon k=$k ${li(k)} vs $elon")
      assert(math.abs(bi(k) - elat) < 0.1, s"lat k=$k ${bi(k)} vs $elat")
    }
  }

  test("calculateOrbit finds ~2 passes per revolution and sane x_al") {
    val (lon, lat, t) = ephemeris(1200, 10.0) // 2 revolutions
    val orbit = OrbitEphemeris.calculateOrbit(500000.0, lon, lat, t,
      alongTrackResolutionKm = 50.0, upsampleStep = 1e9 /* skip */)
    assert(orbit.passesPerCycle >= 3 && orbit.passesPerCycle <= 6,
      orbit.passesPerCycle)
    // along-track distance grows at ~50 km per sample
    val dx = orbit.xAl.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(dx.forall(d => math.abs(d - 50.0) < 1e-9))
    // track stays within the inclination band
    assert(orbit.latNadir.forall(l => math.abs(l) <= 66.5))
  }

  test("calculatePass slices half-orbits with an equator crossing") {
    val (lon, lat, t) = ephemeris(1200, 10.0)
    val orbit = OrbitEphemeris.calculateOrbit(500000.0, lon, lat, t,
      alongTrackResolutionKm = 25.0, upsampleStep = 1e9)
    val p = OrbitEphemeris.calculatePass(2, orbit)
    assert(p.isDefined)
    val pd = p.get
    assert(pd.lonNadir.length > 10)
    // a half-orbit sweeps from one latitude extreme to the other, so it
    // crosses the equator once
    assert(!pd.equatorLon.isNaN)
    assert(pd.equatorTime >= pd.time.head && pd.equatorTime <= pd.time.last)
    // latitude at the crossing time interpolates to ~0
    val i = pd.time.indexWhere(_ >= pd.equatorTime)
    assert(math.abs(pd.latNadir(math.max(0, i - 1))) < 25.0)
  }

  test("orbit model bookkeeping: durations, pass numbers, iterate") {
    val (lon, lat, t) = ephemeris(1200, 10.0)
    val orbit = OrbitEphemeris.calculateOrbit(500000.0, lon, lat, t,
      alongTrackResolutionKm = 50.0, upsampleStep = 1e9)
    val n = orbit.passesPerCycle
    // pass durations tile [passTime(0), time.last + dt] (reference
    // semantics: the last pass extends one sample step past the end)
    val dt = orbit.time(1) - orbit.time(0)
    val total = (1 to n).map(orbit.passDuration).sum
    assert(math.abs(total -
      (orbit.cycleDuration - orbit.passTime.head + dt)) < 1e-9, total)
    assert(orbit.orbitDuration === orbit.cycleDuration / (n / 2))
    // encode/decode round-trip across several cycles
    for (abs <- Seq(1, n, n + 1, 3 * n + 2)) {
      val (c, p) = orbit.decodeAbsolutePassNumber(abs)
      assert(orbit.encodeAbsolutePassNumber(c, p) === abs)
    }
    assert(orbit.deltaT > 0.0)
    // iterate over 2 full cycles yields 2n contiguous passes
    val passes = orbit.iterate(0.0, 2.0 * orbit.cycleDuration).toSeq
    assert(passes === (1 to 2 * n).toSeq, passes)
    // every pass yielded for a narrow window genuinely overlaps it
    // (cycle 1's final pass legitimately spills past the cycle boundary,
    // so a window just after cd can still see it)
    val w0 = orbit.cycleDuration + 1.0
    val w1 = orbit.cycleDuration + 2.0
    val inner = orbit.iterate(w0, w1).toSeq
    assert(inner.nonEmpty)
    inner.foreach { a =>
      val (c, p) = orbit.decodeAbsolutePassNumber(a)
      val start = (c - 1) * orbit.cycleDuration + orbit.passTime(p - 1)
      val end = start + orbit.passDuration(p)
      assert(end > w0 && start < w1, s"abs=$a [$start,$end)")
    }
    // iterateFrom: the reference's sequential-accumulation contract —
    // consecutive start dates differ by exactly the yielded pass duration
    val seq = orbit.iterateFrom(100.0, 100.0 + 2.5 * orbit.cycleDuration,
      absolutePassNumber = 3).toSeq
    assert(seq.nonEmpty && seq.head == ((1, 3, 100.0)))
    seq.sliding(2).foreach {
      case Seq((c1, p1, d1), (c2, p2, d2)) =>
        assert(orbit.encodeAbsolutePassNumber(c2, p2) ===
          orbit.encodeAbsolutePassNumber(c1, p1) + 1)
        assert(math.abs(d2 - (d1 + orbit.passDuration(p1))) < 1e-9)
      case _ =>
    }
    assert(seq.last._3 <= 100.0 + 2.5 * orbit.cycleDuration)
  }

  test("swath pixels sit at the prescribed across-track distances") {
    val (lon, lat, t) = ephemeris(1200, 10.0)
    val orbit = OrbitEphemeris.calculateOrbit(500000.0, lon, lat, t,
      alongTrackResolutionKm = 100.0, upsampleStep = 1e9)
    val pd = (1 to orbit.passesPerCycle).iterator
      .flatMap(p => OrbitEphemeris.calculatePass(p, orbit)).next()
    val (slon, slat, xAc) = OrbitEphemeris.calculateSwath(pd,
      acrossTrackResolutionKm = 10.0, halfSwathKm = 60.0, halfGapKm = 10.0)
    assert(xAc.length === 12) // 2 * ((60-10)/10 + 1)
    // geodesic distance nadir -> pixel must match |x_ac| within 0.5%
    for (i <- 2 until slon.length - 2 by 3; j <- xAc.indices) {
      val d = Geodesics.vincenty(pd.lonNadir(i), pd.latNadir(i),
        slon(i)(j), slat(i)(j)).distance
      assert(math.abs(d - math.abs(xAc(j))) / math.abs(xAc(j)) < 5e-3,
        s"i=$i j=$j d=$d xac=${xAc(j)}")
    }
    // east and west pixels land on opposite sides (different longitudes)
    val mid = xAc.length / 2
    for (i <- 2 until slon.length - 2 by 7) {
      val dWest = math.abs(slon(i)(0) - pd.lonNadir(i)) +
        math.abs(slat(i)(0) - pd.latNadir(i))
      assert(dWest > 1e-4)
      assert(math.abs(slon(i)(mid - 1) - slon(i)(mid)) > 1e-6 ||
        math.abs(slat(i)(mid - 1) - slat(i)(mid)) > 1e-6)
    }
  }
}
