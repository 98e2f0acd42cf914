package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeodesicsSpec extends AnyFunSuite {
  private val wgs = Spheroid.Wgs84

  test("vincenty meridian quarter and equator quarter match WGS84 anchors") {
    // quarter meridian (0,0)->(0,90): 10001965.729 m (WGS84 constant)
    val m = Geodesics.vincenty(0.0, 0.0, 0.0, 90.0, wgs)
    assert(math.abs(m.distance - 10001965.729) < 0.01, m.distance)
    // quarter equator (0,0)->(90,0): a * pi/2 (equator is a geodesic)
    val e = Geodesics.vincenty(0.0, 0.0, 90.0, 0.0, wgs)
    assert(math.abs(e.distance - wgs.a * math.Pi / 2.0) < 1e-4, e.distance)
  }

  test("strategies agree within their published error classes") {
    val pairs = for (i <- 0 until 200) yield {
      val lon1 = (i * 37 % 340) - 170.0
      val lat1 = (i * 13 % 160) / 2.0 - 40.0
      val lon2 = lon1 + (i * 7 % 120) + 1.0
      val lat2 = (i * 29 % 160) / 2.0 - 40.0
      (lon1, lat1, lon2, lat2)
    }
    for ((x1, y1, x2, y2) <- pairs) {
      val v = Geodesics.vincenty(x1, y1, x2, y2, wgs).distance
      val k = Geodesics.karney(x1, y1, x2, y2, wgs).distance
      val t = Geodesics.thomas(x1, y1, x2, y2, wgs).distance
      val a = Geodesics.andoyer(x1, y1, x2, y2, wgs).distance
      assert(math.abs(v - k) < 1e-3, s"karney $v $k at ($x1,$y1)-($x2,$y2)")
      assert(math.abs(v - t) < 1.0, s"thomas $v $t at ($x1,$y1)-($x2,$y2)")
      // Andoyer is first order in f: error O(f^2 * d) ~ 1.1e-5 relative
      assert(math.abs(v - a) < math.max(10.0, 2e-5 * v),
        s"andoyer $v $a at ($x1,$y1)-($x2,$y2)")
    }
  }

  test("inverse is symmetric and azimuths reverse") {
    val f = Geodesics.vincenty(2.35, 48.85, -74.0, 40.71, wgs) // Paris-NY
    val r = Geodesics.vincenty(-74.0, 40.71, 2.35, 48.85, wgs)
    assert(math.abs(f.distance - r.distance) < 1e-6)
    // Paris -> New York initial bearing is roughly west-northwest (~292)
    val az = (f.azimuth + 360.0) % 360.0
    assert(az > 280.0 && az < 300.0, az)
  }

  test("direct ODE integrator closes the loop with vincenty") {
    // forward-shoot along vincenty's azimuth for vincenty's distance:
    // must land on the target point (validates the Cartesian geodesic
    // ODE + RK4 against an independent solution)
    for ((x1, y1, x2, y2) <- Seq((2.35, 48.85, -74.0, 40.71),
        (10.0, -60.0, 150.0, 55.0), (0.0, 0.0, 0.0, 80.0))) {
      val inv = Geodesics.vincenty(x1, y1, x2, y2, wgs)
      val (latE, lonE, _) = Geodesics.direct(x1, y1, inv.azimuth,
        inv.distance, wgs)
      assert(math.abs(latE - y2) < 1e-6, s"lat $latE vs $y2")
      val dLon = math.abs((((lonE - x2) % 360) + 540) % 360 - 180)
      assert(dLon < 1e-6, s"lon $lonE vs $x2")
    }
  }

  test("karney solves the antipodal region exactly (polar geodesic)") {
    // exactly antipodal equatorial points: the geodesic runs over the
    // pole -> distance = 2 quarter-meridians = 20003931.4586 m (WGS84)
    val d = Geodesics.karney(0.0, 0.0, 180.0, 0.0, wgs).distance
    assert(math.abs(d - 20003931.4586) < 5.0, d)
    // near-antipodal: between the polar path and half the equator
    val d2 = Geodesics.karney(0.0, 0.0, 179.8, 0.1, wgs).distance
    assert(d2 > 1.995e7 && d2 < 2.0016e7, d2)
  }

  test("rectangle areas sum to the ellipsoid surface area") {
    // whole globe as two hemispheres (q is odd in lat)
    val total = Geodesics.rectangleArea(-180, -90, 180, 90, wgs)
    // WGS84 surface area: 5.100656e14 m^2
    assert(math.abs(total - 5.100656e14) / 5.100656e14 < 1e-5, total)
    // additivity: split in lon
    val a1 = Geodesics.rectangleArea(0, 10, 10, 20, wgs)
    val a2 = Geodesics.rectangleArea(10, 10, 20, 20, wgs)
    val a12 = Geodesics.rectangleArea(0, 10, 20, 20, wgs)
    assert(math.abs(a1 + a2 - a12) / a12 < 1e-12)
    // bands shrink toward the pole
    assert(Geodesics.rectangleArea(0, 60, 10, 70, wgs) <
      Geodesics.rectangleArea(0, 0, 10, 10, wgs))
  }

  test("polygon area of a lat/lon box matches the closed rectangle form") {
    val box = IndexedSeq((0.0, 0.0), (5.0, 0.0), (5.0, 4.0), (0.0, 4.0))
    val poly = Geodesics.polygonArea(box, wgs)
    val rect = Geodesics.rectangleArea(0, 0, 5, 4, wgs)
    assert(math.abs(poly - rect) / rect < 2e-3, s"$poly vs $rect")
  }

  test("geohash cell area uses the exact ellipsoidal rectangle form") {
    val prec = 20
    val h = GeoHash.encode(11.2, 47.8, prec)
    val (x0, y0, x1, y1) = GeoHash.boundingBox(h, prec)
    val a = graft.functions.Kernels.geohashArea(h, prec)
    assert(a === Geodesics.rectangleArea(x0, y0, x1, y1))
    // equator cells are larger than high-latitude cells of the same size
    val hEq = GeoHash.encode(11.2, 0.1, prec)
    assert(graft.functions.Kernels.geohashArea(hEq, prec) > a)
  }

  test("geohash transform: refine enumerates children, coarsen inverts") {
    val h = GeoHash.encode(11.2, 47.8, 20)
    val kids = GeoHash.transform(h, 20, 24)
    assert(kids.length === 16)
    // every child coarsens back to the parent and sits inside its bbox
    val (x0, y0, x1, y1) = GeoHash.boundingBox(h, 20)
    kids.foreach { c =>
      assert(GeoHash.transform(c, 24, 20).head === h)
      val (cx, cy) = GeoHash.centroid(c, 24)
      assert(cx >= x0 && cx <= x1 && cy >= y0 && cy <= y1)
    }
  }

  test("karney stays exact where Vincenty stalls (near-antipodal scan)") {
    // scan the band where the 200-cap Vincenty λ-iteration is still
    // moving: karney (series where the principal-branch bracket holds,
    // exact-ODE shooting past it) must agree with the independent
    // shooting solution to sub-millimetre — never the silently
    // non-converged Vincenty value (whose error there is metres)
    var nonConverged = 0
    val cases =
      (for (dlat <- Seq(0.5, 0.6, 0.8, 1.0, 1.5); dl <- Seq(179.6, 179.9, 180.0))
        yield (30.0, -30.0 + dlat, dl)) ++
      // equator-adjacent antipodes: Vincenty's λ-iteration stalls for
      // L > π(1-f) ≈ 179.4° even when |lat1+lat2| clears the 0.5 box
      (for (l2 <- Seq(0.51, 0.6, 0.8, 1.2, 2.0); dl <- Seq(179.7, 179.9, 180.0))
        yield (0.0, l2, dl))
    for ((lat1, lat2, dl) <- cases) {
      val (viaV, converged) =
        Geodesics.vincentyImpl(0.0, lat1, dl, lat2, wgs, 200)
      val k = Geodesics.karney(0.0, lat1, dl, lat2, wgs)
      if (!converged) {
        nonConverged += 1
        val sh = Geodesics.shootingInverse(0.0, lat1, dl, lat2, wgs)
        assert(sh.isDefined, s"shooting failed at lat2=$lat2 dl=$dl")
        assert(math.abs(k.distance - sh.get.distance) < 1e-3,
          s"karney disagrees with shooting at lat2=$lat2 dl=$dl: " +
            s"${k.distance} vs ${sh.get.distance}")
      } else {
        // series vs converged Vincenty: both are µm-accurate strategies,
        // agreement bound is their combined truncation error
        assert(math.abs(k.distance - viaV.distance) < 1e-4,
          s"karney vs vincenty at lat2=$lat2 dl=$dl")
      }
    }
    assert(nonConverged > 0,
      "fixture must include at least one non-converged Vincenty case")
  }

  test("karney series matches converged vincenty to micrometres incl. azimuths") {
    // deterministic global scatter across all quadrants and lengths;
    // where Vincenty converges both are exact-class strategies, so
    // distance must agree to ~µm and azimuths to ~1e-6 deg
    var checked = 0
    for (i <- 0 until 400) {
      val lon1 = ((i * 73) % 360) - 180.0 + 0.13
      val lat1 = ((i * 31) % 170) - 85.0 + 0.21
      val lon2 = ((i * 151) % 360) - 180.0 + 0.57
      val lat2 = ((i * 97) % 170) - 85.0 + 0.43
      val (v, converged) =
        Geodesics.vincentyImpl(lon1, lat1, lon2, lat2, wgs, 200)
      val ks = Geodesics.karneySeries(lon1, lat1, lon2, lat2, wgs)
      if (converged && ks.isDefined) {
        checked += 1
        val k = ks.get
        assert(math.abs(k.distance - v.distance) < 1e-4,
          s"dist ($lon1,$lat1)-($lon2,$lat2): ${k.distance} vs ${v.distance}")
        def angDiff(a: Double, b: Double): Double =
          math.abs((((a - b) % 360) + 540) % 360 - 180)
        assert(angDiff(k.azimuth, v.azimuth) < 1e-5,
          s"az1 ($lon1,$lat1)-($lon2,$lat2): ${k.azimuth} vs ${v.azimuth}")
        assert(angDiff(k.reverseAzimuth, v.reverseAzimuth) < 1e-5,
          s"az2 ($lon1,$lat1)-($lon2,$lat2): " +
            s"${k.reverseAzimuth} vs ${v.reverseAzimuth}")
      }
    }
    assert(checked > 300, s"fixture degenerate: only $checked comparable pairs")
  }

  test("karney series hits the closed-form anchors and declines the astroid region") {
    // quarter meridian (0,0)->(0,90): WGS84 constant to sub-µm
    val m = Geodesics.karneySeries(0.0, 0.0, 0.0, 90.0, wgs)
    assert(m.isDefined)
    assert(math.abs(m.get.distance - 10001965.7293) < 1e-4, m.get.distance)
    // quarter equator: the equator is the geodesic, s = a * pi/2
    val e = Geodesics.karneySeries(0.0, 0.0, 90.0, 0.0, wgs)
    assert(e.isDefined)
    assert(math.abs(e.get.distance - wgs.a * math.Pi / 2.0) < 1e-4,
      e.get.distance)
    assert(math.abs(e.get.azimuth - 90.0) < 1e-9, e.get.azimuth)
    // pole endpoints: the canonical arrangement puts the pole at phi1,
    // cos(beta) stays tiny-but-nonzero, and the branch remains exact —
    // including pole-to-pole (the full meridian)
    for ((x1, y1, x2, y2) <- Seq((10.0, 20.0, 50.0, 90.0),
        (0.0, -90.0, 0.0, 90.0), (30.0, -88.0, 150.0, 89.5))) {
      val (v, conv) = Geodesics.vincentyImpl(x1, y1, x2, y2, wgs, 200)
      val ks = Geodesics.karneySeries(x1, y1, x2, y2, wgs)
      assert(conv && ks.isDefined, s"pole case ($x1,$y1)-($x2,$y2)")
      assert(math.abs(ks.get.distance - v.distance) < 1e-4,
        s"pole case ($x1,$y1)-($x2,$y2): ${ks.get.distance} vs ${v.distance}")
    }
    // antipodal equatorial pair past (1-f)*pi: the equator is no longer
    // the shortest path and the principal branch cannot answer -> None
    // (callers go to the exact-ODE shooting solver)
    assert(Geodesics.karneySeries(0.0, 0.0, 180.0, 0.0, wgs).isEmpty)
    // in the near-antipodal band the contract is decline-or-exact: every
    // answer the series does give must match the independent shooting
    // solution to sub-millimetre (pseudo-roots at the λ jump are vetoed)
    var answered = 0; var declined = 0
    for (dl <- Seq(179.5, 179.7, 179.9, 180.0);
         lat2 <- Seq(0.0, 0.1, 0.5, 2.0)) {
      Geodesics.karneySeries(0.0, 0.0, dl, lat2, wgs) match {
        case Some(k) =>
          answered += 1
          val sh = Geodesics.shootingInverse(0.0, 0.0, dl, lat2, wgs)
          assert(sh.isDefined, s"shooting failed at dl=$dl lat2=$lat2")
          assert(math.abs(k.distance - sh.get.distance) < 1e-3,
            s"series pseudo-root at dl=$dl lat2=$lat2: " +
              s"${k.distance} vs ${sh.get.distance}")
        case None => declined += 1
      }
    }
    assert(answered > 0 && declined > 0,
      s"scan must exercise both branches: answered=$answered declined=$declined")
  }

  test("geographic bilinear weights sum to 1 and recover corners") {
    val (w00, w01, w11, w10) =
      Geodesics.bilinearWeights(12.3, 45.6, 12.0, 45.0, 13.0, 46.0, wgs)
    assert(math.abs(w00 + w01 + w11 + w10 - 1.0) < 1e-12)
    // at the exact lower-left corner all weight goes to p00
    val (c00, c01, c11, c10) =
      Geodesics.bilinearWeights(12.0, 45.0, 12.0, 45.0, 13.0, 46.0, wgs)
    assert(math.abs(c00 - 1.0) < 1e-12 && c01 < 1e-12 && c11 < 1e-12 &&
      c10 < 1e-12)
    // each corner is weighted by the OPPOSITE sub-rectangle's area; in a
    // northern-hemisphere cell the southern halves are larger, so at the
    // geometric midpoint the NORTH corners (w01, w11) outweigh
    val (m00, m01, m11, m10) =
      Geodesics.bilinearWeights(12.5, 45.5, 12.0, 45.0, 13.0, 46.0, wgs)
    assert(m01 > m00 && m11 > m10, s"$m00 $m01 $m11 $m10")
  }
}
