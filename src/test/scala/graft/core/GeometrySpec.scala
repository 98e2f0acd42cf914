package graft.core

import org.scalatest.funsuite.AnyFunSuite
import GeometryAlgorithms._

class GeometryAlgorithmsSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double)
      : IndexedSeq[(Double, Double)] =
    IndexedSeq((x0, y0), (x1, y0), (x1, y1), (x0, y1))

  test("convex hull drops interior and collinear points") {
    val pts = IndexedSeq((0.0, 0.0), (9.0, 0.0), (9.0, 9.0), (0.0, 9.0),
      (4.0, 5.0), (1.0, 1.0), (4.5, 0.0) /* collinear on bottom edge */)
    val hull = convexHull(pts)
    assert(hull.toSet === Set((0.0, 0.0), (9.0, 0.0), (9.0, 9.0),
      (0.0, 9.0)))
    assert(math.abs(math.abs(signedArea(hull)) - 81.0) < 1e-12)
  }

  test("douglas-peucker keeps shape points above tolerance") {
    val line = IndexedSeq((0.0, 0.0), (1.0, 0.1), (2.0, -0.1), (3.0, 0.05),
      (4.0, 0.0))
    // all deviations < 0.5 -> collapses to the endpoints
    assert(simplify(line, 0.5) === IndexedSeq((0.0, 0.0), (4.0, 0.0)))
    // tolerance below the noise keeps everything
    assert(simplify(line, 0.01) === line)
    // a real corner survives any sub-corner tolerance
    val corner = IndexedSeq((0.0, 0.0), (2.0, 2.0), (4.0, 0.0))
    assert(simplify(corner, 1.0) === corner)
  }

  test("densify subdivides long segments; length preserved (planar)") {
    val line = IndexedSeq((0.0, 0.0), (10.0, 0.0))
    val d = densify(line, 3.0)
    assert(d.length === 5) // 4 subsegments of 2.5
    assert(math.abs(length(d) - 10.0) < 1e-12)
  }

  test("line_interpolate walks fractional length across vertices") {
    val line = IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0))
    assert(lineInterpolate(line, 0.25) === ((2.0, 0.0)))
    assert(lineInterpolate(line, 0.75) === ((4.0, 2.0)))
    // geodetic slerp stays on the segment for equatorial lines
    val eq = IndexedSeq((0.0, 0.0), (10.0, 0.0))
    val mid = lineInterpolate(eq, 0.5, geodetic = true)
    assert(math.abs(mid._1 - 5.0) < 1e-9 && math.abs(mid._2) < 1e-12)
  }

  test("closest points between disjoint rings") {
    val a = rect(0, 0, 2, 2)
    val b = rect(5, 1, 7, 3)
    val (pa, pb, d) = closestPoints(a :+ a.head, b :+ b.head)
    assert(math.abs(d - 3.0) < 1e-12)
    assert(pa === ((2.0, 1.0)) || pa === ((2.0, 2.0)))
    assert(pb._1 === 5.0)
  }

  test("predicates on rectangles match interval logic") {
    val a = rect(0, 0, 4, 4)
    assert(intersects(a, rect(2, 2, 6, 6)))
    assert(overlaps(a, rect(2, 2, 6, 6)))
    assert(!overlaps(a, rect(1, 1, 2, 2))) // contained, not overlapping
    assert(containsPoly(a, rect(1, 1, 2, 2)))
    assert(touches(a, rect(4, 0, 8, 4))) // shared edge only
    assert(!overlaps(a, rect(4, 0, 8, 4)))
    assert(disjoint(a, rect(5, 5, 6, 6)))
    assert(equalsPoly(a, rect(0, 0, 4, 4)))
    assert(relation(a, rect(2, 2, 6, 6)) === "overlaps")
    assert(relation(a, rect(1, 1, 2, 2)) === "contains")
    assert(relation(rect(1, 1, 2, 2), a) === "within")
    assert(relation(a, rect(5, 5, 6, 6)) === "disjoint")
  }

  test("DE-9IM relate matches the canonical matrices") {
    val a = rect(0, 0, 4, 4)
    // textbook matrices
    assert(relate(a, rect(2, 2, 6, 6)) === "212101212")   // overlap
    assert(relate(a, rect(0, 0, 4, 4)) === "2FFF1FFF2")   // equals
    assert(relate(a, rect(1, 1, 2, 2)) === "212FF1FF2")   // contains (proper)
    assert(relate(rect(1, 1, 2, 2), a) === "2FF1FF212")   // within (proper)
    assert(relate(a, rect(5, 5, 6, 6)) === "FF2FF1212")   // disjoint
    assert(relate(a, rect(4, 0, 8, 4)) === "FF2F11212")   // edge touch
    assert(relate(a, rect(4, 4, 8, 8)) === "FF2F01212")   // corner touch
    // containment with a shared boundary arc: interiors meet, boundaries
    // share dim-1, and B's boundary enters A's interior
    assert(relate(a, rect(0, 0, 2, 4)) === "212F11FF2")
    // non-rectangles: crossing triangles overlap
    val t1 = IndexedSeq((0.0, 0.0), (6.0, 0.0), (3.0, 6.0))
    val t2 = IndexedSeq((0.0, 4.0), (6.0, 4.0), (3.0, -2.0))
    assert(relate(t1, t2) === "212101212")
    // triangle strictly inside the square
    val t3 = IndexedSeq((1.0, 1.0), (3.0, 1.0), (2.0, 3.0))
    assert(relate(a, t3) === "212FF1FF2")
    assert(relate(t3, a) === "2FF1FF212")
  }

  test("at-vertex transversal crossing is detected exactly (r3 ADVICE)") {
    val sq = rect(0, 0, 4, 4)
    // diamond whose LEFT vertex sits exactly on sq's bottom edge and whose
    // wedge straddles it (45 deg / -45 deg): a transversal crossing with
    // no open-edge proper cross at that point
    val diamond = IndexedSeq((2.0, 0.0), (3.0, 1.0), (4.0, 0.0), (3.0, -1.0))
    assert(GeometryAlgorithms.vertexTransversal(diamond, sq))
    val m = relate(sq, diamond)
    assert(m(0) === '2' && m(4) === '0', m) // interiors meet, 0-dim bb ok
    // kitty-corner squares share a vertex but do NOT cross there
    val b = rect(4, 4, 8, 8)
    assert(!GeometryAlgorithms.vertexTransversal(sq, b))
    assert(!GeometryAlgorithms.vertexTransversal(b, sq))
    assert(relate(sq, b) === "FF2F01212")
    // shared-vertex transversal: diamond through sq's corner (0,0)
    val d2 = IndexedSeq((0.0, 0.0), (1.0, 1.0), (2.0, 0.0), (1.0, -1.0))
    assert(GeometryAlgorithms.vertexTransversal(d2, sq))
    assert(relate(sq, d2)(0) === '2')
  }

  test("crosses predicate for open polylines (DE-9IM dim-0 interior)") {
    import GeometryAlgorithms.crossesLines
    val x1 = IndexedSeq((0.0, 0.0), (4.0, 4.0))
    val x2 = IndexedSeq((0.0, 4.0), (4.0, 0.0))
    assert(crossesLines(x1, x2)) // X crossing
    // T-touch mid-line: contact point interior to both -> crosses
    val t1 = IndexedSeq((0.0, 0.0), (4.0, 0.0))
    val t2 = IndexedSeq((2.0, -2.0), (2.0, 0.0), (2.0, 2.0))
    assert(crossesLines(t1, t2))
    // endpoint touch: point on t1's interior but IS an endpoint of e2
    val e2 = IndexedSeq((2.0, 2.0), (2.0, 0.0))
    assert(!crossesLines(t1, e2))
    // collinear overlap is dim 1 -> overlaps, not crosses
    val o2 = IndexedSeq((1.0, 0.0), (3.0, 0.0), (3.0, 2.0))
    assert(!crossesLines(t1, o2))
    // disjoint
    assert(!crossesLines(t1, IndexedSeq((0.0, 1.0), (4.0, 1.0))))
    // crossing exactly at a shared interior vertex of both lines
    val v1 = IndexedSeq((0.0, 0.0), (2.0, 0.0), (4.0, 0.0))
    val v2 = IndexedSeq((2.0, -2.0), (2.0, 0.0), (2.0, 3.0))
    assert(crossesLines(v1, v2))
  }

  test("crosses and vertexTransversal are symmetric (random polylines)") {
    // deterministic pseudo-random polylines on a coarse integer-ish grid
    // (exact-contact cases arise naturally); both predicates are
    // symmetric by definition — any asymmetry is an implementation bug
    def h(a: Long): Double = {
      var z = a * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      ((z ^ (z >>> 31)) & 0xFFFF).toDouble / 0xFFFF
    }
    def line(seed: Long, np: Int): IndexedSeq[(Double, Double)] =
      IndexedSeq.tabulate(np)(k =>
        (math.rint(h(seed * 31 + k) * 8), math.rint(h(seed * 57 + k + 99) * 8)))
    var crossed = 0
    for (s <- 0 until 120) {
      val a = line(s, 3 + s % 3)
      val b = line(s + 1000, 3 + (s * 7) % 3)
      val ab = GeometryAlgorithms.crossesLines(a, b)
      val ba = GeometryAlgorithms.crossesLines(b, a)
      assert(ab === ba, s"crosses asym seed $s: $a vs $b")
      if (ab) crossed += 1
    }
    assert(crossed > 10, s"fixture too weak: only $crossed crossings")
    // transversal evidence symmetry inside relate: pc(a,b) == pc(b,a)
    for (s <- 0 until 60) {
      val a = line(s, 4)
      val b = line(s + 500, 4)
      val vt = GeometryAlgorithms.vertexTransversal(a, b) ||
        GeometryAlgorithms.vertexTransversal(b, a)
      val tv = GeometryAlgorithms.vertexTransversal(b, a) ||
        GeometryAlgorithms.vertexTransversal(a, b)
      assert(vt === tv)
    }
  }

  test("interior point exists for slivers the offset sweep misses") {
    // thin sliver: thickness 1e-7 << 1e-6 * extent, so every inward
    // offset candidate overshoots; the convex-corner triangle method
    // must still find a strictly interior point
    val sliver = Polygon2D(
      Array((0.0, 0.0), (10.0, 1e-7), (20.0, 0.0), (10.0, -1e-7)))
    val ip = GeometryAlgorithms.interiorPoint(sliver)
    assert(ip.isDefined)
    assert(sliver.contains(ip.get._1, ip.get._2))
    // and self-relate on the sliver still reports equality
    val r = sliver.exterior.toIndexedSeq
    assert(relate(r, r) === "2FFF1FFF2")
  }

  test("DE-9IM relate is hole-aware") {
    val annulus = Polygon2D(
      rect(0, 0, 10, 10).toArray,
      Array(rect(4, 4, 6, 6).toArray))
    // B strictly inside the HOLE: point-set disjoint
    assert(relatePolygons(annulus,
      Polygon2D(rect(4.5, 4.5, 5.5, 5.5).toArray)) === "FF2FF1212")
    // B fills the hole EXACTLY: boundaries share the ring (dim 1), B's
    // interior lies in A's exterior, ∂B never leaves closure(A)
    assert(relatePolygons(annulus,
      Polygon2D(rect(4, 4, 6, 6).toArray)) === "FF2F112F2")
    // B overlapping the solid part: ordinary overlap matrix
    assert(relatePolygons(annulus,
      Polygon2D(rect(-1.0, -1.0, 2.0, 2.0).toArray)) === "212101212")
    // B = a strictly interior patch of the solid ring region
    assert(relatePolygons(annulus,
      Polygon2D(rect(1, 1, 3, 3).toArray)) === "212FF1FF2")
  }

  test("DE-9IM transpose symmetry: relate(a,b) = relate(b,a)^T") {
    def transpose(m: String): String = {
      // matrix rows A-I/B/E vs cols B-I/B/E: transpose swaps (r,c)->(c,r)
      val t = Array.ofDim[Char](9)
      for (r <- 0 until 3; c <- 0 until 3) t(c * 3 + r) = m(r * 3 + c)
      new String(t)
    }
    val shapes = Seq(
      rect(0, 0, 4, 4), rect(2, 2, 6, 6), rect(1, 1, 2, 2),
      rect(4, 0, 8, 4), rect(4, 4, 8, 8), rect(5, 5, 6, 6),
      rect(0, 0, 2, 4),
      IndexedSeq((0.0, 0.0), (6.0, 0.0), (3.0, 6.0)),
      IndexedSeq((0.0, 4.0), (6.0, 4.0), (3.0, -2.0)),
      IndexedSeq((1.0, 1.0), (3.0, 1.0), (2.0, 3.0)))
    for (a <- shapes; b <- shapes)
      assert(relate(a, b) === transpose(relate(b, a)),
        s"asym for $a vs $b: ${relate(a, b)} vs ${relate(b, a)}")
    // hole-aware variant too
    val annulus = Polygon2D(rect(0, 0, 10, 10).toArray,
      Array(rect(4, 4, 6, 6).toArray))
    for (b <- Seq(Polygon2D(rect(4, 4, 6, 6).toArray),
        Polygon2D(rect(4.5, 4.5, 5.5, 5.5).toArray),
        Polygon2D(rect(-1.0, -1.0, 2.0, 2.0).toArray))) {
      assert(relatePolygons(annulus, b) ===
        transpose(relatePolygons(b, annulus)))
    }
  }

  test("clip: rectangle intersection/union/difference areas") {
    val a = rect(0, 0, 4, 4)
    val b = rect(2, 2, 6, 6)
    val inter = PolygonClip.intersection(a, b)
    assert(inter.length === 1)
    assert(math.abs(math.abs(signedArea(inter.head)) - 4.0) < 1e-12)
    val uni = PolygonClip.union(a, b)
    assert(math.abs(uni.map(r => math.abs(signedArea(r))).sum - 28.0)
      < 1e-12)
    val diff = PolygonClip.difference(a, b)
    assert(math.abs(diff.map(r => math.abs(signedArea(r))).sum - 12.0)
      < 1e-12)
  }

  test("clip: concave subject against rectangle") {
    // L-shape: 4x4 square minus its upper-right 2x2 quadrant
    val l = IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (0.0, 4.0))
    val b = rect(1, 1, 5, 5)
    val inter = PolygonClip.intersection(l, b)
    // area of L within [1,5]^2: full [1,4]x[1,2] strip (3) + [1,2]x[2,4]
    // column (2) = 5
    assert(math.abs(inter.map(r => math.abs(signedArea(r))).sum - 5.0)
      < 1e-12, inter)
    val uni = PolygonClip.union(l, b)
    // union area = area(L) + area(b) - inter = 12 + 16 - 5 = 23
    assert(math.abs(uni.map(r => math.abs(signedArea(r))).sum - 23.0)
      < 1e-12)
  }

  test("clip fallbacks: containment and disjoint") {
    val a = rect(0, 0, 10, 10)
    val b = rect(2, 2, 3, 3)
    assert(PolygonClip.intersection(a, b).map(r =>
      math.abs(signedArea(r))).sum === 1.0)
    assert(PolygonClip.union(a, b).map(r =>
      math.abs(signedArea(r))).sum === 100.0)
    val c = rect(20, 20, 21, 21)
    assert(PolygonClip.intersection(a, c).isEmpty)
    assert(PolygonClip.union(a, c).map(r =>
      math.abs(signedArea(r))).sum === 101.0)
    assert(PolygonClip.difference(a, c).map(r =>
      math.abs(signedArea(r))).sum === 100.0)
  }

  test("clipAreas via inclusion-exclusion is exact for the hole case") {
    // clip strictly inside subject: ring output flattens the hole, but
    // the AREA faces must still be exact
    val spark = graft.operators.SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L,
      Seq(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0),
      Seq(2.0, 2.0, 3.0, 2.0, 3.0, 3.0, 2.0, 3.0)))
      .toDF("id", "ring_a", "ring_b")
    val r = graft.operators.GeometryOps.clipAreas(spark, df, "id",
      "ring_a", "ring_b").head()
    assert(r.getDouble(1) === 1.0)   // intersection
    assert(r.getDouble(2) === 100.0) // union
    assert(r.getDouble(3) === 99.0)  // difference EXCLUDES the hole
  }

  test("measures: perimeter, centroid, envelope, geodesic length") {
    val a = rect(0, 0, 3, 4)
    assert(perimeter(a) === 14.0)
    assert(centroid(a) === ((1.5, 2.0)))
    assert(envelope(a) === ((0.0, 0.0, 3.0, 4.0)))
    // 1 degree along the equator ~ 111.32 km
    val d = length(IndexedSeq((0.0, 0.0), (1.0, 0.0)), geodetic = true)
    assert(math.abs(d - 111319.49) < 1.0, d)
  }

  test("unary surface: is_simple / is_valid / correct on rings") {
    val r = rect(0, 0, 4, 4)
    assert(isSimpleRing(r) && isValidRing(r))
    // bowtie: crossing diagonals
    val bow = IndexedSeq((0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (4.0, 4.0))
    assert(!isSimpleRing(bow) && !isValidRing(bow))
    // repeated consecutive vertex
    assert(!isSimpleRing(IndexedSeq((0.0, 0.0), (0.0, 0.0), (4.0, 0.0),
      (4.0, 4.0))))
    // collinear spike on adjacent edges
    assert(!isSimpleRing(IndexedSeq((0.0, 0.0), (4.0, 0.0), (2.0, 0.0),
      (2.0, 4.0))))
    // degenerate: all collinear -> zero area, invalid
    val line = IndexedSeq((0.0, 0.0), (2.0, 0.0), (4.0, 0.0))
    assert(!isValidRing(line))
    assert(!isValidRing(IndexedSeq((0.0, 0.0), (1.0, 1.0))))
    // correct: CW ring flips to CCW; CCW stays
    val cw = r.reverse
    assert(signedArea(cw) < 0 && signedArea(correctRing(cw)) > 0)
    assert(correctRing(r) eq r)
    assert(signedArea(correctRing(r, ccw = false)) < 0)
  }

  test("unary surface: hole-aware polygon validity") {
    def arr(r: IndexedSeq[(Double, Double)]) = r.toArray
    val ext = rect(0, 0, 10, 10)
    val hole1 = rect(1, 1, 3, 3)
    val hole2 = rect(5, 5, 7, 7)
    assert(isValidPolygon(Polygon2D(arr(ext), Array(arr(hole1), arr(hole2)))))
    // hole escaping the exterior
    val out = rect(8, 8, 12, 12)
    assert(!isValidPolygon(Polygon2D(arr(ext), Array(arr(out)))))
    // overlapping holes
    val h3 = rect(2, 2, 6, 6)
    assert(!isValidPolygon(Polygon2D(arr(ext), Array(arr(hole1), arr(h3)))))
    // invalid exterior
    val bow = IndexedSeq((0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (4.0, 4.0))
    assert(!isValidPolygon(Polygon2D(arr(bow))))
  }
}
