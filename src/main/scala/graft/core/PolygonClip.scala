package graft.core

import scala.collection.mutable.ArrayBuffer

/** Boolean set operations on simple polygons — the engine's analog of the
  * reference's boost `union_`/`intersection`/`difference` bindings
  * (`geometry/geographic/algorithms/{union,intersection,difference}.hpp`).
  *
  * Greiner-Hormann (1998) clipping on doubly-linked vertex rings:
  * intersection points are inserted into both rings (ordered by edge
  * parameter), tagged entry/exit by parity, and result rings traced by
  * switching lists at each intersection. Handles arbitrary SIMPLE
  * polygons (convex or not); the published algorithm's caveat applies —
  * degenerate contact (vertex exactly on the other polygon's edge) is
  * not supported and such inputs should be perturbed by the caller.
  * No-intersection cases fall back to containment/disjoint handling.
  */
object PolygonClip {

  type Pt = (Double, Double)

  private final class V(val x: Double, val y: Double,
                        val isIntersection: Boolean, val alpha: Double) {
    var next: V = _
    var prev: V = _
    var neighbor: V = _
    var entry: Boolean = false
    var visited: Boolean = false
  }

  private def buildRing(pts: IndexedSeq[Pt]): V = {
    val vs = pts.map(p => new V(p._1, p._2, false, 0.0))
    val n = vs.length
    for (i <- 0 until n) {
      vs(i).next = vs((i + 1) % n)
      vs(i).prev = vs((i + n - 1) % n)
    }
    vs.head
  }

  private def ringVertices(h: V): Seq[V] = {
    val out = ArrayBuffer.empty[V]
    var v = h
    do { out += v; v = v.next } while (v ne h)
    out.toSeq
  }

  /** Segment intersection with parameters; None for parallel/disjoint. */
  private def segInt(p1: V, p2: V, q1: V, q2: V)
      : Option[(Double, Double, Double, Double)] = {
    val d1x = p2.x - p1.x; val d1y = p2.y - p1.y
    val d2x = q2.x - q1.x; val d2y = q2.y - q1.y
    val denom = d1x * d2y - d1y * d2x
    if (denom == 0.0) return None
    val t = ((q1.x - p1.x) * d2y - (q1.y - p1.y) * d2x) / denom
    val u = ((q1.x - p1.x) * d1y - (q1.y - p1.y) * d1x) / denom
    if (t <= 0.0 || t >= 1.0 || u <= 0.0 || u >= 1.0) None
    else Some((p1.x + t * d1x, p1.y + t * d1y, t, u))
  }

  private def insertSorted(from: V, ins: V): Unit = {
    // insert after `from`, keeping intersection alphas ascending
    var cur = from
    while (cur.next.isIntersection && cur.next.alpha < ins.alpha)
      cur = cur.next
    ins.next = cur.next
    ins.prev = cur
    cur.next.prev = ins
    cur.next = ins
  }

  private def inside(ring: IndexedSeq[Pt], x: Double, y: Double): Boolean =
    Polygon2D(ring.toArray).contains(x, y)

  /** Core clip: op in {"intersection", "union", "difference"} (difference
    * = subject minus clip). Returns zero or more result rings.
    */
  def clip(subject: IndexedSeq[Pt], clipPoly: IndexedSeq[Pt], op: String)
      : Seq[IndexedSeq[Pt]] = {
    require(subject.length >= 3 && clipPoly.length >= 3)
    val sHead = buildRing(subject)
    val cHead = buildRing(clipPoly)

    // phase 1: find and insert intersections
    var found = 0
    val sEdges = ringVertices(sHead).filterNot(_.isIntersection)
    val cEdges = ringVertices(cHead).filterNot(_.isIntersection)
    for (sv <- sEdges) {
      val sNextOrig = {
        var n = sv.next
        while (n.isIntersection) n = n.next
        n
      }
      for (cv <- cEdges) {
        val cNextOrig = {
          var n = cv.next
          while (n.isIntersection) n = n.next
          n
        }
        segInt(sv, sNextOrig, cv, cNextOrig).foreach {
          case (x, y, t, u) =>
            val is = new V(x, y, true, t)
            val ic = new V(x, y, true, u)
            is.neighbor = ic
            ic.neighbor = is
            insertSorted(sv, is)
            insertSorted(cv, ic)
            found += 1
        }
      }
    }

    if (found == 0) {
      // containment / disjoint fallbacks
      val sInC = inside(clipPoly, subject.head._1, subject.head._2)
      val cInS = inside(subject, clipPoly.head._1, clipPoly.head._2)
      return op match {
        case "intersection" =>
          if (sInC) Seq(subject) else if (cInS) Seq(clipPoly) else Seq.empty
        case "union" =>
          if (sInC) Seq(clipPoly) else if (cInS) Seq(subject)
          else Seq(subject, clipPoly)
        case "difference" =>
          if (sInC) Seq.empty
          // clip hole inside subject: emit subject with a hole — flattened
          // here as the subject ring (documented simple-ring limitation)
          else Seq(subject)
        case other => throw new IllegalArgumentException(other)
      }
    }

    // phase 2: entry/exit parity
    def markEntries(head: V, other: IndexedSeq[Pt], flip: Boolean): Unit = {
      var status = !inside(other, head.x, head.y)
      if (flip) status = !status
      var v = head
      do {
        if (v.isIntersection) {
          v.entry = status
          status = !status
        }
        v = v.next
      } while (v ne head)
    }
    val (flipS, flipC) = op match {
      case "intersection" => (false, false)
      case "union" => (true, true)
      case "difference" => (true, false)
      case other => throw new IllegalArgumentException(other)
    }
    markEntries(sHead, clipPoly, flipS)
    markEntries(cHead, subject, flipC)

    // phase 3: trace result rings
    val results = ArrayBuffer.empty[IndexedSeq[Pt]]
    def unvisited(): Option[V] =
      ringVertices(sHead).find(v => v.isIntersection && !v.visited)
    var start = unvisited()
    while (start.isDefined) {
      val ring = ArrayBuffer.empty[Pt]
      var cur = start.get
      do {
        cur.visited = true
        if (cur.neighbor != null) cur.neighbor.visited = true
        if (cur.entry) {
          do {
            cur = cur.next
            ring += ((cur.x, cur.y))
          } while (!cur.isIntersection)
        } else {
          do {
            cur = cur.prev
            ring += ((cur.x, cur.y))
          } while (!cur.isIntersection)
        }
        cur = cur.neighbor
      } while (!cur.visited)
      if (ring.length >= 3) results += ring.toIndexedSeq
      start = unvisited()
    }
    results.toSeq
  }

  def intersection(a: IndexedSeq[Pt], b: IndexedSeq[Pt])
      : Seq[IndexedSeq[Pt]] = clip(a, b, "intersection")

  def union(a: IndexedSeq[Pt], b: IndexedSeq[Pt]): Seq[IndexedSeq[Pt]] =
    clip(a, b, "union")

  def difference(a: IndexedSeq[Pt], b: IndexedSeq[Pt])
      : Seq[IndexedSeq[Pt]] = clip(a, b, "difference")
}
