package graft.core

/** 1-D sorted coordinate axis with O(1) lookup on regular spacing and
  * binary search on irregular spacing, optionally periodic (longitude).
  *
  * Semantics follow the reference axis container behavior
  * (`/root/reference/cxx/include/pyinterp/math/axis.hpp:70`,
  * `cxx/include/pyinterp/math/axis/container.hpp:383-389,549-563`):
  *   - `findIndex(x, bounded)` returns the index of the *nearest* axis
  *     value; unbounded out-of-range queries return -1.
  *   - `findIndexes(x)` returns the pair of indexes framing `x`
  *     (`axis.hpp:722-778`), wrapping on periodic axes.
  *   - `window(x, half, boundary)` builds the 2*half index window used by
  *     windowed interpolators (`axis.hpp:816-881`).
  */
object Boundary extends Enumeration {
  /** Boundary modes of the reference (`math/axis.hpp:32-38`). */
  val Expand, Wrap, Sym, Undef, Shrink = Value
}

final case class Axis(
    values: Array[Double],
    period: Double = 0.0 // 0 = not periodic; 360 for longitude
) extends Serializable {

  require(values.length >= 1, "axis needs at least one value")

  val size: Int = values.length
  val isAscending: Boolean = size < 2 || values(1) > values(0)
  val isPeriodic: Boolean = period != 0.0

  /** Regular-spacing detection (reference uses an epsilon on construction;
    * we require near-exact uniform step within 1e-6 relative).
    */
  val (isRegular, step): (Boolean, Double) = {
    if (size < 2) (true, 0.0)
    else {
      val s = (values(size - 1) - values(0)) / (size - 1)
      var regular = s != 0.0
      var i = 1
      while (regular && i < size) {
        val expect = values(0) + s * i
        if (math.abs(values(i) - expect) > 1e-6 * math.max(1.0, math.abs(s)))
          regular = false
        i += 1
      }
      (regular, s)
    }
  }
  private val invStep = if (step != 0.0) 1.0 / step else 0.0

  def apply(i: Int): Double = values(i)
  def front: Double = values(0)
  def back: Double = values(size - 1)
  def minValue: Double = if (isAscending) front else back
  def maxValue: Double = if (isAscending) back else front

  /** Normalize a coordinate into the axis period window
    * (`math/axis.hpp:294-333` behavior: shift by multiples of the period
    * until within [min, min+period)).
    */
  def normalize(x: Double): Double =
    if (!isPeriodic) x
    else GeoMath.normalizePeriod(x, minValue, period)

  /** Index of the nearest axis value; -1 when unbounded and out of range.
    * Mirrors `container.hpp:549-563` (regular: round((x-x0)*inv_step)) and
    * `container.hpp:383-404` (irregular: lower_bound + nearest pick).
    */
  def findIndex(coordinate: Double, bounded: Boolean): Int = {
    val x = normalize(coordinate)
    if (isRegular) {
      val idx = math.round((x - values(0)) * invStep)
      if (idx < 0) { if (bounded) 0 else -1 }
      else if (idx >= size) { if (bounded) size - 1 else -1 }
      else idx.toInt
    } else if (isAscending) {
      findIndexIrregular(x, bounded, lessThan = _ < _)
    } else {
      findIndexIrregular(x, bounded, lessThan = _ > _)
    }
  }

  private def findIndexIrregular(
      x: Double, bounded: Boolean,
      lessThan: (Double, Double) => Boolean): Int = {
    // lower_bound with custom comparator
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lessThan(values(mid), x)) lo = mid + 1 else hi = mid
    }
    if (lo == 0) {
      if (lessThan(x, values(0))) { if (bounded) 0 else -1 } else 0
    } else if (lo == size) {
      if (lessThan(values(size - 1), x)) { if (bounded) size - 1 else -1 }
      else size - 1
    } else {
      val prev = lo - 1
      if (lessThan(x - values(prev), values(lo) - x)) prev else lo
    }
  }

  /** Frame `x` between two adjacent axis indexes (i0 < i1 for ascending).
    * Returns null when the coordinate cannot be framed (matches
    * `axis.hpp:722-778` returning nullopt).
    */
  def findIndexes(coordinate: Double): Option[(Int, Int)] = {
    if (coordinate.isNaN) return None
    val x = normalize(coordinate)
    val i0raw = findIndex(x, bounded = false)
    if (i0raw == -1) {
      return if (isPeriodic) Some((size - 1, 0)) else None
    }
    val delta = x - values(i0raw)
    if (delta == 0) {
      if (size == 1) return None
      val i1 = if (i0raw == size - 1) i0raw - 1 else i0raw + 1
      return Some((math.min(i0raw, i1), math.max(i0raw, i1)))
    }
    var i0 = i0raw
    var i1 = i0raw
    if (delta < 0) i0 = if (isAscending) i0 - 1 else i0 + 1
    else i1 = if (isAscending) i0raw + 1 else i0raw - 1
    if (isPeriodic)
      Some((GeoMath.floorMod(i0, size), GeoMath.floorMod(i1, size)))
    else if (i0 >= 0 && i1 >= 0 && i0 < size && i1 < size) Some((i0, i1))
    else None
  }

  private def handleBoundary(b: Boundary.Value, idx: Int): Int = {
    if (isPeriodic) return GeoMath.floorMod(idx, size)
    b match {
      case Boundary.Expand => math.max(0, math.min(idx, size - 1))
      case Boundary.Wrap   => GeoMath.floorMod(idx, size)
      case Boundary.Sym =>
        if (idx < 0) GeoMath.floorMod(-idx, size)
        else size - 2 - GeoMath.floorMod(idx - size, size)
      case _ => -1
    }
  }

  /** Index window of length 2*half around `x` (reference
    * `axis.hpp:816-881`); returns the indexes plus the (i0,i1) center
    * positions inside the window, or None if the boundary mode rejects it.
    */
  def window(coordinate: Double, half: Int, boundary: Boundary.Value)
      : Option[(Array[Int], (Int, Int))] = {
    if (half == 0) return None
    val framed = findIndexes(coordinate) match {
      case Some(f) => f
      case None =>
        return if (size == 1 && normalize(coordinate) == values(0))
          Some((Array.fill(half * 2)(0), (0, 0)))
        else None
    }
    val buf = scala.collection.mutable.ArrayDeque[Int](framed._1, framed._2)
    var center = (0, 1)
    var shift = 1
    while (shift < half) {
      var before = framed._1 - shift
      if (before < 0) before = handleBoundary(boundary, before)
      if (before >= 0) {
        buf.prepend(before)
        center = (center._1 + 1, center._2 + 1)
      } else if (boundary != Boundary.Shrink) return None
      var after = framed._2 + shift
      if (after >= size) after = handleBoundary(boundary, after)
      if (after >= 0) buf.append(after)
      else if (boundary != Boundary.Shrink) return None
      shift += 1
    }
    Some((buf.toArray, center))
  }

  /** Axis.contains (`math/axis.hpp:401-416`): periodic axes contain
    * everything; otherwise min<=x<=max.
    */
  def contains(x: Double): Boolean =
    isPeriodic || (x >= minValue && x <= maxValue)
}

object Axis {
  /** Evenly spaced axis over [start, stop] with `num` samples. */
  def regular(start: Double, stop: Double, num: Int,
              period: Double = 0.0): Axis = {
    val step = if (num > 1) (stop - start) / (num - 1) else 0.0
    Axis(Array.tabulate(num)(i => start + step * i), period)
  }
}

/** Shared small math helpers (period normalization, remainder). */
object GeoMath {
  /** Normalize x into [min, min+period): reference
    * `math.hpp normalize_period` behavior.
    */
  def normalizePeriod(x: Double, min: Double, period: Double): Double = {
    var v = x
    while (v < min) v += period
    while (v >= min + period) v -= period
    v
  }

  /** Python-style remainder (always in [0, n)). */
  def floorMod(i: Int, n: Int): Int = {
    val r = i % n
    if (r < 0) r + n else r
  }

  /** Symmetric-reflection edge mapping of the reference's fill-window
    * `frame_index` (`fill/helpers.hpp:79-110`, non-angle branch):
    * out-of-domain indexes reflect about the edge NODES (-1 -> 1,
    * size -> size-2), so edge-adjacent windows revisit interior cells
    * instead of clamping onto the edge cell.
    */
  def reflectIndex(idx: Int, size: Int): Int = {
    if (idx >= 0 && idx < size) idx
    else if (size == 1) 0
    else {
      val where = floorMod(idx, (size - 1) * 2)
      if (where >= size) size - 2 - floorMod(where, size) else where
    }
  }
}
