package graft.core

/** Temporal axis with dtype-preserving unit arithmetic — the engine's
  * analog of `/root/reference/cxx/include/pyinterp/temporal_axis.hpp:19-51`
  * and the dateutils conversions (`dateutils.hpp:177-386`): epoch ticks
  * are kept as Long in a declared resolution and converted between
  * resolutions with exact integer arithmetic (multiply on upcast,
  * FLOOR division on downcast — matching numpy datetime64 casts).
  */
final case class TemporalAxis(ticks: Array[Long], unit: String)
    extends Serializable {
  import TemporalAxis._

  require(Factors.contains(unit), s"unsupported unit $unit")
  val size: Int = ticks.length

  /** Convert to another resolution (dtype-preserving semantics). */
  def cast(to: String): TemporalAxis = {
    require(Factors.contains(to), s"unsupported unit $to")
    if (to == unit) this
    else TemporalAxis(ticks.map(t => convert(t, unit, to)), to)
  }

  /** The axis as a double-valued [[Axis]] (for Grid3D/Grid4D time axes). */
  def toAxis: Axis = Axis(ticks.map(_.toDouble))

  /** Bracketing indexes of a query time given in `queryUnit`. */
  def findIndexes(t: Long, queryUnit: String): Option[(Int, Int)] =
    toAxis.findIndexes(convert(t, queryUnit, unit).toDouble)

  def front: Long = ticks(0)
  def back: Long = ticks(size - 1)

  /** Mean step in this axis's unit. */
  def meanStep: Double =
    if (size < 2) 0.0 else (back - front).toDouble / (size - 1)
}

object TemporalAxis {
  /** Ticks per second, per resolution. */
  val Factors: Map[String, Long] = Map(
    "s" -> 1L,
    "ms" -> 1000L,
    "us" -> 1000000L,
    "ns" -> 1000000000L)

  /** Exact integer resolution conversion: upcast multiplies, downcast
    * floor-divides (numpy datetime64 cast semantics — floors toward
    * negative infinity, also for pre-epoch times).
    */
  def convert(t: Long, from: String, to: String): Long = {
    val f = Factors(from)
    val g = Factors(to)
    if (f == g) t
    else if (g > f) t * (g / f)
    else Math.floorDiv(t, f / g)
  }
}
