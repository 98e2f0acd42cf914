package graft.core

/** Weighted streaming statistical moments (count, Σw, mean, min, max, Σ,
  * M2..M4) with the numerically stable update / parallel-merge formulas of
  * Pébay et al. (doi 10.1007/s00180-015-0637-z), matching the reference
  * accumulator behavior at
  * `/root/reference/cxx/include/pyinterp/math/descriptive_statistics.hpp:
  * 205-297` — so partial aggregation on Spark mappers merged on reducers
  * produces the same statistics the reference's dask `+=` fold produces.
  *
  * Mutable for use inside Spark aggregation buffers.
  */
final class Moments(
    var count: Long = 0L,
    var sumW: Double = 0.0,
    var mean: Double = 0.0,
    var min: Double = Double.MaxValue,
    var max: Double = Double.MinValue,
    var sum: Double = 0.0,
    var m2: Double = 0.0,
    var m3: Double = 0.0,
    var m4: Double = 0.0
) extends Serializable {

  /** Push one value with weight 1 (incremental update path,
    * `descriptive_statistics.hpp:205-242`).
    */
  def add(value: Double): Unit = {
    if (sumW == 0.0) { initSingle(value, 1.0); return }
    val r = sumW
    sumW += 1.0
    count += 1L
    sum += value
    val invN = 1.0 / sumW
    val delta = value - mean
    val a = delta * invN
    mean += a
    m4 += a * (a * a * delta * r * (sumW * (sumW - 3.0) + 3.0) +
      6.0 * a * m2 - 4.0 * m3)
    val b = value - mean
    m3 += a * (b * delta * (sumW - 2.0) - 3.0 * m2)
    m2 = Math.fma(delta, b, m2)
    if (value < min) min = value
    if (value > max) max = value
  }

  /** Push one weighted value: treated as merging a single-value accumulator
    * (`descriptive_statistics.hpp:70-77`).
    */
  def add(value: Double, weight: Double): Unit = {
    if (sumW == 0.0) initSingle(value, weight)
    else merge(Moments.single(value, weight))
  }

  private def initSingle(value: Double, weight: Double): Unit = {
    count = 1L; sumW = weight; mean = value
    min = value; max = value; sum = value * weight
    m2 = 0.0; m3 = 0.0; m4 = 0.0
  }

  /** Parallel merge (`descriptive_statistics.hpp:246-297`). */
  def merge(rhs: Moments): Unit = {
    if (rhs.count == 0L && rhs.sumW == 0.0) return
    if (count == 0L && sumW == 0.0) { copyFrom(rhs); return }
    val w = sumW + rhs.sumW
    if (rhs.min < min) min = rhs.min
    if (rhs.max > max) max = rhs.max
    val delta = rhs.mean - mean
    val deltaW = delta / w
    val delta2W2 = deltaW * deltaW
    val w2 = sumW * sumW
    val ww = sumW * rhs.sumW
    val rhsW2 = rhs.sumW * rhs.sumW
    m4 += rhs.m4 + ww * (w2 - ww + rhsW2) * delta * deltaW * delta2W2 +
      6.0 * (w2 * rhs.m2 + rhsW2 * m2) * delta2W2 +
      4.0 * (sumW * rhs.m3 - rhs.sumW * m3) * deltaW
    m3 += rhs.m3 + ww * (sumW - rhs.sumW) * delta * delta2W2 +
      3.0 * (sumW * rhs.m2 - rhs.sumW * m2) * deltaW
    m2 = Math.fma(ww * delta, deltaW, m2 + rhs.m2)
    mean = Math.fma(rhs.sumW, deltaW, mean)
    sumW = w
    count += rhs.count
    sum += rhs.sum
  }

  def copyFrom(rhs: Moments): Unit = {
    count = rhs.count; sumW = rhs.sumW; mean = rhs.mean
    min = rhs.min; max = rhs.max; sum = rhs.sum
    m2 = rhs.m2; m3 = rhs.m3; m4 = rhs.m4
  }

  def meanOrNaN: Double = if (count == 0) Double.NaN else mean
  def minOrNaN: Double = if (count == 0) Double.NaN else min
  def maxOrNaN: Double = if (count == 0) Double.NaN else max

  /** Variance with delta degrees of freedom (0=population, 1=sample). */
  def variance(ddof: Int = 0): Double = {
    val cardinal = sumW - ddof
    if (cardinal <= 0.0) Double.NaN else m2 / cardinal
  }

  def std(ddof: Int = 0): Double = math.sqrt(variance(ddof))

  def skewness: Double =
    if (m2 == 0.0) Double.NaN
    else math.sqrt(sumW) * m3 / math.pow(m2, 1.5)

  /** Excess kurtosis. */
  def kurtosis: Double =
    if (m2 == 0.0) Double.NaN
    else sumW * m4 / (m2 * m2) - 3.0
}

object Moments {
  def single(value: Double, weight: Double): Moments = {
    val m = new Moments()
    m.count = 1L; m.sumW = weight; m.mean = value
    m.min = value; m.max = value; m.sum = value * weight
    m
  }
}
