package graft.core

import scala.collection.mutable.ArrayBuffer

/** Merging t-digest for streaming quantiles.
  *
  * Re-expresses the behavior of the reference t-digest
  * (`/root/reference/cxx/include/pyinterp/math/tdigest.hpp:34-470`):
  * asin scale function, lazy unmerged buffer compacted when it reaches
  * `compression` entries, quantile interpolation across centroid midpoints
  * with min/max boundary anchoring, commutative `+=` merge. Used as the
  * mutable buffer of the Spark `percentile`-style aggregator so partial
  * digests merge on reducers exactly as the reference's `operator+=`.
  */
final class TDigest(val compression: Int = 100) extends Serializable {
  var count: Long = 0L
  var min: Double = Double.MaxValue
  var max: Double = Double.MinValue
  // merged centroids, sorted by mean
  var means: ArrayBuffer[Double] = ArrayBuffer.empty
  var weights: ArrayBuffer[Double] = ArrayBuffer.empty
  // unmerged buffer
  private val uMeans: ArrayBuffer[Double] = ArrayBuffer.empty
  private val uWeights: ArrayBuffer[Double] = ArrayBuffer.empty

  def add(value: Double, weight: Double = 1.0): Unit = {
    if (weight <= 0.0 || value.isNaN) return
    count += 1L
    if (value < min) min = value
    if (value > max) max = value
    uMeans += value
    uWeights += weight
    if (uMeans.length >= compression) mergeUnmerged()
  }

  private def kScale(q: Double): Double = {
    val delta = compression / (2.0 * math.Pi)
    delta * math.asin(2.0 * q - 1.0)
  }

  private def qWeight(q: Double): Double = {
    val minQ = math.max(q - kScale(q) / count, 0.0)
    val maxQ = math.min(q + kScale(q) / count, 1.0)
    count * (maxQ - minQ)
  }

  def mergeUnmerged(): Unit = {
    if (uMeans.isEmpty) return
    val n = means.length + uMeans.length
    val order = (0 until uMeans.length).sortBy(uMeans(_))
    // merge-sort merged + sorted unmerged into one sorted sequence
    val allM = new Array[Double](n)
    val allW = new Array[Double](n)
    var i = 0; var j = 0; var k = 0
    while (i < means.length && j < order.length) {
      if (means(i) <= uMeans(order(j))) {
        allM(k) = means(i); allW(k) = weights(i); i += 1
      } else {
        allM(k) = uMeans(order(j)); allW(k) = uWeights(order(j)); j += 1
      }
      k += 1
    }
    while (i < means.length) {
      allM(k) = means(i); allW(k) = weights(i); i += 1; k += 1
    }
    while (j < order.length) {
      allM(k) = uMeans(order(j)); allW(k) = uWeights(order(j)); j += 1; k += 1
    }
    // two-pointer compaction
    val outM = ArrayBuffer.empty[Double]
    val outW = ArrayBuffer.empty[Double]
    var weightSoFar = 0.0
    var r = 0
    while (r < n) {
      val q = (weightSoFar + allW(r) / 2.0) / count
      val maxW = qWeight(q)
      if (outM.nonEmpty && r > 0 && outW.last + allW(r) <= maxW) {
        val oldW = outW.last
        val newW = oldW + allW(r)
        outM(outM.length - 1) =
          Math.fma(allW(r), allM(r), oldW * outM.last) / newW
        outW(outW.length - 1) = newW
      } else {
        if (outM.nonEmpty) weightSoFar += outW.last
        outM += allM(r)
        outW += allW(r)
      }
      r += 1
    }
    means = outM
    weights = outW
    uMeans.clear()
    uWeights.clear()
  }

  def merge(other: TDigest): Unit = {
    other.mergeUnmerged()
    if (other.count == 0) return
    count += other.count
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
    var i = 0
    while (i < other.means.length) {
      uMeans += other.means(i)
      uWeights += other.weights(i)
      i += 1
    }
    mergeUnmerged()
  }

  /** Quantile with centroid-midpoint interpolation
    * (`tdigest.hpp:249-305`).
    */
  def quantile(q: Double): Double = {
    mergeUnmerged()
    if (means.isEmpty) return Double.NaN
    require(q >= 0.0 && q <= 1.0, "quantile must be in [0, 1]")
    if (q == 0.0 || means.length == 1) return min
    if (q == 1.0) return max
    val index = q * count
    var weightSum = 0.0
    var i = 0
    while (i < means.length) {
      val halfWeight = weights(i) / 2.0
      if (weightSum + halfWeight >= index) {
        if (i == 0)
          return Math.fma((index - weightSum) / halfWeight, means(0) - min, min)
        val leftMean = means(i - 1)
        val leftWeight = weightSum - weights(i - 1) / 2.0
        val rightWeight = weightSum + halfWeight
        return Math.fma((index - leftWeight) / (rightWeight - leftWeight),
          means(i) - leftMean, leftMean)
      }
      weightSum += weights(i)
      if (i == means.length - 1)
        return Math.fma((index - weightSum) / halfWeight, max - means(i),
          means(i))
      i += 1
    }
    means.last
  }

  def mean: Double = {
    mergeUnmerged()
    if (means.isEmpty) return Double.NaN
    var s = 0.0
    var w = 0.0
    var i = 0
    while (i < means.length) {
      s = Math.fma(weights(i), means(i), s)
      w += weights(i)
      i += 1
    }
    s / w
  }

  /** Serialize to a flat double array for Spark buffer transport. */
  def toBytes: Array[Byte] = {
    mergeUnmerged()
    val n = means.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * 3 + 4 + 16 * n)
    bb.putInt(compression)
    bb.putLong(count)
    bb.putDouble(min)
    bb.putDouble(max)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def fromBytes(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val td = new TDigest(bb.getInt)
    td.count = bb.getLong
    td.min = bb.getDouble
    td.max = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) {
      td.means += bb.getDouble
      td.weights += bb.getDouble
      i += 1
    }
    td
  }
}
