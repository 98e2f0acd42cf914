package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One row of the Iceberg-style image+caption table
  * (`BASELINE.json.input_hint` schema), plus the derived geo columns.
  */
case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long,
    lon: Double,
    lat: Double)

/** Deterministic synthesis of the image+caption table at any scale —
  * every field derives from `image_id` alone (phash-seeded SplitMix64),
  * so any subset regenerated anywhere is bit-identical; the raster is the
  * analytic field of the reference's unstructured example
  * (`/root/reference/examples` sin/cos field), sampled over the image's
  * geographic footprint.
  *
  * A deliberate hot-cell cluster (20% of images inside a 2x2 degree box)
  * exercises the skew paths, as the north star requires.
  */
object ImageTableGen {

  final val LonMin = 80.0
  final val LonMax = 170.0
  final val LatMin = -45.0
  final val LatMax = 30.0
  // hot cluster box (dense imagery region)
  final val HotLon = 120.0
  final val HotLat = 10.0
  final val HotFrac = 0.2

  /** Stable 64-bit FNV-1a of the image id — the `phash` column. */
  def phashOf(id: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < id.length) {
      h ^= id.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SplitMix64 — deterministic per-image RNG stream. */
  private final class Rng(seed0: Long) {
    private var state = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  /** The analytic field every raster samples. */
  def field(lon: Double, lat: Double): Double =
    math.sin(3 * math.toRadians(lon) * 4) * math.cos(2 * math.toRadians(lat) * 4) +
      0.5 * math.sin(5 * math.toRadians(lon) * 4) * math.sin(4 * math.toRadians(lat) * 4)

  /** Scale field output (~[-1.5, 1.5]) into [0,1] pixel space. */
  def fieldToPixel(v: Double): Float = ((v + 1.5) / 3.0).toFloat

  /** Geographic footprint size of one image in degrees. */
  final val FootprintDeg = 0.5

  def makeRow(idx: Long, size: Int, jpegFrac: Double): ImageRow = {
    val id = f"img$idx%012d"
    val ph = phashOf(id)
    val rng = new Rng(ph)
    val hot = rng.nextDouble() < HotFrac
    val lon =
      if (hot) HotLon + rng.nextDouble() * 2.0
      else LonMin + rng.nextDouble() * (LonMax - LonMin - FootprintDeg)
    val lat =
      if (hot) HotLat + rng.nextDouble() * 2.0
      else LatMin + rng.nextDouble() * (LatMax - LatMin - FootprintDeg)
    val fmt = if (rng.nextDouble() < jpegFrac) "jpeg" else "png"
    val w = size
    val h = size
    val pixels = new Array[Float](w * h)
    val dLon = FootprintDeg / (w - 1)
    val dLat = FootprintDeg / (h - 1)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        pixels(r * w + c) = fieldToPixel(field(lon + c * dLon, lat + r * dLat))
        c += 1
      }
      r += 1
    }
    val bytes = ImageCodec.encode(pixels, w, h, fmt)
    ImageRow(id, bytes, w, h, fmt,
      caption = s"synthetic field tile at lon=$lon lat=$lat id=$id",
      phash = ph, lon = lon, lat = lat)
  }

  /** Distributed generation: `n` images, `size` px square, `jpegFrac`
    * lossy share. One narrow map stage over `spark.range`.
    */
  def generate(spark: SparkSession, n: Long, size: Int = 32,
               jpegFrac: Double = 0.1,
               partitions: Int = 0): Dataset[ImageRow] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions)
      else spark.range(n)
    base.map(i => makeRow(i, size, jpegFrac))
  }
}
