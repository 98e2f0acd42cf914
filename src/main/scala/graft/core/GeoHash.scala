package graft.core

/** Integer geohash codec (the engine's deterministic H3/S2-style cell id).
  *
  * Implements the published geohash bit-interleave algorithm
  * (https://mmcloughlin.com/posts/geohash-assembly), matching the behavior
  * of the reference implementation at
  * `/root/reference/cxx/src/library/geohash/int64.cpp:50-109` (spread /
  * squash / interleave, range encode with 2^32 quantization) and
  * `/root/reference/cxx/include/pyinterp/geohash/int64.hpp:28-120`
  * (precision shifts, bounding boxes, neighbors).
  *
  * All values are carried as JVM `Long`; hashes at precision <= 62 bits
  * are non-negative, and the full 64-bit interleave uses the same two's
  * complement bit pattern as the reference's uint64.
  */
object GeoHash {

  final val Exp232 = 4294967296.0 // 2^32
  final val InvExp232 = 1.0 / Exp232

  /** Spread the 32 bits of x into even bit positions of a 64-bit word. */
  def spread(x: Long): Long = {
    var r = x & 0xFFFFFFFFL
    r = (r | (r << 16)) & 0x0000FFFF0000FFFFL
    r = (r | (r << 8)) & 0x00FF00FF00FF00FFL
    r = (r | (r << 4)) & 0x0F0F0F0F0F0F0F0FL
    r = (r | (r << 2)) & 0x3333333333333333L
    r = (r | (r << 1)) & 0x5555555555555555L
    r
  }

  /** Squash the even bit levels of x into a 32-bit word (low half of Long). */
  def squash(x0: Long): Long = {
    var x = x0 & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Encode x in [-r, r] to a uint32 (carried in a Long). */
  def encodeRange(x: Double, r: Double): Long = {
    if (x >= r) 0xFFFFFFFFL
    else {
      val p = (x + r) / (2 * r)
      (p * Exp232).toLong & 0xFFFFFFFFL
    }
  }

  /** Decode a uint32 range encoding back to [-r, r] (min corner). */
  def decodeRange(x: Long, r: Double): Double = {
    if (x == 0xFFFFFFFFL) r
    else 2 * r * (x.toDouble * InvExp232) - r
  }

  /** Full 64-bit encode: lat on even bits, lon on odd bits. */
  def encodeFull(lon0: Double, lat: Double): Long = {
    var lon = lon0
    if (lon < -180.0 || lon > 180.0)
      lon = GeoMath.normalizePeriod(lon, -180.0, 360.0)
    spread(encodeRange(lat, 90)) | (spread(encodeRange(lon, 180)) << 1)
  }

  /** Encode at `precision` bits (hash occupies the low `precision` bits). */
  def encode(lon: Double, lat: Double, precision: Int): Long = {
    val full = encodeFull(lon, lat)
    if (precision == 64) full else full >>> (64 - precision)
  }

  /** (lonErr, latErr) cell extents in degrees for a precision. */
  def errorWithPrecision(precision: Int): (Double, Double) = {
    val latBits = precision >> 1
    val lonBits = precision - latBits
    (360.0 * math.pow(2.0, -lonBits), 180.0 * math.pow(2.0, -latBits))
  }

  /** Bounding box (lonMin, latMin, lonMax, latMax) of a cell. */
  def boundingBox(hash: Long, precision: Int): (Double, Double, Double, Double) = {
    val full = hash << (64 - precision)
    val (lonErr, latErr) = errorWithPrecision(precision)
    val lat32 = squash(full)
    val lon32 = squash(full >>> 1)
    val lat = decodeRange(lat32, 90)
    val lon = decodeRange(lon32, 180)
    (lon, lat, lon + lonErr, lat + latErr)
  }

  /** Cell centroid (lon, lat). */
  def centroid(hash: Long, precision: Int): (Double, Double) = {
    val (x0, y0, x1, y1) = boundingBox(hash, precision)
    ((x0 + x1) / 2, (y0 + y1) / 2)
  }

  /** The 8 neighbor cells, ordered N, NE, E, SE, S, SW, W, NW
    * (`int64.cpp:225-253`).
    */
  def neighbors(hash: Long, precision: Int): Array[Long] = {
    val (x0, y0, x1, y1) = boundingBox(hash, precision)
    val lon = (x0 + x1) / 2
    val lat = (y0 + y1) / 2
    val dLon = x1 - x0
    val dLat = y1 - y0
    val lonInc = lon + dLon
    val lonDec = lon - dLon
    val latInc = lat + dLat
    val latDec = lat - dLat
    Array(
      encode(lon, latInc, precision),
      encode(lonInc, latInc, precision),
      encode(lonInc, lat, precision),
      encode(lonInc, latDec, precision),
      encode(lon, latDec, precision),
      encode(lonDec, latDec, precision),
      encode(lonDec, lat, precision),
      encode(lonDec, latInc, precision)
    )
  }

  /** Grid covering a lon/lat box: returns (south-west hash, nLon, nLat)
    * (`int64.cpp:259-288`). Hashes of the grid enumerate row-major from the
    * SW corner via `neighborEast`/`neighborNorth` steps.
    */
  /** Cell count is INCLUSIVE of both corner cells: index-diff + 1 (the
    * r3 q_tile_pipeline oracle caught the former round(diff)-only form
    * silently dropping every NE row/column — an image whose footprint
    * straddled a cell boundary produced an EMPTY cover). The NE corner is
    * clamped just inside the domain so encode cannot wrap at ±180/±90.
    */
  def gridProperties(lonMin: Double, latMin: Double, lonMax: Double,
                     latMax: Double, precision: Int): (Long, Int, Int) = {
    val hashSw = encode(lonMin, latMin, precision)
    val boxSw = boundingBox(hashSw, precision)
    val neLon = if (lonMax >= 180.0) math.nextDown(180.0) else lonMax
    val neLat = if (latMax >= 90.0) math.nextDown(90.0) else latMax
    val boxNe = boundingBox(encode(neLon, neLat, precision), precision)
    val (lonErr, latErr) = errorWithPrecision(precision)
    val nLon = math.round((boxNe._1 - boxSw._1) / lonErr).toInt + 1
    val nLat = math.round((boxNe._2 - boxSw._2) / latErr).toInt + 1
    (hashSw, nLon, nLat)
  }

  /** All cells covering the box [lonMin,lonMax]x[latMin,latMax]. */
  def coverBox(lonMin: Double, latMin: Double, lonMax: Double,
               latMax: Double, precision: Int): Array[Long] = {
    val (hashSw, nLon, nLat) = gridProperties(lonMin, latMin, lonMax, latMax,
      precision)
    val (swLon, swLat, _, _) = boundingBox(hashSw, precision)
    val (lonErr, latErr) = errorWithPrecision(precision)
    val out = new Array[Long](nLon * nLat)
    var k = 0
    var i = 0
    while (i < nLon) {
      var j = 0
      while (j < nLat) {
        out(k) = encode(swLon + (i + 0.5) * lonErr,
          math.min(90.0, swLat + (j + 0.5) * latErr), precision)
        k += 1
        j += 1
      }
      i += 1
    }
    out
  }

  /** Cells covering a polygon: cover its bbox then keep cells whose
    * centroid-or-intersection test passes. Mirrors the reference's
    * `bounding_boxes(polygon, precision)` (`int64.hpp:138-163`) which keeps
    * cells intersecting the geometry.
    */
  def coverPolygon(poly: Polygon2D, precision: Int): Array[Long] = {
    val (lonMin, latMin, lonMax, latMax) = poly.bbox
    coverBox(lonMin, latMin, lonMax, latMax, precision).filter { h =>
      val (x0, y0, x1, y1) = boundingBox(h, precision)
      poly.intersectsBox(x0, y0, x1, y1)
    }
  }

  /** Re-encode a hash at a coarser precision (`pyinterp/geohash.py:14-21`
    * transform semantics for integer codes): drop low bits.
    */
  def coarsen(hash: Long, fromPrecision: Int, toPrecision: Int): Long = {
    require(toPrecision <= fromPrecision)
    hash >>> (fromPrecision - toPrecision)
  }

  /** Standard geohash base32 alphabet (2.5 bits/char;
    * `cxx/tests/geohash/base32.cpp:41`).
    */
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Base32Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    Base32.zipWithIndex.foreach { case (c, i) => inv(c) = i }
    inv
  }

  /** Char-precision geohash string of a point (`geohash/string.hpp`
    * behavior: integer encode at 5*chars bits, 5-bit groups MSB-first).
    */
  def toString(lon: Double, lat: Double, chars: Int): String = {
    val h = encode(lon, lat, chars * 5)
    val sb = new java.lang.StringBuilder(chars)
    var i = chars - 1
    while (i >= 0) {
      sb.append(Base32.charAt(((h >>> (i * 5)) & 31).toInt))
      i -= 1
    }
    sb.toString
  }

  /** Inverse of [[toString]]: string -> (hash, precisionBits). */
  def fromString(s: String): (Long, Int) = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val v = Base32Inv(s.charAt(i))
      require(v >= 0, s"invalid geohash char ${s.charAt(i)}")
      h = (h << 5) | v
      i += 1
    }
    (h, s.length * 5)
  }

  /** Precision transform (`pyinterp.geohash.transform`): coarsening drops
    * low bits (one parent cell); refining appends every bit combination
    * (4^((to-from)/2) children). Precisions step by 2 bits (one lon + one
    * lat bit), matching the interleaved layout.
    */
  def transform(hash: Long, fromPrecision: Int, toPrecision: Int)
      : Array[Long] = {
    require((toPrecision - fromPrecision) % 2 == 0,
      "geohash precisions differ by a multiple of 2 bits")
    if (toPrecision <= fromPrecision)
      Array(hash >>> (fromPrecision - toPrecision))
    else {
      val extra = toPrecision - fromPrecision
      val n = 1 << extra
      Array.tabulate(n)(i => (hash << extra) | i.toLong)
    }
  }
}
