package graft.pipeline

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal allocation-lean PNG codec for 8-bit grayscale rasters (the
  * image table's lossless format). Produces standard PNGs (signature /
  * IHDR / IDAT(deflate, filter 0) / IEND) readable by any decoder;
  * decodes any non-interlaced 8-bit grayscale PNG (all five scanline
  * filters). Anything else falls back to ImageIO in [[ImageCodec]].
  *
  * Exists because javax.imageio's reader/writer plumbing dominates the
  * per-image cost and thrashes allocation at 32 decode threads.
  */
object FastPng {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A,
    0x1A, 0x0A)

  def encodeGray8(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // raw scanlines with filter byte 0
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0
      System.arraycopy(pixels, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val deflater = new Deflater(6)
    deflater.setInput(raw)
    deflater.finish()
    val comp = new Array[Byte](raw.length + 128)
    var compLen = 0
    while (!deflater.finished()) {
      val n = deflater.deflate(comp, compLen, comp.length - compLen)
      compLen += n
      if (compLen == comp.length && !deflater.finished())
        return encodeViaStream(raw) // pathological incompressible case
    }
    deflater.end()

    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + compLen + 12)
    out.put(Signature)
    // IHDR
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w)
    ihdr.putInt(h)
    ihdr.put(8.toByte) // bit depth
    ihdr.put(0.toByte) // color type grayscale
    ihdr.put(0.toByte) // compression
    ihdr.put(0.toByte) // filter
    ihdr.put(0.toByte) // no interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", java.util.Arrays.copyOf(comp, compLen))
    writeChunk(out, "IEND", Array.emptyByteArray)
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  private def encodeViaStream(raw: Array[Byte]): Array[Byte] =
    throw new IllegalStateException("incompressible png payload")

  private def writeChunk(out: java.nio.ByteBuffer, typ: String,
                         data: Array[Byte]): Unit = {
    out.putInt(data.length)
    val typeBytes = typ.getBytes("US-ASCII")
    out.put(typeBytes)
    out.put(data)
    val crc = new CRC32()
    crc.update(typeBytes)
    crc.update(data)
    out.putInt(crc.getValue.toInt)
  }

  /** Decode an 8-bit grayscale non-interlaced PNG; null when the stream
    * is a PNG this fast path does not cover (caller falls back).
    */
  def decodeGray8(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    if (bytes.length < 8) return null
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return null; i += 1 }
    val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    var w = 0
    var h = 0
    var idat = new Array[Byte](0)
    var idatLen = 0
    var ok = false
    var done = false
    while (!done && bb.remaining() >= 12) {
      val len = bb.getInt
      val typ = new String(Array(bb.get, bb.get, bb.get, bb.get).map(_.toChar))
      typ match {
        case "IHDR" =>
          w = bb.getInt
          h = bb.getInt
          val bitDepth = bb.get
          val colorType = bb.get
          val compression = bb.get
          val filter = bb.get
          val interlace = bb.get
          if (bitDepth != 8 || colorType != 0 || compression != 0 ||
              filter != 0 || interlace != 0) return null
          ok = true
        case "IDAT" =>
          if (idat.length < idatLen + len)
            idat = java.util.Arrays.copyOf(idat,
              math.max(idat.length * 2, idatLen + len))
          bb.get(idat, idatLen, len)
          idatLen += len
        case "IEND" => done = true
        case _ => bb.position(bb.position() + len)
      }
      if (typ != "IHDR") { /* skip crc below */ }
      if (!done) bb.getInt // crc
    }
    if (!ok || w <= 0 || h <= 0) return null
    val inflater = new Inflater()
    inflater.setInput(idat, 0, idatLen)
    val raw = new Array[Byte]((w + 1) * h)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      if (n == 0 && inflater.needsInput()) return null
      off += n
    }
    inflater.end()
    if (off != raw.length) return null
    // defilter
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1))
      val rowIn = y * (w + 1) + 1
      val rowOut = y * w
      f match {
        case 0 => System.arraycopy(raw, rowIn, out, rowOut, w)
        case 1 => // Sub
          var x = 0
          while (x < w) {
            val left = if (x > 0) out(rowOut + x - 1) & 0xFF else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xFF) + left).toByte
            x += 1
          }
        case 2 => // Up
          var x = 0
          while (x < w) {
            val up = if (y > 0) out(rowOut - w + x) & 0xFF else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xFF) + up).toByte
            x += 1
          }
        case 3 => // Average
          var x = 0
          while (x < w) {
            val left = if (x > 0) out(rowOut + x - 1) & 0xFF else 0
            val up = if (y > 0) out(rowOut - w + x) & 0xFF else 0
            out(rowOut + x) =
              ((raw(rowIn + x) & 0xFF) + (left + up) / 2).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < w) {
            val a = if (x > 0) out(rowOut + x - 1) & 0xFF else 0
            val b = if (y > 0) out(rowOut - w + x) & 0xFF else 0
            val c = if (x > 0 && y > 0) out(rowOut - w + x - 1) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(rowOut + x) = ((raw(rowIn + x) & 0xFF) + pred).toByte
            x += 1
          }
        case _ => return null
      }
      y += 1
    }
    (out, w, h)
  }
}
