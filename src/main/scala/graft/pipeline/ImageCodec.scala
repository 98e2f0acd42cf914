package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image encode/decode for the image+caption table (`BASELINE.json.
  * input_hint`): bytes are real PNG (lossless) or JPEG (lossy, PSNR-gated)
  * grayscale rasters, encoded/decoded with the JDK's ImageIO — no native
  * deps, deterministic bytes for fixed input.
  */
object ImageCodec {

  // ImageIO defaults to a disk-backed, lock-guarded stream cache; with 32
  // concurrent decode tasks that serializes on temp-file I/O. Memory
  // streams keep the decode path lock-free and CPU-bound.
  ImageIO.setUseCache(false)

  /** Encode a row-major float field in [0,1] as grayscale w x h. PNG uses
    * the in-repo [[FastPng]] writer (standard output, lock-free); JPEG
    * uses ImageIO.
    */
  def encode(pixels: Array[Float], w: Int, h: Int, fmt: String): Array[Byte] = {
    fmt match {
      case "png" =>
        val bytes = new Array[Byte](w * h)
        var i = 0
        while (i < bytes.length) {
          bytes(i) = math.max(0,
            math.min(255, math.round(pixels(i) * 255f))).toByte
          i += 1
        }
        FastPng.encodeGray8(bytes, w, h)
      case "jpeg" =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val b = math.max(0, math.min(255, math.round(pixels(y * w + x) * 255f)))
            raster.setSample(x, y, 0, b)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(0.95f)
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), params)
        writer.dispose()
        ios.close()
        bos.toByteArray
      case other => throw new IllegalArgumentException(s"fmt $other")
    }
  }

  /** Decode back to floats in [0,1], row-major. Fast path for our own
    * grayscale PNGs; ImageIO for everything else (JPEG, foreign PNGs).
    */
  def decode(bytes: Array[Byte]): (Array[Float], Int, Int) = {
    val fast = FastPng.decodeGray8(bytes)
    if (fast != null) {
      val (gray, w, h) = fast
      val out = new Array[Float](w * h)
      var i = 0
      while (i < out.length) {
        out(i) = (gray(i) & 0xFF) / 255f
        i += 1
      }
      return (out, w, h)
    }
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = raster.getSample(x, y, 0) / 255f
        x += 1
      }
      y += 1
    }
    (out, w, h)
  }

  /** Peak signal-to-noise ratio in dB between two [0,1] rasters. */
  def psnr(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length)
    var mse = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) - b(i)).toDouble
      mse += d * d
      i += 1
    }
    mse /= a.length
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(1.0 / mse)
  }
}
