package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.ImageCodec

/** Video / audio payload operators — the remaining multimodal columns of
  * a training-data pipeline. The container codecs are DELIBERATE
  * deterministic stand-ins (this sandbox ships no media libraries): video
  * is a "GVID" header + length-prefixed PNG frames (real PNG bytes via
  * the in-repo codec), audio is 16-bit little-endian PCM. Everything
  * AROUND the decode — schema, one-to-many frame fan-out, per-partition
  * batch kernels, feature math (FFT spectral centroid over
  * [[graft.core.Fourier]]) — is the real production shape.
  */
object MultimodalOps {

  // ---------- fake-but-real containers ----------

  final case class VideoRow(video_id: String, bytes: Array[Byte],
                            n_frames: Int, w: Int, h: Int, caption: String)
  final case class AudioRow(audio_id: String, bytes: Array[Byte],
                            sample_rate: Int, n_samples: Int,
                            caption: String)

  /** Deterministic multi-frame video: frame f = the image field advanced
    * by f (a moving pattern, so inter-frame motion is nonzero).
    */
  def synthesizeVideos(spark: SparkSession, n: Long, frames: Int,
                       size: Int): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = f"vid$i%09d"
      val frameBytes = (0 until frames).map { f =>
        val px = Array.tabulate(size * size) { k =>
          val x = k % size
          val y = k / size
          graft.pipeline.ImageTableGen.fieldToPixel(
            graft.pipeline.ImageTableGen.field(
              100.0 + (i % 50) * 0.5 + (x + f) * 0.01, (y + f) * 0.01))
        }
        ImageCodec.encode(px, size, size, "png")
      }
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeBytes("GVID")
      out.writeInt(frames)
      frameBytes.foreach { b => out.writeInt(b.length); out.write(b) }
      VideoRow(id, bos.toByteArray, frames, size, size,
        s"synthetic clip $id")
    }
  }

  /** Split a GVID container into its PNG frames. */
  def decodeVideo(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic) == "GVID", "not a GVID container")
    val n = in.readInt()
    (0 until n).map { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      b
    }
  }

  /** Frame sampling: one output row per kept frame (every `everyN`-th),
    * the one-to-many fan-out a video pipeline shuffles on. Emits decoded
    * per-frame stats plus the inter-sample motion (mean |Δpx| vs the
    * previous KEPT frame — computed inside the same pass, no second
    * decode).
    */
  def frameSample(spark: SparkSession, videos: DataFrame, everyN: Int)
      : DataFrame = {
    import spark.implicits._
    videos.select(col("video_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = decodeVideo(bytes)
        var prev: Array[Float] = null
        frames.indices.by(everyN).map { fi =>
          val (px, w, h) = ImageCodec.decode(frames(fi))
          var sum = 0.0
          var k = 0
          while (k < px.length) { sum += px(k); k += 1 }
          val motion =
            if (prev == null) 0.0
            else {
              var m = 0.0
              var t = 0
              while (t < px.length) {
                m += math.abs(px(t) - prev(t)); t += 1
              }
              m / px.length
            }
          prev = px
          (id, fi, w, h, sum / px.length, motion)
        }
      }
      .toDF("video_id", "frame_idx", "w", "h", "px_mean", "motion")
  }

  /** Deterministic PCM audio: two sines + quiet hash noise. */
  def synthesizeAudio(spark: SparkSession, n: Long, sampleRate: Int,
                      nSamples: Int): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = f"aud$i%09d"
      val f1 = 220.0 + (i % 20) * 55.0
      val f2 = f1 * 1.5
      val bytes = new Array[Byte](nSamples * 2)
      var k = 0
      while (k < nSamples) {
        val t = k.toDouble / sampleRate
        val v = 0.6 * math.sin(2 * math.Pi * f1 * t) +
          0.25 * math.sin(2 * math.Pi * f2 * t)
        val s = math.max(-32767, math.min(32767, (v * 32767).toInt)).toShort
        bytes(2 * k) = (s & 0xFF).toByte
        bytes(2 * k + 1) = ((s >> 8) & 0xFF).toByte
        k += 1
      }
      AudioRow(id, bytes, sampleRate, nSamples, s"synthetic tone $id")
    }
  }

  def decodePcm(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length / 2
    val out = new Array[Double](n)
    var k = 0
    while (k < n) {
      val lo = bytes(2 * k) & 0xFF
      val hi = bytes(2 * k + 1).toInt
      out(k) = ((hi << 8) | lo).toShort / 32767.0
      k += 1
    }
    out
  }

  /** Per-clip audio features: RMS, peak, zero-crossing rate, and the FFT
    * spectral centroid (Hz) — one narrow map stage, FFT per row over
    * [[graft.core.Fourier]].
    */
  def audioFeatures(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select(col("audio_id"), col("bytes"),
        col("sample_rate").cast("int"))
      .as[(String, Array[Byte], Int)]
      .map { case (id, bytes, sr) =>
        val x = decodePcm(bytes)
        val n = x.length
        var sumSq = 0.0
        var peak = 0.0
        var zc = 0
        var k = 0
        while (k < n) {
          sumSq += x(k) * x(k)
          val a = math.abs(x(k))
          if (a > peak) peak = a
          if (k > 0 && (x(k) >= 0) != (x(k - 1) >= 0)) zc += 1
          k += 1
        }
        val rms = math.sqrt(sumSq / n)
        val zcr = zc.toDouble / n * sr / 2.0 // approx dominant frequency
        // spectral centroid over the POWER spectrum (magnitude weighting
        // is dominated by windowing-leakage sidelobes)
        val re = x.clone()
        val im = new Array[Double](n)
        graft.core.Fourier.fft(re, im, invert = false)
        var num = 0.0
        var den = 0.0
        var b = 1
        while (b < n / 2) {
          val pw = re(b) * re(b) + im(b) * im(b)
          num += pw * (b.toDouble * sr / n)
          den += pw
          b += 1
        }
        val centroid = if (den > 0) num / den else 0.0
        (id, rms, peak, zcr, centroid)
      }
      .toDF("audio_id", "rms", "peak", "zcr_freq", "spectral_centroid")
  }
}
