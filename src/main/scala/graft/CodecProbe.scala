package graft

/** Thread-scaling microbench of the image codec + resample kernel,
  * outside Spark: `runMain graft.CodecProbe <threads> <imagesPerThread>`.
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val perThread = args(1).toInt
    val row = graft.pipeline.ImageTableGen.makeRow(7L, 32, 0.0)
    // warm
    (0 until 200).foreach { _ =>
      graft.pipeline.TilePipeline.partialTiles(row, 20, 32, "bicubic").length
    }
    val mode = if (args.length > 2) args(2) else "both"
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      new Thread(() => {
        var i = 0
        while (i < perThread) {
          mode match {
            case "encode" =>
              graft.pipeline.ImageTableGen.makeRow(tid * 100000L + i, 32, 0.0)
            case "decode" =>
              graft.pipeline.TilePipeline.partialTiles(row, 20, 32, "bicubic").size
            case "kernel" =>
              val (px, w, h) = graft.pipeline.ImageCodec.decode(row.bytes)
              val vals = Array.tabulate(w * h)(k => px(k).toDouble)
              val d = new graft.core.DenseBicubic(
                Array.tabulate(w)(_ * 0.016), Array.tabulate(h)(_ * 0.016), vals)
              var s = 0.0
              var j = 0
              while (j < 4096) { s += d(0.2 + (j % 64) * 0.001, 0.2 + (j / 64) * 0.001); j += 1 }
            case _ =>
              val r = graft.pipeline.ImageTableGen.makeRow(tid * 100000L + i, 32, 0.0)
              graft.pipeline.TilePipeline.partialTiles(r, 20, 32, "bicubic").size
          }
          i += 1
        }
      })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    val n = threads * perThread
    println(f"[codec] threads=$threads images=$n sec=$sec%.2f imgs/sec=${n / sec}%.1f")
  }
}
