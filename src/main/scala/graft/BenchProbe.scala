package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: steady-state tile throughput at a given core count.
  * `runMain graft.BenchProbe <cpus> <nImages> <reps>`
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val reps = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.length > 3) args(3) else "full"
    import spark.implicits._
    for (r <- 1 to reps) {
      val images = graft.pipeline.ImageTableGen.generate(spark, n, 32,
        partitions = cpus * 4)
      val t0 = System.nanoTime()
      val count = mode match {
        case "gen" => images.count()
        case "map" => images.flatMap(row =>
          graft.pipeline.TilePipeline.partialTiles(row, 20, 32, "bicubic"))
          .count()
        case _ => graft.pipeline.TilePipeline.tiles(spark, images, 20, 32,
          "bicubic").count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] mode=$mode cpus=$cpus rep=$r n=$count sec=$sec%.2f rate=${count / sec}%.1f")
    }
    spark.stop()
  }
}
