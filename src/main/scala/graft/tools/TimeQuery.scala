package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one SparkEntry query with warmup repetitions, so a
  * query's steady-state cost can be separated from JVM/session cold-start
  * (the per-query loop in Bench is intentionally single-shot/cold).
  *
  * Usage: spark-submit --class graft.tools.TimeQuery <jar> <sfDir> <name> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (r <- 0 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name rep=$r rows=$n sec=$sec%.3f" +
        (if (r == 0) " (cold)" else ""))
    }
    spark.stop()
  }
}
