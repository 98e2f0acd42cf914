package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1), SEPARATE from the
  * frozen `Bench`: per-query wall times (same `.count()` action and session
  * shape as Bench so numbers are comparable), optional noop-sink isolation
  * (§1.4), and `.explain("formatted")` dumps for plan audits.
  *
  * Usage:
  *   runMain graft.BenchExtra time <reps> [query...]      # min-of-reps count()
  *   runMain graft.BenchExtra noop <reps> [query...]      # noop sink timing
  *   runMain graft.BenchExtra explain <outDir> [query...] # dump plans
  * No query names = all queries. Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
  * like Bench.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = if (args.nonEmpty) args(0) else "time"
    val spark = session(cpus)
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }

    mode match {
      case "explain" =>
        require(args.length >= 2, "usage: explain <outDir> [query...]")
        val outDir = args(1)
        val names = args.drop(2).toSeq match {
          case Nil => SparkEntry.queries.keys.toSeq.sorted
          case xs  => xs
        }
        new java.io.File(outDir).mkdirs()
        names.foreach { name =>
          SparkEntry.queries.get(name).foreach { fn =>
            try {
              val df = fn(spark, sfDir)
              val plan = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              java.nio.file.Files.writeString(
                java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
              System.err.println(s"[explain] wrote $outDir/$name.txt")
            } catch { case e: Throwable =>
              System.err.println(s"[explain] $name FAILED: $e")
            }
          }
        }
      case _ =>
        val reps = if (args.length > 1) args(1).toInt else 2
        val names = args.drop(2).toSeq match {
          case Nil => SparkEntry.queries.keys.toSeq.sorted
          case xs  => xs
        }
        val known = names.filter { n =>
          val ok = SparkEntry.queries.contains(n)
          if (!ok) System.err.println(s"[extra] unknown query $n — skipped")
          ok
        }
        val results = known.map { name =>
          val fn = SparkEntry.queries(name)
          val times = (0 until reps).map { _ =>
            spark.sparkContext.setJobDescription(s"extra:$name")
            val t0 = System.nanoTime()
            try {
              if (mode == "noop")
                fn(spark, sfDir).write.format("noop")
                  .mode("overwrite").save()
              else fn(spark, sfDir).count()
              (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              System.err.println(s"[extra] $name FAILED: $e")
              Double.NaN // a failed run must not masquerade as a fast one
            }
          }
          name -> times
        }
        results.foreach { case (n, ts) =>
          println(f"$n%-28s min=${ts.min}%8.3f  all=${
            ts.map(t => f"$t%.3f").mkString(",")}")
        }
        val tot = results.map(_._2.min).sum
        println(f"TOTAL(min) = $tot%.3f s over ${results.size} queries" +
          (if (tot.isNaN) "  (FAILURES present — total invalid)" else ""))
    }
    spark.stop()
  }
}
