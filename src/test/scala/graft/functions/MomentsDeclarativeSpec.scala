package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SparkTestSession
import graft.functions.MomentsDeclarativeAgg.stats_agg_fast

class MomentsDeclarativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("declarative moments equal the typed aggregator") {
    val rng = new scala.util.Random(13)
    val rows = Seq.fill(5000)((rng.nextInt(6), rng.nextDouble() * 100 - 20,
      1.0 + rng.nextInt(3)))
    val df = rows.toDF("g", "z", "w").repartition(7)
    val fast = df.groupBy("g")
      .agg(stats_agg_fast(col("z"), col("w")).as("st"))
      .select(col("g"), col("st.count"), col("st.sum_of_weights"),
        col("st.mean"), col("st.min"), col("st.max"), col("st.sum"),
        col("st.m2"), col("st.m3"), col("st.m4"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9))).toMap
    val typed = df.groupBy("g")
      .agg(aggregators.stats_agg(col("z"), col("w")).as("st"))
      .select(col("g"), col("st.count"), col("st.sum_of_weights"),
        col("st.mean"), col("st.min"), col("st.max"), col("st.sum"),
        col("st.variance"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    assert(fast.keySet == typed.keySet)
    fast.foreach { case (g, f) =>
      val t = typed(g)
      assert(f._1 == t._1) // count
      assert(math.abs(f._2 - t._2) < 1e-9) // sumW
      assert(math.abs(f._3 - t._3) < 1e-9, s"mean g=$g") // mean
      assert(f._4 == t._4 && f._5 == t._5) // min max
      assert(math.abs(f._6 - t._6) < 1e-6) // sum
      // variance = m2 / sumW
      assert(math.abs(f._7 / f._2 - t._7) < 1e-6, s"var g=$g")
    }
  }

  test("declarative moments run as codegen'd HashAggregate") {
    val df = spark.range(1000).select((col("id") % 7).as("g"),
      col("id").cast("double").as("z"))
    val agg = df.groupBy("g").agg(stats_agg_fast(col("z"), lit(1.0)))
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("ObjectHashAggregate"), p)
  }

  test("NaN skipped, empty group yields NaN stats") {
    val df = Seq((1, Double.NaN), (1, 2.0), (1, 4.0)).toDF("g", "z")
    val r = df.groupBy("g").agg(stats_agg_fast(col("z"), lit(1.0)).as("st"))
      .select("st.count", "st.mean").head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 3.0)
  }
}
