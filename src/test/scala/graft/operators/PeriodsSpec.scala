package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class PeriodsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private def periods(rows: (Long, Int, Int)*) =
    rows.map { case (k, s, e) => (k, ts(s), ts(e)) }
      .toDF("user_id", "p_start", "p_end")

  test("merge coalesces overlapping and keeps disjoint periods") {
    val df = periods((1L, 0, 10), (1L, 5, 20), (1L, 30, 40), (2L, 0, 5))
    val out = Periods.merge(df, Seq("user_id"), "p_start", "p_end")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSet
    assert(out === Set((1L, 0L, 20L, 2L), (1L, 30L, 40L, 1L),
      (2L, 0L, 5L, 1L)))
  }

  test("merge with gap joins adjacent periods (join_adjacent)") {
    val df = periods((1L, 0, 10), (1L, 12, 20))
    val noGap = Periods.merge(df, Seq("user_id"), "p_start", "p_end")
    assert(noGap.count() === 2)
    val gap = Periods.merge(df, Seq("user_id"), "p_start", "p_end",
      gapSeconds = 180)
    assert(gap.count() === 1)
  }

  test("intersection clips to overlaps and drops disjoint pairs") {
    val a = periods((1L, 0, 10), (1L, 20, 30))
    val b = periods((1L, 5, 25), (1L, 40, 50))
    val out = Periods.intersection(a, b, Seq("user_id"))
      .collect().map(r => (r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000)).toSet
    assert(out === Set((5L, 10L), (20L, 25L)))
  }

  test("containing / belong / cross semantics (half-open periods)") {
    val per = periods((1L, 10, 20))
    val dates = Seq((1L, ts(5)), (1L, ts(10)), (1L, ts(20)), (1L, ts(25)))
      .toDF("user_id", "date")
    val contained = Periods.containing(dates, per, Seq("user_id"), "date")
      .select("date").collect().map(_.getTimestamp(0).getTime / 60000).toSet
    assert(contained === Set(10L)) // start inclusive, end exclusive
    val cross = Periods.crossAPeriod(dates, per, Seq("user_id"), "date")
      .collect().map(r => (r.getTimestamp(1).getTime / 60000,
        r.getBoolean(2))).toMap
    // 5: a period begins after it -> crosses; 10: inside; 20/25: after all
    assert(cross === Map(5L -> true, 10L -> true, 20L -> false,
      25L -> false))
    val belong = Periods.belongToAPeriod(dates, per, Seq("user_id"), "date")
      .collect().map(r => (r.getTimestamp(1).getTime / 60000,
        r.getBoolean(2))).toMap
    assert(belong === Map(5L -> false, 10L -> true, 20L -> false,
      25L -> false))
  }

  test("isClose honors the tolerance on both sides") {
    val per = periods((1L, 10, 20))
    val dates = Seq((1L, ts(8)), (1L, ts(22)), (1L, ts(30)))
      .toDF("user_id", "date")
    val out = Periods.isClose(dates, per, Seq("user_id"), "date",
        toleranceSeconds = 180)
      .collect().map(r => (r.getTimestamp(1).getTime / 60000,
        r.getBoolean(2))).toMap
    assert(out === Map(8L -> true, 22L -> true, 30L -> false))
  }

  test("coveredDuration merges overlap; aggregate sums raw") {
    val df = periods((1L, 0, 10), (1L, 5, 20))
    val r = Periods.coveredDuration(df, Seq("user_id"), "p_start", "p_end")
      .head()
    assert(r.getLong(1) === 20L * 60 * 1000000)      // covered 0..20
    assert(r.getLong(2) === (10L + 15L) * 60 * 1000000) // raw 10 + 15
  }

  test("filterMinDuration keeps strictly longer periods") {
    val df = periods((1L, 0, 10), (1L, 0, 5))
    assert(Periods.filterMinDuration(df, "p_start", "p_end", 300).count()
      === 1)
  }
}
