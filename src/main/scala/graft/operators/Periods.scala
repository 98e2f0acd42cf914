package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Period / PeriodList algebra (`/root/reference/cxx/include/pyinterp/
  * period.hpp:20-493`) over period TABLES — each row one [start, end)
  * half-open period, optionally keyed (per user / per satellite):
  *
  *  - [[merge]]: union of overlapping-or-adjacent periods (PeriodList
  *    merge/join_adjacent, with a configurable adjacency gap);
  *  - [[intersection]]: pairwise intersections of two period tables
  *    (Period::intersection, null periods dropped);
  *  - [[containing]]: find_containing for a date table (inner join —
  *    dates with no containing period drop out);
  *  - [[isClose]]: Period::is_close with tolerance, aggregated over the
  *    list (PeriodList::is_close);
  *  - [[crossAPeriod]]: PeriodList::cross_a_period — a date crosses iff
  *    it falls inside a period OR some period begins at/after it and at
  *    or before the last input date;
  *  - [[belongToAPeriod]]: containment flag per date;
  *  - [[coveredDuration]]: per-key total covered duration after merge
  *    (PeriodList::duration) and raw sum (aggregate_duration);
  *  - [[filterMinDuration]]: PeriodList::filter_min_duration.
  *
  * Everything is plain Catalyst (window + equi-join + aggregate): the
  * per-key windows shuffle once on the key; keyless tables should pass a
  * coarse time-bucket column as the key to keep the sort distributed.
  */
object Periods {

  /** Union of overlapping or gap-adjacent periods per key.
    * Input columns: keyCols ++ (startCol, endCol). Output: key, p_start,
    * p_end, n_merged.
    */
  def merge(df: DataFrame, keyCols: Seq[String], startCol: String,
            endCol: String, gapSeconds: Long = 0L): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    // gap 0 compares the raw ordered type (keeps sub-second timestamp
    // resolution and works for numeric periods); gap > 0 needs timestamps
    val boundary =
      if (gapSeconds == 0L) col("_prev_max")
      else col("_prev_max") + expr(s"INTERVAL $gapSeconds SECONDS")
    val marked = df
      .withColumn("_prev_max", max(col(endCol))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new", when(col("_prev_max").isNull ||
        col(startCol) > boundary, 1).otherwise(0))
      .withColumn("_grp", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy((keyCols.map(col) :+ col("_grp")): _*)
      .agg(min(col(startCol)).as("p_start"), max(col(endCol)).as("p_end"),
        count(lit(1)).as("n_merged"))
      .select((keyCols.map(col) ++ Seq(col("p_start"), col("p_end"),
        col("n_merged"))): _*)
  }

  /** Pairwise intersections of two keyed period tables; disjoint pairs
    * (null intersections) are dropped (`period.hpp:96-105`).
    */
  def intersection(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                   startCol: String = "p_start", endCol: String = "p_end")
      : DataFrame = {
    val l = a.select((keyCols.map(col) :+ col(startCol).as("_s1") :+
      col(endCol).as("_e1")): _*)
    val r = b.select((keyCols.map(col) :+ col(startCol).as("_s2") :+
      col(endCol).as("_e2")): _*)
    l.join(r, keyCols)
      .select((keyCols.map(col) :+
        greatest(col("_s1"), col("_s2")).as("p_start") :+
        least(col("_e1"), col("_e2")).as("p_end")): _*)
      .filter(col("p_start") < col("p_end"))
  }

  /** For each date row, the containing period (inner join; half-open
    * [start, end)). Output: date table columns ++ (p_start, p_end).
    */
  def containing(dates: DataFrame, periods: DataFrame, keyCols: Seq[String],
                 dateCol: String, startCol: String = "p_start",
                 endCol: String = "p_end"): DataFrame =
    dates.join(periods, keyCols)
      .filter(col(dateCol) >= col(startCol) && col(dateCol) < col(endCol))

  /** PeriodList::is_close per date: true when the date is within
    * `toleranceSeconds` of any period of its key.
    */
  def isClose(dates: DataFrame, periods: DataFrame, keyCols: Seq[String],
              dateCol: String, toleranceSeconds: Long,
              startCol: String = "p_start", endCol: String = "p_end")
      : DataFrame = {
    val joined = dates.join(periods, keyCols)
      .withColumn("_hit",
        when(col(dateCol).cast("long") >=
          col(startCol).cast("long") - toleranceSeconds &&
          col(dateCol).cast("long") <=
            col(endCol).cast("long") + toleranceSeconds, 1).otherwise(0))
    joined.groupBy((keyCols.map(col) :+ col(dateCol)): _*)
      .agg((max(col("_hit")) === 1).as("is_close"))
  }

  /** PeriodList::cross_a_period (`period.hpp:240-255` semantics): a date
    * crosses iff it is inside some period OR at least one period begins
    * at/after it and at/before the LAST input date of its key.
    */
  def crossAPeriod(dates: DataFrame, periods: DataFrame, keyCols: Seq[String],
                   dateCol: String, startCol: String = "p_start",
                   endCol: String = "p_end"): DataFrame = {
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val withLast = dates.withColumn("_last", max(col(dateCol)).over(wAll))
    val joined = withLast.join(periods, keyCols)
      .withColumn("_inside",
        when(col(dateCol) >= col(startCol) && col(dateCol) < col(endCol), 1)
          .otherwise(0))
      .withColumn("_ahead",
        when(col(startCol) >= col(dateCol) && col(startCol) <= col("_last"),
          1).otherwise(0))
    joined.groupBy((keyCols.map(col) :+ col(dateCol)): _*)
      .agg((max(col("_inside")) === 1 || max(col("_ahead")) === 1)
        .as("crosses"))
  }

  /** Containment flag per date (belong_to_a_period). */
  def belongToAPeriod(dates: DataFrame, periods: DataFrame,
                      keyCols: Seq[String], dateCol: String,
                      startCol: String = "p_start",
                      endCol: String = "p_end"): DataFrame = {
    val joined = dates.join(periods, keyCols)
      .withColumn("_inside",
        when(col(dateCol) >= col(startCol) && col(dateCol) < col(endCol), 1)
          .otherwise(0))
    joined.groupBy((keyCols.map(col) :+ col(dateCol)): _*)
      .agg((max(col("_inside")) === 1).as("belongs"))
  }

  /** Per-key durations: covered (after merging overlaps — PeriodList::
    * duration) and aggregate (raw sum — aggregate_duration), in seconds.
    */
  def coveredDuration(df: DataFrame, keyCols: Seq[String], startCol: String,
                      endCol: String): DataFrame = {
    // cast: inputs are commonly TIMESTAMP_NTZ; the session runs UTC so
    // the ntz->ltz cast is the identity wall time
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val merged = merge(df, keyCols, startCol, endCol)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(us(col("p_end")) - us(col("p_start"))).as("covered_us"))
    val raw = df.groupBy(keyCols.map(col): _*)
      .agg(sum(us(col(endCol)) - us(col(startCol))).as("aggregate_us"))
    merged.join(raw, keyCols)
  }

  /** filter_min_duration: keep periods strictly longer than the bound. */
  def filterMinDuration(df: DataFrame, startCol: String, endCol: String,
                        minSeconds: Long): DataFrame =
    df.filter(col(endCol).cast("long") - col(startCol).cast("long") >
      minSeconds)
}
