package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Orbit / ground-track operators
  * (`/root/reference/pyinterp/orbit.py`, satellite track decomposition
  * `geometry/satellite/algorithms/track_decomposition.hpp`):
  *
  *  - [[passDecomposition]]: split an ephemeris into half-orbit passes at
  *    latitude-direction sign changes (`orbit.py:158-163`: pass starts
  *    where dLat flips from >=0 to <0 — i.e. at latitude extrema);
  *    ascending/descending flag per pass.
  *  - [[resampleTrack]]: cubic-spline resampling of the track at a finer
  *    time step, done in ECEF so longitude wrap is a non-issue
  *    (`orbit.py:77-128` behavior).
  *
  * Both are Window/lag pipelines — the "session-ization" shape of
  * SURVEY §2.8 — plus a per-pass mapGroups spline for the resampler.
  */
object Orbit {

  /** Input: (time: long/timestamp-castable, lon, lat) rows of one orbit —
    * or of a whole constellation when `keyCols` names the satellite/track
    * id columns: the windows then partition per key, so no single task
    * ever sorts more than one track (the global-window shape is the
    * documented single-track special case, not the scale path).
    * Output: input + `pass_number` (1-based) + `ascending` flag.
    */
  def passDecomposition(track: DataFrame, timeCol: String = "time",
                        latCol: String = "lat",
                        keyCols: Seq[String] = Seq.empty): DataFrame = {
    val w =
      if (keyCols.isEmpty) Window.orderBy(timeCol)
      else Window.partitionBy(keyCols.map(col): _*).orderBy(timeCol)
    track
      .withColumn("_dlat", col(latCol) - lag(col(latCol), 1).over(w))
      .withColumn("_prev_dlat", lag(col("_dlat"), 1).over(w))
      // new pass where the latitude trend flips sign
      .withColumn("_break",
        when(col("_dlat").isNull, 1) // first row
          .when(col("_prev_dlat").isNotNull &&
            (col("_dlat") >= 0) =!= (col("_prev_dlat") >= 0), 1)
          .otherwise(0))
      .withColumn("pass_number", sum(col("_break"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("ascending", col("_dlat") >= 0 || col("_dlat").isNull)
      .drop("_dlat", "_prev_dlat", "_break")
  }

  /** Resample each pass at `factor`-times finer index spacing using the
    * natural cubic spline in ECEF coordinates; emits
    * (pass_number, idx, lon, lat).
    */
  def resampleTrack(spark: SparkSession, track: DataFrame, factor: Int,
                    timeCol: String = "time", lonCol: String = "lon",
                    latCol: String = "lat"): DataFrame = {
    import spark.implicits._
    val withPass = passDecomposition(track, timeCol, latCol)
    withPass
      .select(col("pass_number").cast("long"),
        col(timeCol).cast("double"), col(lonCol).cast("double"),
        col(latCol).cast("double"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (passNo, it) =>
        val pts = it.toArray.sortBy(_._2)
        if (pts.length < 4) Iterator.empty
        else {
          val ts = pts.map(_._2)
          val ecef = pts.map(p => graft.core.Geodesy.llaToEcef(p._3, p._4, 0.0))
          val sx = graft.core.Univariate1D("c_spline")
          val sy = graft.core.Univariate1D("c_spline")
          val sz = graft.core.Univariate1D("c_spline")
          sx.fit(ts, ecef.map(_._1))
          sy.fit(ts, ecef.map(_._2))
          sz.fit(ts, ecef.map(_._3))
          val n = (pts.length - 1) * factor
          (0 to n).iterator.map { k =>
            val t = ts(0) + (ts(ts.length - 1) - ts(0)) * k / n
            val (lon, lat, _) = graft.core.Geodesy.ecefToLla(
              sx.value(t), sy.value(t), sz.value(t))
            (passNo, t, lon, lat)
          }
        }
      }
      .toDF("pass_number", "t", "lon", "lat")
  }
}
