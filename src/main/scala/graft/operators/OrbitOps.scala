package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.OrbitEphemeris
import graft.core.OrbitEphemeris.OrbitModel

/** Distributed faces of the orbit module. The OrbitModel (one repeat
  * cycle, 10^4-10^5 nadir points) is driver-scale metadata broadcast to
  * executors; the distributed axes are PASSES and swath pixels — each
  * pass expands independently, so a full constellation/cycle fan-out is
  * one narrow flatMap with no shuffle.
  */
object OrbitOps {

  /** Upper bound on ephemeris rows accepted by [[orbitFromEphemeris]]:
    * a repeat cycle sampled at 1 Hz is under 2.1 M points (SWOT: 21 days);
    * anything larger is not one satellite cycle and would OOM the driver
    * before the mistake is comprehensible.
    */
  val MaxEphemerisRows: Int = 4000000

  /** Build the orbit model from an ephemeris DataFrame of
    * (time_s, lon, lat) rows — collected: an ephemeris is one satellite
    * cycle, bounded by physics, not data volume. The collect is CAPPED
    * (limit cap+1, same pattern as KnnJoin.collectCapped): a malformed
    * billion-row "ephemeris" fails fast with a clear message instead of
    * an opaque driver OOM.
    */
  def orbitFromEphemeris(spark: SparkSession, ephemeris: DataFrame,
                         height: Double,
                         alongTrackResolutionKm: Double = 2.0): OrbitModel = {
    import spark.implicits._
    val rows = ephemeris.select(col("time_s").cast("double"),
        col("lon").cast("double"), col("lat").cast("double"))
      .as[(Double, Double, Double)].limit(MaxEphemerisRows + 1).collect()
      .sortBy(_._1)
    require(rows.length <= MaxEphemerisRows,
      s"ephemeris has more than $MaxEphemerisRows rows — an orbit model " +
        "is ONE satellite repeat cycle (10^4-10^6 nadir points); this " +
        "table is not an ephemeris. Aggregate or filter it first.")
    OrbitEphemeris.calculateOrbit(height, rows.map(_._2), rows.map(_._3),
      rows.map(_._1),
      alongTrackResolutionKm = alongTrackResolutionKm)
  }

  /** One row per pass: pass number, point count, equator crossing. */
  def passCatalog(spark: SparkSession, orbit: OrbitModel): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(orbit)
    spark.range(1, orbit.passesPerCycle + 1)
      .as[Long]
      .flatMap { p =>
        OrbitEphemeris.calculatePass(p.toInt, bc.value).map { pd =>
          (pd.passNumber, pd.lonNadir.length, pd.equatorLon, pd.equatorTime)
        }
      }
      .toDF("pass_number", "n_points", "equator_lon", "equator_time")
  }

  /** Swath pixel table: one row per (pass, line, pixel) — the flat
    * relational face of calculate_swath, distributed over passes.
    */
  def swathPoints(spark: SparkSession, orbit: OrbitModel,
                  acrossTrackResolutionKm: Double = 2.0,
                  halfSwathKm: Double = 70.0, halfGapKm: Double = 2.0,
                  insertCentralPixel: Boolean = false,
                  requirementBounds: Option[(Double, Double)] = None)
      : DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(orbit)
    val rows = spark.range(1, orbit.passesPerCycle + 1)
      .as[Long]
      .flatMap { p =>
        OrbitEphemeris.calculatePass(p.toInt, bc.value) match {
          case None => Iterator.empty
          case Some(pd) =>
            val (lon, lat, xAc) = OrbitEphemeris.calculateSwath(pd,
              acrossTrackResolutionKm, halfSwathKm, halfGapKm)
            val half = xAc.length / 2
            val swath = for {
              i <- lon.indices.iterator
              j <- lon(i).indices.iterator
            } yield (pd.passNumber,
              i, if (insertCentralPixel && j >= half) j + 1 else j,
              lon(i)(j), lat(i)(j), xAc(j), pd.xAl(i), pd.time(i))
            // Swath.insert_central_pixel (`orbit.py:479-522`): a nadir
            // column at x_ac = 0 splits the swath into its two halves
            val central =
              if (!insertCentralPixel) Iterator.empty
              else pd.lonNadir.indices.iterator.map(i =>
                (pd.passNumber, i, half, pd.lonNadir(i), pd.latNadir(i),
                  0.0, pd.xAl(i), pd.time(i)))
            swath ++ central
        }
      }
      .toDF("pass_number", "line", "pixel", "lon", "lat", "x_ac", "x_al",
        "time_s")
    // Swath.mask (`orbit.py:456-478`): keep pixels whose |x_ac| is within
    // the mission requirement bounds (the central pixel survives only
    // when the lower bound is 0)
    requirementBounds match {
      case Some((lo, hi)) =>
        rows.filter(abs(col("x_ac")) >= lo && abs(col("x_ac")) <= hi)
      case None => rows
    }
  }
}
