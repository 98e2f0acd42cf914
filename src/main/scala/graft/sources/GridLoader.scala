package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.Axis
import graft.operators.{Grid2D, Grid3D, Grid4D}

/** CF-convention grid ingestion from long-format columnar tables — the
  * engine's analog of the reference's xarray backend
  * (`/root/reference/pyinterp/backends/xarray.py:582-660` axis
  * identification, `pyinterp/cf.py:28-77` unit sets): each row is one
  * grid cell (coord columns + a value column); axis roles are inferred
  * from column metadata `units` (CF unit names) first, then from
  * conventional column names. Axes must form a regular-or-irregular
  * complete lattice; missing cells become NaN.
  *
  * The lattice VALUES are collected to the driver — a grid is broadcast
  * metadata for the interpolation map stage (same memory contract as the
  * reference's in-memory xarray grids). The contract is ENFORCED: a
  * Catalyst size estimate gates the collect (`maxCollectBytes`, default
  * [[DefaultMaxCollectBytes]]) and oversized lattices fail fast with a
  * pointer to the grid-as-table join path
  * (`GridInterpolator.bivariateTable`), which never leaves the cluster.
  */
object GridLoader {

  private val LonUnits = Set("degrees_east", "degree_east", "degree_e",
    "degrees_e", "degreee", "degreese")
  private val LatUnits = Set("degrees_north", "degree_north", "degree_n",
    "degrees_n", "degreen", "degreesn")
  private val LonNames = Set("lon", "longitude", "x")
  private val LatNames = Set("lat", "latitude", "y")
  private val TimeNames = Set("time", "date", "t", "z")

  final case class AxisRoles(lon: Option[String], lat: Option[String],
                             time: Option[String])

  /** Identify axis roles from `units` metadata, then name heuristics. */
  def identifyAxes(df: DataFrame): AxisRoles = {
    var lon: Option[String] = None
    var lat: Option[String] = None
    var time: Option[String] = None
    df.schema.fields.foreach { f =>
      val units =
        if (f.metadata.contains("units"))
          f.metadata.getString("units").toLowerCase
        else ""
      val name = f.name.toLowerCase
      if (lon.isEmpty && (LonUnits.contains(units) ||
        LonNames.contains(name))) lon = Some(f.name)
      else if (lat.isEmpty && (LatUnits.contains(units) ||
        LatNames.contains(name))) lat = Some(f.name)
      else if (time.isEmpty && (TimeNames.contains(name) ||
        f.dataType.typeName.startsWith("timestamp"))) time = Some(f.name)
    }
    AxisRoles(lon, lat, time)
  }

  /** Distinct sorted coordinate values of several axes in ONE scan
    * (`collect_set` aggregates) — only O(axis length) values reach the
    * driver (the d-th root of the lattice size), never the lattice, and
    * a d-dimensional load costs one pass instead of d distinct+sort
    * jobs over the full table.
    */
  private[graft] def axesOf(df: DataFrame, cols: Seq[String]): Seq[Axis] = {
    val aggs = cols.map(c => collect_set(col(c).cast("double")).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => Axis(row.getSeq[Double](i).toArray.sorted))
  }

  private[graft] def axisOf(df: DataFrame, colName: String): Axis =
    axesOf(df, Seq(colName)).head

  /** Default byte budget for collecting a lattice to the driver (the
    * broadcast-grid contract). Above it [[grid2d]]/[[grid3d]] fail fast —
    * use `GridInterpolator.bivariateTable`, which interpolates via a
    * distributed corner join and never materializes the lattice.
    */
  val DefaultMaxCollectBytes: Long = 256L << 20

  /** Fail fast BEFORE collecting an oversized lattice: the gate uses
    * Catalyst's optimizer size estimate (file statistics — no scan), the
    * same no-count gate as `KnnJoin.useBroadcast`.
    */
  private def gateCollect(df: DataFrame, maxBytes: Long, what: String): Unit = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    require(est <= BigInt(maxBytes),
      s"$what: estimated table size $est B exceeds the driver-collect " +
        s"budget $maxBytes B; this grid is broadcast metadata and must fit " +
        "in driver/executor memory. For larger grids use " +
        "GridInterpolator.bivariateTable (grid-as-table corner join) or " +
        "raise maxCollectBytes explicitly.")
  }

  /** Load a 2-D grid: axis roles inferred, value column given (or the
    * single non-axis numeric column).
    */
  def grid2d(df: DataFrame, valueCol: String = "",
             maxCollectBytes: Long = DefaultMaxCollectBytes): Grid2D = {
    gateCollect(df, maxCollectBytes, "GridLoader.grid2d")
    val roles = identifyAxes(df)
    val lonCol = roles.lon.getOrElse(
      throw new IllegalArgumentException("no longitude/x axis identified"))
    val latCol = roles.lat.getOrElse(
      throw new IllegalArgumentException("no latitude/y axis identified"))
    val vCol =
      if (valueCol.nonEmpty) valueCol
      else df.schema.fields.map(_.name)
        .filterNot(n => n == lonCol || n == latCol).headOption
        .getOrElse(throw new IllegalArgumentException("no value column"))
    val Seq(xAxis, yAxis) = axesOf(df, Seq(lonCol, latCol))
    val nx = xAxis.size
    val ny = yAxis.size
    val vals = Array.fill(nx * ny)(Double.NaN)
    // one narrow pass mapping coordinates to axis indexes (broadcast-free:
    // regular axes index by arithmetic; irregular collect through the
    // Axis binary search inside the closure)
    val rows: Array[Row] = df.select(col(lonCol).cast("double"),
      col(latCol).cast("double"), col(vCol).cast("double")).collect()
    rows.foreach { r =>
      val ix = xAxis.findIndex(bounded = false, coordinate = r.getDouble(0))
      val iy = yAxis.findIndex(bounded = false, coordinate = r.getDouble(1))
      if (ix >= 0 && iy >= 0) vals(ix * ny + iy) = r.getDouble(2)
    }
    Grid2D(xAxis, yAxis, vals)
  }

  /** Load a 3-D grid (lon, lat, time-or-z). */
  def grid3d(df: DataFrame, zColName: String = "",
             valueCol: String = "",
             maxCollectBytes: Long = DefaultMaxCollectBytes): Grid3D = {
    gateCollect(df, maxCollectBytes, "GridLoader.grid3d")
    val roles = identifyAxes(df)
    val lonCol = roles.lon.getOrElse(
      throw new IllegalArgumentException("no longitude/x axis identified"))
    val latCol = roles.lat.getOrElse(
      throw new IllegalArgumentException("no latitude/y axis identified"))
    val zCol =
      if (zColName.nonEmpty) zColName
      else roles.time.getOrElse(
        throw new IllegalArgumentException("no time/z axis identified"))
    val vCol =
      if (valueCol.nonEmpty) valueCol
      else df.schema.fields.map(_.name)
        .filterNot(n => n == lonCol || n == latCol || n == zCol).headOption
        .getOrElse(throw new IllegalArgumentException("no value column"))
    val Seq(xAxis, yAxis, zAxis) = axesOf(df, Seq(lonCol, latCol, zCol))
    val ny = yAxis.size
    val nz = zAxis.size
    val vals = Array.fill(xAxis.size * ny * nz)(Double.NaN)
    df.select(col(lonCol).cast("double"), col(latCol).cast("double"),
        col(zCol).cast("double"), col(vCol).cast("double"))
      .collect().foreach { r =>
        val ix = xAxis.findIndex(bounded = false, coordinate = r.getDouble(0))
        val iy = yAxis.findIndex(bounded = false, coordinate = r.getDouble(1))
        val iz = zAxis.findIndex(bounded = false, coordinate = r.getDouble(2))
        if (ix >= 0 && iy >= 0 && iz >= 0)
          vals((ix * ny + iy) * nz + iz) = r.getDouble(3)
      }
    Grid3D(xAxis, yAxis, zAxis, vals)
  }

  /** 4-D broadcastable grid from a table — the Grid4D analog of
    * [[grid3d]]. The 4th axis has no universal naming convention, so
    * `uColName` is required; z defaults to the time role. Same collect
    * gate and NaN-for-missing-cell semantics; lattices above the gate
    * belong on `GridInterpolator.quadrivariateTable[Windowed]`.
    */
  def grid4d(df: DataFrame, uColName: String, zColName: String = "",
             valueCol: String = "",
             maxCollectBytes: Long = DefaultMaxCollectBytes): Grid4D = {
    gateCollect(df, maxCollectBytes, "GridLoader.grid4d")
    val roles = identifyAxes(df)
    val lonCol = roles.lon.getOrElse(
      throw new IllegalArgumentException("no longitude/x axis identified"))
    val latCol = roles.lat.getOrElse(
      throw new IllegalArgumentException("no latitude/y axis identified"))
    val zCol =
      if (zColName.nonEmpty) zColName
      else roles.time.getOrElse(
        throw new IllegalArgumentException("no time/z axis identified"))
    require(uColName.nonEmpty, "grid4d: name the 4th axis via uColName")
    val vCol =
      if (valueCol.nonEmpty) valueCol
      else df.schema.fields.map(_.name)
        .filterNot(n => n == lonCol || n == latCol || n == zCol ||
          n == uColName).headOption
        .getOrElse(throw new IllegalArgumentException("no value column"))
    val Seq(xAxis, yAxis, zAxis, uAxis) =
      axesOf(df, Seq(lonCol, latCol, zCol, uColName))
    val ny = yAxis.size
    val nz = zAxis.size
    val nu = uAxis.size
    val vals = Array.fill(xAxis.size * ny * nz * nu)(Double.NaN)
    df.select(col(lonCol).cast("double"), col(latCol).cast("double"),
        col(zCol).cast("double"), col(uColName).cast("double"),
        col(vCol).cast("double"))
      .collect().foreach { r =>
        val ix = xAxis.findIndex(bounded = false, coordinate = r.getDouble(0))
        val iy = yAxis.findIndex(bounded = false, coordinate = r.getDouble(1))
        val iz = zAxis.findIndex(bounded = false, coordinate = r.getDouble(2))
        val iu = uAxis.findIndex(bounded = false, coordinate = r.getDouble(3))
        if (ix >= 0 && iy >= 0 && iz >= 0 && iu >= 0)
          vals(((ix * ny + iy) * nz + iz) * nu + iu) = r.getDouble(4)
      }
    Grid4D(xAxis, yAxis, zAxis, uAxis, vals)
  }
}
