package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{array, coalesce, col, collect_list,
  count, explode, floor, least, lit, monotonically_increasing_id, pmod,
  round, struct, sum, when}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.core.{Axis, Bicubic, Boundary, Interpolate}

/** Dense 2-D grid (x-major storage) + its axes — the broadcastable analog
  * of the reference Grid2D (`/root/reference/cxx/include/pyinterp/pybind/
  * grid.hpp:184-342`). `values(i * ny + j)` is z(x_i, y_j).
  */
final case class Grid2D(xAxis: Axis, yAxis: Axis, values: Array[Double])
    extends Serializable {
  require(values.length == xAxis.size.toLong * yAxis.size,
    s"grid size ${values.length} != ${xAxis.size}x${yAxis.size}")
  @inline def apply(i: Int, j: Int): Double = values(i * yAxis.size + j)
}

/** 1-D grid (`core.Grid` with one axis): the `univariate` /
  * `univariate_derivative` entry points' data model.
  */
final case class Grid1D(axis: Axis, values: Array[Double])
    extends Serializable {
  require(values.length == axis.size, "grid size != axis size")
}

/** 3-D grid: z-axis stacked planes of Grid2D (z may be a temporal axis
  * carried as epoch-encoded doubles).
  */
final case class Grid3D(xAxis: Axis, yAxis: Axis, zAxis: Axis,
                        values: Array[Double]) extends Serializable {
  @inline def apply(i: Int, j: Int, k: Int): Double =
    values((i.toLong * yAxis.size * zAxis.size + j.toLong * zAxis.size + k).toInt)
  def plane(k: Int): (Int, Int) => Double = (i, j) => apply(i, j, k)
}

/** 4-D grid (x, y, z, u) — u typically a level axis, z possibly temporal
  * (`pyinterp/core/__init__.pyi:599-611` Grid4D shape).
  */
final case class Grid4D(xAxis: Axis, yAxis: Axis, zAxis: Axis, uAxis: Axis,
                        values: Array[Double]) extends Serializable {
  @inline def apply(i: Int, j: Int, k: Int, l: Int): Double =
    values((((i.toLong * yAxis.size + j) * zAxis.size + k) *
      uAxis.size + l).toInt)
  /** 3-D sub-grid at u index l. */
  def cube(l: Int): Grid3D = {
    val vals = new Array[Double](xAxis.size * yAxis.size * zAxis.size)
    var i = 0
    while (i < xAxis.size) {
      var j = 0
      while (j < yAxis.size) {
        var k = 0
        while (k < zAxis.size) {
          vals((i * yAxis.size + j) * zAxis.size + k) = apply(i, j, k, l)
          k += 1
        }
        j += 1
      }
      i += 1
    }
    Grid3D(xAxis, yAxis, zAxis, vals)
  }
}

/** Grid interpolation as a shuffle-free map stage: the grid is broadcast
  * once per executor and each partition runs the per-thread kernel loop of
  * the reference (`parallel_for` chunk ≙ partition,
  * `pybind/windowed/bivariate.hpp:96-112`). Appends a `value` double
  * column (NaN when the point cannot be framed).
  *
  * Methods: geometric {bilinear, idw, nearest}
  * (`math/interpolate/geometric/bivariate.hpp`) and windowed {bicubic,
  * spline-bilinear} (`math/interpolate/bivariate/bicubic.hpp`) with the
  * reference default half-window of 3 (6x6) and undef|shrink boundaries
  * (`pyinterp/regular_grid_interpolator.py:66-79`).
  */
object GridInterpolator {

  private val geometricMethods = Set("bilinear", "idw", "nearest")

  def bivariate(spark: SparkSession, df: DataFrame, xCol: String, yCol: String,
                grid: Grid2D, method: String, halfWindow: Int = 3,
                boundary: Boundary.Value = Boundary.Undef,
                outputCol: String = "value",
                sortProbes: Boolean = true): DataFrame = {
    val bc: Broadcast[Grid2D] = spark.sparkContext.broadcast(grid)
    // windowed methods keep a per-window cache (fits reused across probes
    // in the same 6x6 window); a PARTITION-LOCAL sort by grid cell turns
    // scattered probes into runs of cache hits — no shuffle, and at scale
    // the O(p log p) per-task sort is far cheaper than per-row refits
    val input =
      if (!sortProbes || geometricMethods.contains(method)) df
      else if (grid.xAxis.isRegular && grid.yAxis.isRegular)
        df.sortWithinPartitions(
          floor((col(xCol) - lit(grid.xAxis.front)) / lit(grid.xAxis.step)),
          floor((col(yCol) - lit(grid.yAxis.front)) / lit(grid.yAxis.step)))
      else df.sortWithinPartitions(col(xCol), col(yCol))
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, DoubleType, nullable = false))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val xIdx = df.schema.fieldIndex(xCol)
    val yIdx = df.schema.fieldIndex(yCol)
    val m = method
    val hw = halfWindow
    val bdy = boundary
    input.mapPartitions { iter =>
      val g = bc.value
      val interp = new BivariateKernel(g, m, hw, bdy)
      iter.map { row =>
        val x = row.getDouble(xIdx)
        val y = row.getDouble(yIdx)
        Row.fromSeq(row.toSeq :+ interp(x, y))
      }
    }(enc)
  }

  /** Pins the synthetic probe row id BEFORE the plan branches (r3 ADVICE,
    * medium): `monotonically_increasing_id` is nondeterministic, so when
    * the id-stamped probe is evaluated once under the corner->agg branch
    * and again under the final left join, a task retry / speculative
    * re-execution / shuffled upstream could assign DIFFERENT ids in the
    * two branches — silently pairing interpolated values with the wrong
    * probe rows. `localCheckpoint` materializes the stamped rows once
    * (executor-local blocks, lineage truncated), so every branch reads the
    * SAME ids; a lost block then fails the job loudly instead of
    * corrupting it.
    */
  private def withStableId(df: DataFrame): DataFrame =
    df.withColumn("_rid", monotonically_increasing_id()).localCheckpoint()

  /** Axis-role + value-column resolution shared by the grid-as-table
    * paths: only the O(nx + ny) distinct axis values reach the driver.
    */
  private def resolveGrid2dTable(gridTable: DataFrame, valueCol: String)
      : (String, String, String, Axis, Axis) = {
    import graft.sources.GridLoader
    val roles = GridLoader.identifyAxes(gridTable)
    val lonCol = roles.lon.getOrElse(
      throw new IllegalArgumentException("no longitude/x axis identified"))
    val latCol = roles.lat.getOrElse(
      throw new IllegalArgumentException("no latitude/y axis identified"))
    val vCol =
      if (valueCol.nonEmpty) valueCol
      else gridTable.schema.fields.map(_.name)
        .filterNot(n => n == lonCol || n == latCol).headOption
        .getOrElse(throw new IllegalArgumentException("no value column"))
    val Seq(xAxis, yAxis) = GridLoader.axesOf(gridTable, Seq(lonCol, latCol))
    (lonCol, latCol, vCol, xAxis, yAxis)
  }

  /** Grid-as-table bilinear interpolation — the big-grid path (SURVEY
    * §1.1 row 3; reference behavior `pybind/geometric/bivariate.hpp:
    * 48-97` over grids the reference memory-maps,
    * `pyinterp/backends/xarray.py:582-688`): the lattice is NEVER
    * collected or broadcast. Axis roles are inferred like `GridLoader`;
    * only the O(nx + ny) distinct axis values reach the driver. Each probe
    * row fans out to its 4 bracketing corners (pure column arithmetic), a
    * shuffle equi-join on the (ix, iy) corner key pulls the corner values
    * from the cell table, and a groupBy reassembles sum(w·z) — two keyed
    * shuffles, no driver state, AQE-skew-safe. Probes outside the axes, or
    * probes with a masked/missing corner cell, yield NaN — the broadcast
    * path's semantics.
    *
    * Accepts regular ascending axes (pure column-arithmetic cell keys),
    * IRREGULAR ascending axes (the axis value arrays — O(nx + ny), the
    * d-th root of the lattice — are broadcast and the bracket comes from
    * the same `Axis.findIndexes` binary search as the broadcast kernel;
    * the join plan is identical), and a GLOBAL lon-periodic lattice —
    * the single most common huge grid — declared by `xPeriod`
    * (e.g. 360.0): the lattice must cover the full circle
    * (nx·step = period), probe coordinates normalize into the period
    * (`math/axis.hpp:294-333` semantics), the x bracket never rejects,
    * and the seam cell's right corners wrap to lattice column 0
    * (`findIndexes` wrap, `axis.hpp:722-778`).
    */
  def bivariateTable(spark: SparkSession, probe: DataFrame, xCol: String,
                     yCol: String, gridTable: DataFrame,
                     valueCol: String = "",
                     outputCol: String = "value",
                     xPeriod: Double = 0.0): DataFrame = {
    val (lonCol, latCol, vCol, xAxis, yAxis) =
      resolveGrid2dTable(gridTable, valueCol)
    require(xAxis.size >= 2 && yAxis.size >= 2 &&
      !xAxis.isPeriodic && !yAxis.isPeriodic &&
      xAxis.front < xAxis.back && yAxis.front < yAxis.back,
      "bivariateTable requires ascending axes of >= 2 nodes")
    val periodic = xPeriod != 0.0
    val regular = xAxis.isRegular && yAxis.isRegular
    require(regular || !periodic,
      "xPeriod requires a regular full-circle lattice")
    val nx = xAxis.size
    if (periodic) require(
      math.abs(nx * xAxis.step - xPeriod) <= 1e-6 * xAxis.step,
      s"xPeriod=$xPeriod requires a full-circle lattice: nx*step = " +
        s"${nx * xAxis.step}")

    val withId = withStableId(probe)
    val (cells, corners) =
      if (regular) regularCorners2d(withId, gridTable, xCol, yCol, lonCol,
        latCol, vCol, xAxis, yAxis, periodic)
      else irregularCorners2d(spark, withId, gridTable, xCol, yCol, lonCol,
        latCol, vCol, xAxis, yAxis)
    // inner corner join + 4-corner completeness check: a masked cell
    // (absent lattice row) NaNs the probe, like the dense grid's NaN cells
    val agg = corners.join(cells, Seq("_ci", "_cj"))
      .groupBy("_rid")
      .agg(sum(col("_w") * col("_z")).as("_v"), count(lit(1)).as("_n"))
      .select(col("_rid"),
        when(col("_n") === 4, col("_v")).otherwise(lit(Double.NaN)).as("_v"))
    withId.join(agg, Seq("_rid"), "left")
      .withColumn(outputCol, coalesce(col("_v"), lit(Double.NaN)))
      .drop("_rid", "_v")
  }

  /** Regular-axis corner fan-out of [[bivariateTable]]: affine cell keys
    * and bracket — pure column arithmetic, fully codegen.
    */
  private def regularCorners2d(withId: DataFrame, gridTable: DataFrame,
                               xCol: String, yCol: String, lonCol: String,
                               latCol: String, vCol: String,
                               xAxis: Axis, yAxis: Axis, periodic: Boolean)
      : (DataFrame, DataFrame) = {
    val nx = xAxis.size
    // distributed cell table keyed by integer lattice indices
    val cells = gridTable.select(
      round((col(lonCol).cast("double") - lit(xAxis.front)) /
        lit(xAxis.step)).cast("int").as("_ci"),
      round((col(latCol).cast("double") - lit(yAxis.front)) /
        lit(yAxis.step)).cast("int").as("_cj"),
      col(vCol).cast("double").as("_z"))
    val fxRaw = (col(xCol).cast("double") - lit(xAxis.front)) / lit(xAxis.step)
    // periodic: normalize into [0, nx) cell units — every x frames
    val fx = if (periodic) pmod(fxRaw, lit(nx.toDouble)) else fxRaw
    val fy = (col(yCol).cast("double") - lit(yAxis.front)) / lit(yAxis.step)
    // right-edge-inclusive bracket (findIndexes semantics); out-of-range
    // probes emit no corner rows and surface as NaN after the left join.
    // Periodic x: a probe exactly on the LAST node brackets (nx-2, nx-1)
    // like findIndexes' delta==0 collapse; past it, (nx-1, wrap-to-0).
    val i0 =
      if (periodic)
        when(col("_fx") === lit((nx - 1).toDouble), lit(nx - 2))
          .otherwise(floor(col("_fx")).cast("int")).cast("int")
      else least(floor(col("_fx")).cast("int"), lit(nx - 2))
    val pAll = withId
      .withColumn("_fx", fx).withColumn("_fy", fy)
      .withColumn("_i0", i0)
      .withColumn("_j0",
        least(floor(col("_fy")).cast("int"), lit(yAxis.size - 2)))
      .withColumn("_tx", col("_fx") - col("_i0"))
      .withColumn("_ty", col("_fy") - col("_j0"))
    val yFrame = col("_fy") >= 0.0 &&
      col("_fy") <= lit((yAxis.size - 1).toDouble)
    val p =
      if (periodic) pAll.filter(yFrame)
      else pAll.filter(col("_fx") >= 0.0 &&
        col("_fx") <= lit((nx - 1).toDouble) && yFrame)
    // seam wrap of the right corner column (periodic only)
    def ciOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (periodic) pmod(c, lit(nx)) else c
    val corners = p.select(col("_rid"), explode(array(
        struct(col("_i0").as("_ci"), col("_j0").as("_cj"),
          ((lit(1.0) - col("_tx")) * (lit(1.0) - col("_ty"))).as("_w")),
        struct(col("_i0").as("_ci"), (col("_j0") + 1).as("_cj"),
          ((lit(1.0) - col("_tx")) * col("_ty")).as("_w")),
        struct(ciOf(col("_i0") + 1).as("_ci"), col("_j0").as("_cj"),
          (col("_tx") * (lit(1.0) - col("_ty"))).as("_w")),
        struct(ciOf(col("_i0") + 1).as("_ci"), (col("_j0") + 1).as("_cj"),
          (col("_tx") * col("_ty")).as("_w")))).as("_c"))
      .select(col("_rid"), col("_c._ci").as("_ci"), col("_c._cj").as("_cj"),
        col("_c._w").as("_w"))
    (cells, corners)
  }

  /** Irregular-axis corner fan-out of [[bivariateTable]]: the axis value
    * arrays (O(nx + ny) — the d-th root of the lattice, NOT the lattice)
    * are broadcast, cell keys come from `Axis.findIndex` and probe
    * brackets + weights from the SAME `Axis.findIndexes` binary search
    * and (x − x0)/(x1 − x0) arithmetic as the broadcast geometric kernel
    * (`container.hpp:383-404` lower_bound semantics) — so table ≡
    * broadcast on irregular lattices too. The downstream join plan is
    * byte-identical to the regular path.
    */
  private def irregularCorners2d(spark: SparkSession, withId: DataFrame,
                                 gridTable: DataFrame, xCol: String,
                                 yCol: String, lonCol: String,
                                 latCol: String, vCol: String,
                                 xAxis: Axis, yAxis: Axis)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val bcX = spark.sparkContext.broadcast(xAxis)
    val bcY = spark.sparkContext.broadcast(yAxis)
    val cells = gridTable.select(col(lonCol).cast("double"),
        col(latCol).cast("double"), col(vCol).cast("double"))
      .as[(Double, Double, Double)]
      .flatMap { case (x, y, z) =>
        val ci = bcX.value.findIndex(x, bounded = false)
        val cj = bcY.value.findIndex(y, bounded = false)
        if (ci >= 0 && cj >= 0) Iterator.single((ci, cj, z))
        else Iterator.empty
      }.toDF("_ci", "_cj", "_z")
    val corners = withId.select(col("_rid"),
        col(xCol).cast("double").as("_x"), col(yCol).cast("double").as("_y"))
      .as[(Long, Double, Double)]
      .flatMap { case (rid, x, y) =>
        val ax = bcX.value
        val ay = bcY.value
        (ax.findIndexes(x), ay.findIndexes(y)) match {
          case (Some((i0, i1)), Some((j0, j1))) =>
            val x0 = ax(i0); val x1 = ax(i1)
            val y0 = ay(j0); val y1 = ay(j1)
            val tx = if (x1 == x0) 0.0 else (x - x0) / (x1 - x0)
            val ty = if (y1 == y0) 0.0 else (y - y0) / (y1 - y0)
            Iterator((rid, i0, j0, (1 - tx) * (1 - ty)),
              (rid, i0, j1, (1 - tx) * ty),
              (rid, i1, j0, tx * (1 - ty)),
              (rid, i1, j1, tx * ty))
          case _ => Iterator.empty
        }
      }.toDF("_rid", "_ci", "_cj", "_w")
    (cells, corners)
  }

  /** 3-D grid-as-table trilinear interpolation: [[bivariateTable]]'s
    * corner join extended to the 8 bracketing lattice corners (bilinear in
    * (x, y) × linear in z — the geometric trivariate semantics,
    * `pybind/geometric/trivariate.hpp:46-120`). Same scale contract: the
    * lattice never leaves the cluster.
    */
  /** Axis-role + value-column resolution for the 3-D grid-as-table paths
    * (shared by [[trivariateTable]] and [[trivariateTableWindowed]]).
    */
  private def resolveGrid3dTable(gridTable: DataFrame, zColName: String,
                                 valueCol: String, caller: String)
      : (String, String, String, String, Axis, Axis, Axis) = {
    import graft.sources.GridLoader
    val roles = GridLoader.identifyAxes(gridTable)
    val lonCol = roles.lon.getOrElse(
      throw new IllegalArgumentException("no longitude/x axis identified"))
    val latCol = roles.lat.getOrElse(
      throw new IllegalArgumentException("no latitude/y axis identified"))
    val zName =
      if (zColName.nonEmpty) zColName
      else roles.time.getOrElse(
        throw new IllegalArgumentException("no time/z axis identified"))
    val vCol =
      if (valueCol.nonEmpty) valueCol
      else gridTable.schema.fields.map(_.name)
        .filterNot(n => n == lonCol || n == latCol || n == zName).headOption
        .getOrElse(throw new IllegalArgumentException("no value column"))
    val axes = GridLoader.axesOf(gridTable, Seq(lonCol, latCol, zName))
    require(axes.forall(a => a.size >= 2 && !a.isPeriodic &&
      a.front < a.back),
      s"$caller requires ascending non-periodic axes of >= 2 nodes")
    (lonCol, latCol, zName, vCol, axes(0), axes(1), axes(2))
  }

  def trivariateTable(spark: SparkSession, probe: DataFrame, xCol: String,
                      yCol: String, zCol: String, gridTable: DataFrame,
                      zColName: String = "", valueCol: String = "",
                      outputCol: String = "value",
                      xPeriod: Double = 0.0): DataFrame = {
    val (lonCol, latCol, zName, vCol, xAxis, yAxis, zAxis) =
      resolveGrid3dTable(gridTable, zColName, valueCol, "trivariateTable")
    val regular = xAxis.isRegular && yAxis.isRegular && zAxis.isRegular
    // periodic longitude: [[bivariateTable]]'s seam mechanics — pmod
    // probe normalization, x frame never rejects, right corners wrap
    val periodic = xPeriod != 0.0
    require(regular || !periodic,
      "xPeriod requires a regular full-circle lattice")
    val nx = xAxis.size
    if (periodic) require(
      math.abs(nx * xAxis.step - xPeriod) <= 1e-6 * xAxis.step,
      s"xPeriod=$xPeriod requires a full-circle lattice: nx*step = " +
        s"${nx * xAxis.step}")

    val withId = withStableId(probe)
    val (cells, corners) = if (regular) {
      val cellsR = gridTable.select(
        round((col(lonCol).cast("double") - lit(xAxis.front)) /
          lit(xAxis.step)).cast("int").as("_ci"),
        round((col(latCol).cast("double") - lit(yAxis.front)) /
          lit(yAxis.step)).cast("int").as("_cj"),
        round((col(zName).cast("double") - lit(zAxis.front)) /
          lit(zAxis.step)).cast("int").as("_ck"),
        col(vCol).cast("double").as("_z"))
      def frac(c: String, a: graft.core.Axis) =
        (col(c).cast("double") - lit(a.front)) / lit(a.step)
      val fx =
        if (periodic) pmod(frac(xCol, xAxis), lit(nx.toDouble))
        else frac(xCol, xAxis)
      val i0 =
        if (periodic)
          when(col("_fx") === lit((nx - 1).toDouble), lit(nx - 2))
            .otherwise(floor(col("_fx")).cast("int")).cast("int")
        else least(floor(col("_fx")).cast("int"), lit(nx - 2))
      val pAll = withId
        .withColumn("_fx", fx)
        .withColumn("_fy", frac(yCol, yAxis))
        .withColumn("_fz", frac(zCol, zAxis))
        .withColumn("_i0", i0)
        .withColumn("_j0",
          least(floor(col("_fy")).cast("int"), lit(yAxis.size - 2)))
        .withColumn("_k0",
          least(floor(col("_fz")).cast("int"), lit(zAxis.size - 2)))
        .withColumn("_tx", col("_fx") - col("_i0"))
        .withColumn("_ty", col("_fy") - col("_j0"))
        .withColumn("_tz", col("_fz") - col("_k0"))
      val yzFrame = col("_fy") >= 0.0 &&
        col("_fy") <= lit((yAxis.size - 1).toDouble) &&
        col("_fz") >= 0.0 && col("_fz") <= lit((zAxis.size - 1).toDouble)
      val p =
        if (periodic) pAll.filter(yzFrame)
        else pAll.filter(col("_fx") >= 0.0 &&
          col("_fx") <= lit((nx - 1).toDouble) && yzFrame)
      // seam wrap of the right corner column (periodic only)
      def ciOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (periodic) pmod(c, lit(nx)) else c
      val cornerStructs =
        for (di <- 0 to 1; dj <- 0 to 1; dk <- 0 to 1) yield {
          def w(t: org.apache.spark.sql.Column, d: Int) =
            if (d == 1) t else lit(1.0) - t
          struct(ciOf(col("_i0") + di).as("_ci"),
            (col("_j0") + dj).as("_cj"),
            (col("_k0") + dk).as("_ck"),
            (w(col("_tx"), di) * w(col("_ty"), dj) * w(col("_tz"), dk))
              .as("_w"))
        }
      val cornersR = p.select(col("_rid"),
          explode(array(cornerStructs: _*)).as("_c"))
        .select(col("_rid"), col("_c._ci").as("_ci"),
          col("_c._cj").as("_cj"), col("_c._ck").as("_ck"),
          col("_c._w").as("_w"))
      (cellsR, cornersR)
    } else {
      // IRREGULAR ascending axes: broadcast axis arrays + the broadcast
      // kernel's findIndexes brackets — the 3-D analog of the 2-D
      // irregular corner fan-out; the join plan is unchanged
      import spark.implicits._
      val bcX = spark.sparkContext.broadcast(xAxis)
      val bcY = spark.sparkContext.broadcast(yAxis)
      val bcZ = spark.sparkContext.broadcast(zAxis)
      val cellsI = gridTable.select(col(lonCol).cast("double"),
          col(latCol).cast("double"), col(zName).cast("double"),
          col(vCol).cast("double"))
        .as[(Double, Double, Double, Double)]
        .flatMap { case (x, y, z, v) =>
          val ci = bcX.value.findIndex(x, bounded = false)
          val cj = bcY.value.findIndex(y, bounded = false)
          val ck = bcZ.value.findIndex(z, bounded = false)
          if (ci >= 0 && cj >= 0 && ck >= 0)
            Iterator.single((ci, cj, ck, v))
          else Iterator.empty
        }.toDF("_ci", "_cj", "_ck", "_z")
      val cornersI = withId.select(col("_rid"),
          col(xCol).cast("double").as("_x"),
          col(yCol).cast("double").as("_y"),
          col(zCol).cast("double").as("_zq"))
        .as[(Long, Double, Double, Double)]
        .flatMap { case (rid, x, y, z) =>
          (bcX.value.findIndexes(x), bcY.value.findIndexes(y),
            bcZ.value.findIndexes(z)) match {
            case (Some((i0, i1)), Some((j0, j1)), Some((k0, k1))) =>
              val ax = bcX.value; val ay = bcY.value; val az = bcZ.value
              def tOf(v: Double, lo: Double, hi: Double) =
                if (hi == lo) 0.0 else (v - lo) / (hi - lo)
              val tx = tOf(x, ax(i0), ax(i1))
              val ty = tOf(y, ay(j0), ay(j1))
              val tz = tOf(z, az(k0), az(k1))
              for {
                (ci, wx) <- Iterator((i0, 1 - tx), (i1, tx))
                (cj, wy) <- Iterator((j0, 1 - ty), (j1, ty))
                (ck, wz) <- Iterator((k0, 1 - tz), (k1, tz))
              } yield (rid, ci, cj, ck, wx * wy * wz)
            case _ => Iterator.empty
          }
        }.toDF("_rid", "_ci", "_cj", "_ck", "_w")
      (cellsI, cornersI)
    }
    val agg = corners.join(cells, Seq("_ci", "_cj", "_ck"))
      .groupBy("_rid")
      .agg(sum(col("_w") * col("_z")).as("_v"), count(lit(1)).as("_n"))
      .select(col("_rid"),
        when(col("_n") === 8, col("_v")).otherwise(lit(Double.NaN)).as("_v"))
    withId.join(agg, Seq("_rid"), "left")
      .withColumn(outputCol, coalesce(col("_v"), lit(Double.NaN)))
      .drop("_rid", "_v")
  }

  /** Grid-as-table WINDOWED interpolation (r3 VERDICT item 1): bicubic /
    * spline_bilinear / the separable univariate family over a lattice too
    * large for the broadcast gate — the reference's flagship windowed
    * methods (`math/interpolate/bivariate/bicubic.hpp:89-186`, default of
    * `pyinterp/regular_grid_interpolator.py:45-63`) without ever
    * collecting the grid.
    *
    * Plan ([[WindowedTileJoin]], tile-halo co-partitioning): probes and
    * lattice cells are both keyed by WINDOW TILE and co-grouped in one
    * shuffle each — each cell ships once per tile (+ once more in the
    * (2·halfWindow-1)-cell halo band), NOT once per referencing probe,
    * so shuffle volume is ~1 probe pass + ~1.2 lattice passes instead of
    * the (2·halfWindow)² per-probe stencil fan-out. Per tile the cells
    * fill a dense local block and the SAME core kernels as the broadcast
    * path ([[graft.core.Bicubic]] / [[graft.core.Univariate1D]] /
    * cspline) evaluate origin-sorted probes with a last-window fit cache
    * — so table ≡ broadcast to the last bit. Probes whose window cannot
    * be framed (boundary `undef` semantics) or with a missing/masked
    * stencil cell yield NaN, matching the broadcast kernel.
    *
    * Requires ascending axes of at least 2·halfWindow nodes — regular
    * (affine cell keys, fully codegen) or IRREGULAR (broadcast axis
    * arrays + the broadcast kernel's findIndexes binary search; same
    * tile-halo plan, window nodes read from the value arrays). A GLOBAL
    * lon-periodic lattice is declared by `xPeriod` (e.g. 360.0; requires
    * nx·step = period): probe x normalizes into the period, the x frame
    * never rejects, and windows crossing the seam pull their stencil
    * columns through `floorMod(wi+di, nx)` — the broadcast window's wrap
    * (`math/interpolate/cache_loader.hpp:110-133` semantics). The
    * evaluator then works in UNWRAPPED window coordinates (xs may extend
    * past the axis ends by < halfWindow·step), exactly like the
    * broadcast kernel's monotonic window unwrap.
    */
  def bivariateTableWindowed(spark: SparkSession, probe: DataFrame,
                             xCol: String, yCol: String,
                             gridTable: DataFrame,
                             method: String = "bicubic",
                             halfWindow: Int = 3,
                             valueCol: String = "",
                             outputCol: String = "value",
                             xPeriod: Double = 0.0): DataFrame = {
    require(!geometricMethods.contains(method),
      s"method $method is geometric — use bivariateTable")
    require(halfWindow >= 1, "halfWindow must be >= 1")
    val n = 2 * halfWindow
    val (lonCol, latCol, vCol, xAxis, yAxis) =
      resolveGrid2dTable(gridTable, valueCol)
    require(xAxis.size >= n && yAxis.size >= n &&
      !xAxis.isPeriodic && !yAxis.isPeriodic &&
      xAxis.front < xAxis.back && yAxis.front < yAxis.back,
      "bivariateTableWindowed requires ascending axes of >= " +
        "2*halfWindow nodes")
    val periodic = xPeriod != 0.0
    val regular = xAxis.isRegular && yAxis.isRegular
    require(regular || !periodic,
      "xPeriod requires a regular full-circle lattice")
    val nx = xAxis.size
    if (periodic) require(
      math.abs(nx * xAxis.step - xPeriod) <= 1e-6 * xAxis.step,
      s"xPeriod=$xPeriod requires a full-circle lattice: nx*step = " +
        s"${nx * xAxis.step}")

    val withId = withStableId(probe)
    import spark.implicits._
    val tXY = WindowedTileJoin.DefaultTileXY
    val hw = halfWindow

    val (cells, probesT) =
      if (regular) {
        val cellsR = gridTable.select(
          round((col(lonCol).cast("double") - lit(xAxis.front)) /
            lit(xAxis.step)).cast("int").as("_ci"),
          round((col(latCol).cast("double") - lit(yAxis.front)) /
            lit(yAxis.step)).cast("int").as("_cj"),
          col(vCol).cast("double").as("_z"))
        val fxRaw =
          (col(xCol).cast("double") - lit(xAxis.front)) / lit(xAxis.step)
        val fx = if (periodic) pmod(fxRaw, lit(nx.toDouble)) else fxRaw
        val fy =
          (col(yCol).cast("double") - lit(yAxis.front)) / lit(yAxis.step)
        // bracket cell (right-edge-inclusive, findIndexes semantics) ->
        // window origin; the frame filter mirrors Axis.window with
        // boundary `undef`: i0 in [halfWindow-1, size-1-halfWindow],
        // probes outside surface as NaN after the final left join.
        // Periodic x never rejects and its window origin may be
        // negative (unwrapped frame).
        val i0 =
          if (periodic)
            when(col("_fx") === lit((nx - 1).toDouble), lit(nx - 2))
              .otherwise(floor(col("_fx")).cast("int")).cast("int")
          else least(floor(col("_fx")).cast("int"), lit(nx - 2))
        val pAll = withId
          .withColumn("_fx", fx).withColumn("_fy", fy)
          .withColumn("_i0", i0)
          .withColumn("_j0",
            least(floor(col("_fy")).cast("int"), lit(yAxis.size - 2)))
          .withColumn("_wi", col("_i0") - lit(halfWindow - 1))
          .withColumn("_wj", col("_j0") - lit(halfWindow - 1))
        val yFrame = col("_fy") >= 0.0 &&
          col("_fy") <= lit((yAxis.size - 1).toDouble) &&
          col("_wj") >= 0 && col("_wj") + (n - 1) <= lit(yAxis.size - 1)
        val p =
          if (periodic) pAll.filter(yFrame)
          else pAll.filter(col("_fx") >= 0.0 &&
            col("_fx") <= lit((nx - 1).toDouble) &&
            col("_wi") >= 0 && col("_wi") + (n - 1) <= lit(nx - 1) &&
            yFrame)
        // periodic probes evaluate at the UNWRAPPED window coordinate
        // front + fx·step (fx - wi ∈ [halfWindow-1, halfWindow), always
        // inside the unwrapped xs frame); non-periodic keeps the raw x
        // so the established paths stay bit-identical
        val xEval =
          if (periodic) lit(xAxis.front) + col("_fx") * lit(xAxis.step)
          else col(xCol).cast("double")
        val pT = p.select(col("_rid"), xEval.as("_x"),
            col(yCol).cast("double").as("_y"), col("_wi"), col("_wj"))
          .as[(Long, Double, Double, Int, Int)]
          .map { case (rid, x, y, wi, wj) =>
            TileProbe(Math.floorDiv(wi, tXY), Math.floorDiv(wj, tXY), 0, 0,
              rid, x, y, 0.0, 0.0, wi, wj, 0, 0)
          }
        (cellsR, pT)
      } else {
        // IRREGULAR ascending axes: broadcast the axis value arrays
        // (O(nx + ny)), key cells via the nearest-index search and
        // bracket probes via the SAME findIndexes binary search as the
        // broadcast kernel; the window origin / undef-frame rule is
        // identical to the affine branch. The tile-halo fan-out and
        // evaluation are index-based and shared — only the window node
        // coordinates differ (axis values instead of front + i·step).
        val bcX = spark.sparkContext.broadcast(xAxis)
        val bcY = spark.sparkContext.broadcast(yAxis)
        val nyL = yAxis.size
        val nxL = nx
        val cellsI = gridTable.select(col(lonCol).cast("double"),
            col(latCol).cast("double"), col(vCol).cast("double"))
          .as[(Double, Double, Double)]
          .flatMap { case (x, y, z) =>
            val ci = bcX.value.findIndex(x, bounded = false)
            val cj = bcY.value.findIndex(y, bounded = false)
            if (ci >= 0 && cj >= 0) Iterator.single((ci, cj, z))
            else Iterator.empty
          }.toDF("_ci", "_cj", "_z")
        val pT = withId.select(col("_rid"),
            col(xCol).cast("double").as("_x"),
            col(yCol).cast("double").as("_y"))
          .as[(Long, Double, Double)]
          .flatMap { case (rid, x, y) =>
            (bcX.value.findIndexes(x), bcY.value.findIndexes(y)) match {
              case (Some((i0, _)), Some((j0, _))) =>
                val wi = i0 - (hw - 1)
                val wj = j0 - (hw - 1)
                if (wi >= 0 && wi + (2 * hw - 1) <= nxL - 1 &&
                    wj >= 0 && wj + (2 * hw - 1) <= nyL - 1)
                  Iterator.single(TileProbe(Math.floorDiv(wi, tXY),
                    Math.floorDiv(wj, tXY), 0, 0, rid, x, y, 0.0, 0.0,
                    wi, wj, 0, 0))
                else Iterator.empty
              case _ => Iterator.empty
            }
          }
        (cellsI, pT)
      }
    val cellsT = WindowedTileJoin.fanOutCells(spark, cells, arity = 2,
      n = n, halfWindow = halfWindow, tileXY = tXY,
      tilePlane = WindowedTileJoin.DefaultTilePlane,
      nx = nx, ny = yAxis.size, nz = 0, nu = 0, periodicX = periodic)
    val vals = WindowedTileJoin.evaluate(spark, probesT, cellsT,
      arity = 2, method = method, zMethod = "", uMethod = "", n = n,
      tileXY = tXY, tilePlane = WindowedTileJoin.DefaultTilePlane,
      xFront = xAxis.front, xStep = xAxis.step,
      yFront = yAxis.front, yStep = yAxis.step,
      xVals = if (regular) null else xAxis.values,
      yVals = if (regular) null else yAxis.values)

    withId.join(vals, Seq("_rid"), "left")
      .withColumn(outputCol, coalesce(col("_v"), lit(Double.NaN)))
      .drop("_rid", "_v")
  }

  /** 3-D grid-as-table WINDOWED interpolation: the reference's flagship
    * trivariate semantics — windowed bicubic/spline in the (x, y) plane
    * on the two z-bracketing planes, then linear (or nearest) combine
    * along z (`pybind/windowed/trivariate.hpp:36-113`) — for lattices too
    * large for the broadcast gate. [[bivariateTableWindowed]]'s
    * tile-halo plan ([[WindowedTileJoin]]) extended with the z bracket:
    * probes key by (window tile, z-plane tile), cells ship once per tile
    * (+ xy halo band + one halo plane — replication ~1.2·(1+1/tilePlane),
    * NOT the 72× per-probe stencil fan-out), and the per-tile eval runs
    * the SAME kernels as the broadcast path per plane before the z
    * combine. Probes outside the frame, and windows with missing/masked
    * cells, yield NaN (boundary `undef`); the linear z combine is
    * v0 + t·(v1 − v0) on BOTH bracketing planes even at t = 0 or 1 —
    * the broadcast kernel's exact op order and NaN propagation. A
    * GLOBAL lon-periodic lattice is declared by `xPeriod` exactly as on
    * [[bivariateTableWindowed]].
    */
  def trivariateTableWindowed(spark: SparkSession, probe: DataFrame,
                              xCol: String, yCol: String, zCol: String,
                              gridTable: DataFrame,
                              method: String = "bicubic",
                              zMethod: String = "linear",
                              halfWindow: Int = 3,
                              zColName: String = "", valueCol: String = "",
                              outputCol: String = "value",
                              xPeriod: Double = 0.0): DataFrame = {
    require(!geometricMethods.contains(method),
      s"method $method is geometric — use trivariateTable")
    require(halfWindow >= 1, "halfWindow must be >= 1")
    val n = 2 * halfWindow
    val (lonCol, latCol, zName, vCol, xAxis, yAxis, zAxis) =
      resolveGrid3dTable(gridTable, zColName, valueCol,
        "trivariateTableWindowed")
    require(xAxis.size >= n && yAxis.size >= n,
      "trivariateTableWindowed requires >= 2*halfWindow nodes per plane " +
        "axis")
    // periodic longitude: same contract and mechanics as the 2-D path —
    // full-circle lattice, probe normalization, seam-wrapped stencil
    // columns through the tile-halo fan-out, unwrapped evaluation frame
    val periodic = xPeriod != 0.0
    val regular = xAxis.isRegular && yAxis.isRegular && zAxis.isRegular
    require(regular || !periodic,
      "xPeriod requires a regular full-circle lattice")
    val nx = xAxis.size
    if (periodic) require(
      math.abs(nx * xAxis.step - xPeriod) <= 1e-6 * xAxis.step,
      s"xPeriod=$xPeriod requires a full-circle lattice: nx*step = " +
        s"${nx * xAxis.step}")

    val withId = withStableId(probe)
    import spark.implicits._
    val tXY = WindowedTileJoin.DefaultTileXY
    val tPl = WindowedTileJoin.DefaultTilePlane
    val hw = halfWindow

    val (cells, probesT) = if (regular) {
      val cellsR = gridTable.select(
        round((col(lonCol).cast("double") - lit(xAxis.front)) /
          lit(xAxis.step)).cast("int").as("_ci"),
        round((col(latCol).cast("double") - lit(yAxis.front)) /
          lit(yAxis.step)).cast("int").as("_cj"),
        round((col(zName).cast("double") - lit(zAxis.front)) /
          lit(zAxis.step)).cast("int").as("_ck"),
        col(vCol).cast("double").as("_z"))
      def frac(c: String, a: Axis) =
        (col(c).cast("double") - lit(a.front)) / lit(a.step)
      val fx =
        if (periodic) pmod(frac(xCol, xAxis), lit(nx.toDouble))
        else frac(xCol, xAxis)
      val i0 =
        if (periodic)
          when(col("_fx") === lit((nx - 1).toDouble), lit(nx - 2))
            .otherwise(floor(col("_fx")).cast("int")).cast("int")
        else least(floor(col("_fx")).cast("int"), lit(nx - 2))
      val pAll = withId
        .withColumn("_fx", fx)
        .withColumn("_fy", frac(yCol, yAxis))
        .withColumn("_fz", frac(zCol, zAxis))
        .withColumn("_i0", i0)
        .withColumn("_j0",
          least(floor(col("_fy")).cast("int"), lit(yAxis.size - 2)))
        .withColumn("_k0",
          least(floor(col("_fz")).cast("int"), lit(zAxis.size - 2)))
        .withColumn("_wi", col("_i0") - lit(halfWindow - 1))
        .withColumn("_wj", col("_j0") - lit(halfWindow - 1))
        .withColumn("_tz", col("_fz") - col("_k0"))
      val yzFrame =
        col("_fy") >= 0.0 && col("_fy") <= lit((yAxis.size - 1).toDouble) &&
        col("_fz") >= 0.0 && col("_fz") <= lit((zAxis.size - 1).toDouble) &&
        col("_wj") >= 0 && col("_wj") + (n - 1) <= lit(yAxis.size - 1)
      val p =
        if (periodic) pAll.filter(yzFrame)
        else pAll.filter(col("_fx") >= 0.0 &&
          col("_fx") <= lit((nx - 1).toDouble) &&
          col("_wi") >= 0 && col("_wi") + (n - 1) <= lit(nx - 1) && yzFrame)
      val xEval =
        if (periodic) lit(xAxis.front) + col("_fx") * lit(xAxis.step)
        else col(xCol).cast("double")
      val pT = p.select(col("_rid"), xEval.as("_x"),
          col(yCol).cast("double").as("_y"), col("_tz"), col("_wi"),
          col("_wj"), col("_k0"))
        .as[(Long, Double, Double, Double, Int, Int, Int)]
        .map { case (rid, x, y, tz, wi, wj, k0) =>
          TileProbe(Math.floorDiv(wi, tXY), Math.floorDiv(wj, tXY),
            Math.floorDiv(k0, tPl), 0, rid, x, y, tz, 0.0, wi, wj, k0, 0)
        }
      (cellsR, pT)
    } else {
      // IRREGULAR ascending axes (pressure levels, non-uniform time):
      // broadcast the axis value arrays (O(nx + ny + nz) — the cube
      // root of the lattice), key cells via the nearest-index search and
      // bracket probes via the SAME findIndexes binary search as the
      // broadcast kernel; tz = (z − z0)/(z1 − z0) from the axis VALUES,
      // the broadcast trivariate's exact combine weight. The tile-halo
      // fan-out and evaluation are index-based and shared — window
      // x/y node coordinates come from the broadcast value arrays.
      val bcX = spark.sparkContext.broadcast(xAxis)
      val bcY = spark.sparkContext.broadcast(yAxis)
      val bcZ = spark.sparkContext.broadcast(zAxis)
      val nxL = nx
      val nyL = yAxis.size
      val cellsI = gridTable.select(col(lonCol).cast("double"),
          col(latCol).cast("double"), col(zName).cast("double"),
          col(vCol).cast("double"))
        .as[(Double, Double, Double, Double)]
        .flatMap { case (x, y, z, v) =>
          val ci = bcX.value.findIndex(x, bounded = false)
          val cj = bcY.value.findIndex(y, bounded = false)
          val ck = bcZ.value.findIndex(z, bounded = false)
          if (ci >= 0 && cj >= 0 && ck >= 0)
            Iterator.single((ci, cj, ck, v))
          else Iterator.empty
        }.toDF("_ci", "_cj", "_ck", "_z")
      val pT = withId.select(col("_rid"),
          col(xCol).cast("double").as("_x"),
          col(yCol).cast("double").as("_y"),
          col(zCol).cast("double").as("_zq"))
        .as[(Long, Double, Double, Double)]
        .flatMap { case (rid, x, y, z) =>
          (bcX.value.findIndexes(x), bcY.value.findIndexes(y),
            bcZ.value.findIndexes(z)) match {
            case (Some((i0, _)), Some((j0, _)), Some((k0, k1))) =>
              val wi = i0 - (hw - 1)
              val wj = j0 - (hw - 1)
              if (wi >= 0 && wi + (2 * hw - 1) <= nxL - 1 &&
                  wj >= 0 && wj + (2 * hw - 1) <= nyL - 1) {
                val az = bcZ.value
                val z0 = az(k0); val z1 = az(k1)
                val tz = if (z1 == z0) 0.0 else (z - z0) / (z1 - z0)
                Iterator.single(TileProbe(Math.floorDiv(wi, tXY),
                  Math.floorDiv(wj, tXY), Math.floorDiv(k0, tPl), 0,
                  rid, x, y, tz, 0.0, wi, wj, k0, 0))
              } else Iterator.empty
            case _ => Iterator.empty
          }
        }
      (cellsI, pT)
    }
    val cellsT = WindowedTileJoin.fanOutCells(spark, cells, arity = 3,
      n = n, halfWindow = halfWindow, tileXY = tXY, tilePlane = tPl,
      nx = xAxis.size, ny = yAxis.size, nz = zAxis.size, nu = 0,
      periodicX = periodic)
    val vals = WindowedTileJoin.evaluate(spark, probesT, cellsT,
      arity = 3, method = method, zMethod = zMethod, uMethod = "", n = n,
      tileXY = tXY, tilePlane = tPl,
      xFront = xAxis.front, xStep = xAxis.step,
      yFront = yAxis.front, yStep = yAxis.step,
      xVals = if (regular) null else xAxis.values,
      yVals = if (regular) null else yAxis.values)

    withId.join(vals, Seq("_rid"), "left")
      .withColumn(outputCol, coalesce(col("_v"), lit(Double.NaN)))
      .drop("_rid", "_v")
  }

  /** Axis-role + value-column resolution for the 4-D grid-as-table paths:
    * lon/lat from CF/name heuristics, z from `zColName` (or the time
    * role), u from `uColName` (the 4th axis has no universal naming
    * convention — callers must name it), value = the remaining column.
    */
  private def resolveGrid4dTable(gridTable: DataFrame, zColName: String,
                                 uColName: String, valueCol: String,
                                 caller: String)
      : (String, String, String, String, String, Axis, Axis, Axis, Axis) = {
    import graft.sources.GridLoader
    val roles = GridLoader.identifyAxes(gridTable)
    val lonCol = roles.lon.getOrElse(
      throw new IllegalArgumentException("no longitude/x axis identified"))
    val latCol = roles.lat.getOrElse(
      throw new IllegalArgumentException("no latitude/y axis identified"))
    val zName =
      if (zColName.nonEmpty) zColName
      else roles.time.getOrElse(
        throw new IllegalArgumentException("no time/z axis identified"))
    require(uColName.nonEmpty,
      s"$caller: name the 4th axis column via uColName")
    val vCol =
      if (valueCol.nonEmpty) valueCol
      else gridTable.schema.fields.map(_.name)
        .filterNot(n => n == lonCol || n == latCol || n == zName ||
          n == uColName).headOption
        .getOrElse(throw new IllegalArgumentException("no value column"))
    val axes = GridLoader.axesOf(gridTable,
      Seq(lonCol, latCol, zName, uColName))
    require(axes.forall(a => a.size >= 2 && !a.isPeriodic &&
      a.front < a.back),
      s"$caller requires ascending non-periodic axes of >= 2 nodes")
    (lonCol, latCol, zName, uColName, vCol, axes(0), axes(1), axes(2),
      axes(3))
  }

  /** 4-D grid-as-table QUADRILINEAR interpolation: [[trivariateTable]]'s
    * corner join extended to the 16 bracketing lattice corners (the
    * geometric quadrivariate semantics,
    * `pybind/geometric/quadrivariate.hpp`). The lattice never leaves the
    * cluster.
    */
  def quadrivariateTable(spark: SparkSession, probe: DataFrame,
                         xCol: String, yCol: String, zCol: String,
                         uCol: String, gridTable: DataFrame,
                         zColName: String = "", uColName: String = "",
                         valueCol: String = "",
                         outputCol: String = "value",
                         xPeriod: Double = 0.0): DataFrame = {
    val (lonCol, latCol, zName, uName, vCol, xAxis, yAxis, zAxis, uAxis) =
      resolveGrid4dTable(gridTable, zColName, uColName, valueCol,
        "quadrivariateTable")
    val regular = xAxis.isRegular && yAxis.isRegular && zAxis.isRegular &&
      uAxis.isRegular
    // periodic longitude: [[bivariateTable]]'s seam mechanics — pmod
    // probe normalization, x frame never rejects, right corners wrap
    val periodic = xPeriod != 0.0
    require(regular || !periodic,
      "xPeriod requires a regular full-circle lattice")
    val nx = xAxis.size
    if (periodic) require(
      math.abs(nx * xAxis.step - xPeriod) <= 1e-6 * xAxis.step,
      s"xPeriod=$xPeriod requires a full-circle lattice: nx*step = " +
        s"${nx * xAxis.step}")
    val withId = withStableId(probe)
    val (cells, corners) = if (regular) {
      val cellsR = gridTable.select(
        round((col(lonCol).cast("double") - lit(xAxis.front)) /
          lit(xAxis.step)).cast("int").as("_ci"),
        round((col(latCol).cast("double") - lit(yAxis.front)) /
          lit(yAxis.step)).cast("int").as("_cj"),
        round((col(zName).cast("double") - lit(zAxis.front)) /
          lit(zAxis.step)).cast("int").as("_ck"),
        round((col(uName).cast("double") - lit(uAxis.front)) /
          lit(uAxis.step)).cast("int").as("_cl"),
        col(vCol).cast("double").as("_z"))
      def frac(c: String, a: Axis) =
        (col(c).cast("double") - lit(a.front)) / lit(a.step)
      val fx =
        if (periodic) pmod(frac(xCol, xAxis), lit(nx.toDouble))
        else frac(xCol, xAxis)
      val i0 =
        if (periodic)
          when(col("_fx") === lit((nx - 1).toDouble), lit(nx - 2))
            .otherwise(floor(col("_fx")).cast("int")).cast("int")
        else least(floor(col("_fx")).cast("int"), lit(nx - 2))
      val pAll = withId
        .withColumn("_fx", fx)
        .withColumn("_fy", frac(yCol, yAxis))
        .withColumn("_fz", frac(zCol, zAxis))
        .withColumn("_fu", frac(uCol, uAxis))
        .withColumn("_i0", i0)
        .withColumn("_j0",
          least(floor(col("_fy")).cast("int"), lit(yAxis.size - 2)))
        .withColumn("_k0",
          least(floor(col("_fz")).cast("int"), lit(zAxis.size - 2)))
        .withColumn("_l0",
          least(floor(col("_fu")).cast("int"), lit(uAxis.size - 2)))
        .withColumn("_tx", col("_fx") - col("_i0"))
        .withColumn("_ty", col("_fy") - col("_j0"))
        .withColumn("_tz", col("_fz") - col("_k0"))
        .withColumn("_tu", col("_fu") - col("_l0"))
      val yzuFrame =
        col("_fy") >= 0.0 && col("_fy") <= lit((yAxis.size - 1).toDouble) &&
        col("_fz") >= 0.0 && col("_fz") <= lit((zAxis.size - 1).toDouble) &&
        col("_fu") >= 0.0 && col("_fu") <= lit((uAxis.size - 1).toDouble)
      val p =
        if (periodic) pAll.filter(yzuFrame)
        else pAll.filter(col("_fx") >= 0.0 &&
          col("_fx") <= lit((nx - 1).toDouble) && yzuFrame)
      def ciOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (periodic) pmod(c, lit(nx)) else c
      val cornerStructs =
        for (di <- 0 to 1; dj <- 0 to 1; dk <- 0 to 1; dl <- 0 to 1)
        yield {
          def w(t: org.apache.spark.sql.Column, d: Int) =
            if (d == 1) t else lit(1.0) - t
          struct(ciOf(col("_i0") + di).as("_ci"),
            (col("_j0") + dj).as("_cj"),
            (col("_k0") + dk).as("_ck"), (col("_l0") + dl).as("_cl"),
            (w(col("_tx"), di) * w(col("_ty"), dj) * w(col("_tz"), dk) *
              w(col("_tu"), dl)).as("_w"))
        }
      val cornersR = p.select(col("_rid"),
          explode(array(cornerStructs: _*)).as("_c"))
        .select(col("_rid"), col("_c._ci").as("_ci"),
          col("_c._cj").as("_cj"), col("_c._ck").as("_ck"),
          col("_c._cl").as("_cl"), col("_c._w").as("_w"))
      (cellsR, cornersR)
    } else {
      // IRREGULAR ascending axes: broadcast axis arrays + the broadcast
      // kernel's findIndexes brackets, extended to the 16 corners — the
      // 4-D analog of the 2-D/3-D irregular corner fan-outs; the join
      // plan is unchanged
      import spark.implicits._
      val bcX = spark.sparkContext.broadcast(xAxis)
      val bcY = spark.sparkContext.broadcast(yAxis)
      val bcZ = spark.sparkContext.broadcast(zAxis)
      val bcU = spark.sparkContext.broadcast(uAxis)
      val cellsI = gridTable.select(col(lonCol).cast("double"),
          col(latCol).cast("double"), col(zName).cast("double"),
          col(uName).cast("double"), col(vCol).cast("double"))
        .as[(Double, Double, Double, Double, Double)]
        .flatMap { case (x, y, z, u, v) =>
          val ci = bcX.value.findIndex(x, bounded = false)
          val cj = bcY.value.findIndex(y, bounded = false)
          val ck = bcZ.value.findIndex(z, bounded = false)
          val cl = bcU.value.findIndex(u, bounded = false)
          if (ci >= 0 && cj >= 0 && ck >= 0 && cl >= 0)
            Iterator.single((ci, cj, ck, cl, v))
          else Iterator.empty
        }.toDF("_ci", "_cj", "_ck", "_cl", "_z")
      val cornersI = withId.select(col("_rid"),
          col(xCol).cast("double").as("_x"),
          col(yCol).cast("double").as("_y"),
          col(zCol).cast("double").as("_zq"),
          col(uCol).cast("double").as("_uq"))
        .as[(Long, Double, Double, Double, Double)]
        .flatMap { case (rid, x, y, z, u) =>
          (bcX.value.findIndexes(x), bcY.value.findIndexes(y),
            bcZ.value.findIndexes(z), bcU.value.findIndexes(u)) match {
            case (Some((i0, i1)), Some((j0, j1)), Some((k0, k1)),
                Some((l0, l1))) =>
              val ax = bcX.value; val ay = bcY.value
              val az = bcZ.value; val au = bcU.value
              def tOf(v: Double, lo: Double, hi: Double) =
                if (hi == lo) 0.0 else (v - lo) / (hi - lo)
              val tx = tOf(x, ax(i0), ax(i1))
              val ty = tOf(y, ay(j0), ay(j1))
              val tz = tOf(z, az(k0), az(k1))
              val tu = tOf(u, au(l0), au(l1))
              for {
                (ci, wx) <- Iterator((i0, 1 - tx), (i1, tx))
                (cj, wy) <- Iterator((j0, 1 - ty), (j1, ty))
                (ck, wz) <- Iterator((k0, 1 - tz), (k1, tz))
                (cl, wu) <- Iterator((l0, 1 - tu), (l1, tu))
              } yield (rid, ci, cj, ck, cl, wx * wy * wz * wu)
            case _ => Iterator.empty
          }
        }.toDF("_rid", "_ci", "_cj", "_ck", "_cl", "_w")
      (cellsI, cornersI)
    }
    val agg = corners.join(cells, Seq("_ci", "_cj", "_ck", "_cl"))
      .groupBy("_rid")
      .agg(sum(col("_w") * col("_z")).as("_v"), count(lit(1)).as("_n"))
      .select(col("_rid"),
        when(col("_n") === 16, col("_v")).otherwise(lit(Double.NaN))
          .as("_v"))
    withId.join(agg, Seq("_rid"), "left")
      .withColumn(outputCol, coalesce(col("_v"), lit(Double.NaN)))
      .drop("_rid", "_v")
  }

  /** 4-D grid-as-table WINDOWED interpolation: windowed bicubic/spline in
    * the (x, y) plane on the FOUR (z, u)-bracketing planes, then bilinear
    * (or nearest per axis) combine across (z, u) — the
    * `pybind/windowed/quadrivariate.hpp` semantics for lattices above the
    * broadcast gate. Runs on the [[WindowedTileJoin]] tile-halo plan
    * (probes and cells co-grouped by (xy tile, z tile, u tile); cell
    * replication ~1.2·(1+1/tilePlane)², NOT the 144× per-probe stencil
    * fan-out). The linear combine is the broadcast kernel's nested lerp
    * (u outer, z inner, v0 + t·(v1 − v0) at each level) — bit-identical
    * op order and NaN propagation; nearest snaps per axis and only
    * assembles the snapped plane. A GLOBAL lon-periodic lattice is
    * declared by `xPeriod` exactly as on [[bivariateTableWindowed]].
    */
  def quadrivariateTableWindowed(spark: SparkSession, probe: DataFrame,
                                 xCol: String, yCol: String, zCol: String,
                                 uCol: String, gridTable: DataFrame,
                                 method: String = "bicubic",
                                 zMethod: String = "linear",
                                 uMethod: String = "linear",
                                 halfWindow: Int = 3,
                                 zColName: String = "", uColName: String = "",
                                 valueCol: String = "",
                                 outputCol: String = "value",
                                 xPeriod: Double = 0.0): DataFrame = {
    require(!geometricMethods.contains(method),
      s"method $method is geometric — use quadrivariateTable")
    require(halfWindow >= 1, "halfWindow must be >= 1")
    val n = 2 * halfWindow
    val (lonCol, latCol, zName, uName, vCol, xAxis, yAxis, zAxis, uAxis) =
      resolveGrid4dTable(gridTable, zColName, uColName, valueCol,
        "quadrivariateTableWindowed")
    require(xAxis.size >= n && yAxis.size >= n,
      "quadrivariateTableWindowed requires >= 2*halfWindow nodes per " +
        "plane axis")
    val periodic = xPeriod != 0.0
    val regular = xAxis.isRegular && yAxis.isRegular && zAxis.isRegular &&
      uAxis.isRegular
    require(regular || !periodic,
      "xPeriod requires a regular full-circle lattice")
    val nx4 = xAxis.size
    if (periodic) require(
      math.abs(nx4 * xAxis.step - xPeriod) <= 1e-6 * xAxis.step,
      s"xPeriod=$xPeriod requires a full-circle lattice: nx*step = " +
        s"${nx4 * xAxis.step}")
    val withId = withStableId(probe)
    import spark.implicits._
    val tXY = WindowedTileJoin.DefaultTileXY
    val tPl = WindowedTileJoin.DefaultTilePlane
    val hw = halfWindow

    val (cells, probesT) = if (regular) {
      val cellsR = gridTable.select(
        round((col(lonCol).cast("double") - lit(xAxis.front)) /
          lit(xAxis.step)).cast("int").as("_ci"),
        round((col(latCol).cast("double") - lit(yAxis.front)) /
          lit(yAxis.step)).cast("int").as("_cj"),
        round((col(zName).cast("double") - lit(zAxis.front)) /
          lit(zAxis.step)).cast("int").as("_ck"),
        round((col(uName).cast("double") - lit(uAxis.front)) /
          lit(uAxis.step)).cast("int").as("_cl"),
        col(vCol).cast("double").as("_z"))
      def frac(c: String, a: Axis) =
        (col(c).cast("double") - lit(a.front)) / lit(a.step)
      val fx4 =
        if (periodic) pmod(frac(xCol, xAxis), lit(nx4.toDouble))
        else frac(xCol, xAxis)
      val i04 =
        if (periodic)
          when(col("_fx") === lit((nx4 - 1).toDouble), lit(nx4 - 2))
            .otherwise(floor(col("_fx")).cast("int")).cast("int")
        else least(floor(col("_fx")).cast("int"), lit(nx4 - 2))
      val pAll = withId
        .withColumn("_fx", fx4)
        .withColumn("_fy", frac(yCol, yAxis))
        .withColumn("_fz", frac(zCol, zAxis))
        .withColumn("_fu", frac(uCol, uAxis))
        .withColumn("_i0", i04)
        .withColumn("_j0",
          least(floor(col("_fy")).cast("int"), lit(yAxis.size - 2)))
        .withColumn("_k0",
          least(floor(col("_fz")).cast("int"), lit(zAxis.size - 2)))
        .withColumn("_l0",
          least(floor(col("_fu")).cast("int"), lit(uAxis.size - 2)))
        .withColumn("_wi", col("_i0") - lit(halfWindow - 1))
        .withColumn("_wj", col("_j0") - lit(halfWindow - 1))
        .withColumn("_tz", col("_fz") - col("_k0"))
        .withColumn("_tu", col("_fu") - col("_l0"))
      val yzuFrame =
        col("_fy") >= 0.0 && col("_fy") <= lit((yAxis.size - 1).toDouble) &&
        col("_fz") >= 0.0 && col("_fz") <= lit((zAxis.size - 1).toDouble) &&
        col("_fu") >= 0.0 && col("_fu") <= lit((uAxis.size - 1).toDouble) &&
        col("_wj") >= 0 && col("_wj") + (n - 1) <= lit(yAxis.size - 1)
      val p =
        if (periodic) pAll.filter(yzuFrame)
        else pAll.filter(col("_fx") >= 0.0 &&
          col("_fx") <= lit((nx4 - 1).toDouble) &&
          col("_wi") >= 0 && col("_wi") + (n - 1) <= lit(nx4 - 1) &&
          yzuFrame)
      val xEval4 =
        if (periodic) lit(xAxis.front) + col("_fx") * lit(xAxis.step)
        else col(xCol).cast("double")
      val pT = p.select(col("_rid"), xEval4.as("_x"),
          col(yCol).cast("double").as("_y"), col("_tz"), col("_tu"),
          col("_wi"), col("_wj"), col("_k0"), col("_l0"))
        .as[(Long, Double, Double, Double, Double, Int, Int, Int, Int)]
        .map { case (rid, x, y, tz, tu, wi, wj, k0, l0) =>
          TileProbe(Math.floorDiv(wi, tXY), Math.floorDiv(wj, tXY),
            Math.floorDiv(k0, tPl), Math.floorDiv(l0, tPl),
            rid, x, y, tz, tu, wi, wj, k0, l0)
        }
      (cellsR, pT)
    } else {
      // IRREGULAR ascending axes: the 3-D irregular branch extended
      // with the u bracket — broadcast axis value arrays, findIndexes
      // brackets, tz/tu = (v − v0)/(v1 − v0) from the axis VALUES (the
      // broadcast quadrivariate's exact combine weights)
      val bcX = spark.sparkContext.broadcast(xAxis)
      val bcY = spark.sparkContext.broadcast(yAxis)
      val bcZ = spark.sparkContext.broadcast(zAxis)
      val bcU = spark.sparkContext.broadcast(uAxis)
      val nxL = nx4
      val nyL = yAxis.size
      val cellsI = gridTable.select(col(lonCol).cast("double"),
          col(latCol).cast("double"), col(zName).cast("double"),
          col(uName).cast("double"), col(vCol).cast("double"))
        .as[(Double, Double, Double, Double, Double)]
        .flatMap { case (x, y, z, u, v) =>
          val ci = bcX.value.findIndex(x, bounded = false)
          val cj = bcY.value.findIndex(y, bounded = false)
          val ck = bcZ.value.findIndex(z, bounded = false)
          val cl = bcU.value.findIndex(u, bounded = false)
          if (ci >= 0 && cj >= 0 && ck >= 0 && cl >= 0)
            Iterator.single((ci, cj, ck, cl, v))
          else Iterator.empty
        }.toDF("_ci", "_cj", "_ck", "_cl", "_z")
      val pT = withId.select(col("_rid"),
          col(xCol).cast("double").as("_x"),
          col(yCol).cast("double").as("_y"),
          col(zCol).cast("double").as("_zq"),
          col(uCol).cast("double").as("_uq"))
        .as[(Long, Double, Double, Double, Double)]
        .flatMap { case (rid, x, y, z, u) =>
          (bcX.value.findIndexes(x), bcY.value.findIndexes(y),
            bcZ.value.findIndexes(z), bcU.value.findIndexes(u)) match {
            case (Some((i0, _)), Some((j0, _)), Some((k0, k1)),
                Some((l0, l1))) =>
              val wi = i0 - (hw - 1)
              val wj = j0 - (hw - 1)
              if (wi >= 0 && wi + (2 * hw - 1) <= nxL - 1 &&
                  wj >= 0 && wj + (2 * hw - 1) <= nyL - 1) {
                val az = bcZ.value; val au = bcU.value
                val z0 = az(k0); val z1 = az(k1)
                val u0 = au(l0); val u1 = au(l1)
                val tz = if (z1 == z0) 0.0 else (z - z0) / (z1 - z0)
                val tu = if (u1 == u0) 0.0 else (u - u0) / (u1 - u0)
                Iterator.single(TileProbe(Math.floorDiv(wi, tXY),
                  Math.floorDiv(wj, tXY), Math.floorDiv(k0, tPl),
                  Math.floorDiv(l0, tPl), rid, x, y, tz, tu, wi, wj,
                  k0, l0))
              } else Iterator.empty
            case _ => Iterator.empty
          }
        }
      (cellsI, pT)
    }
    val cellsT = WindowedTileJoin.fanOutCells(spark, cells, arity = 4,
      n = n, halfWindow = halfWindow, tileXY = tXY, tilePlane = tPl,
      nx = xAxis.size, ny = yAxis.size, nz = zAxis.size, nu = uAxis.size,
      periodicX = periodic)
    val vals = WindowedTileJoin.evaluate(spark, probesT, cellsT,
      arity = 4, method = method, zMethod = zMethod, uMethod = uMethod,
      n = n, tileXY = tXY, tilePlane = tPl,
      xFront = xAxis.front, xStep = xAxis.step,
      yFront = yAxis.front, yStep = yAxis.step,
      xVals = if (regular) null else xAxis.values,
      yVals = if (regular) null else yAxis.values)
    withId.join(vals, Seq("_rid"), "left")
      .withColumn(outputCol, coalesce(col("_v"), lit(Double.NaN)))
      .drop("_rid", "_v")
  }

  /** Univariate interpolation / derivative over a broadcast 1-D grid —
    * the `pyinterp.univariate` / `univariate_derivative` entry points
    * (`regular_grid_interpolator.py` univariate path): the chosen
    * [[graft.core.Univariate1D]] method is fitted ONCE per partition and
    * evaluated per row; `derivative = true` emits the fitted curve's
    * derivative instead of its value.
    */
  def univariate(spark: SparkSession, df: DataFrame, xCol: String,
                 grid: Grid1D, method: String,
                 derivative: Boolean = false,
                 outputCol: String = "value"): DataFrame = {
    val bc = spark.sparkContext.broadcast(grid)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, DoubleType, nullable = false))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val xIdx = df.schema.fieldIndex(xCol)
    val m = method
    val deriv = derivative
    df.mapPartitions { iter =>
      val g = bc.value
      val interp = graft.core.Univariate1D(m)
      val ok = interp.fit(g.axis.values, g.values)
      iter.map { row =>
        val x = row.getDouble(xIdx)
        val v =
          if (!ok) Double.NaN
          else if (deriv) interp.derivative(x)
          else interp.value(x)
        Row.fromSeq(row.toSeq :+ v)
      }
    }(enc)
  }

  /** Trivariate interpolation: bivariate on the two z-bracketing planes,
    * then linear (or nearest) combine along z
    * (`pybind/geometric/trivariate.hpp:46-120`,
    * `pybind/windowed/trivariate.hpp:36-113`).
    */
  def trivariate(spark: SparkSession, df: DataFrame, xCol: String,
                 yCol: String, zCol: String, grid: Grid3D, method: String,
                 zMethod: String = "linear", halfWindow: Int = 3,
                 boundary: Boundary.Value = Boundary.Undef,
                 outputCol: String = "value"): DataFrame = {
    val bc = spark.sparkContext.broadcast(grid)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, DoubleType, nullable = false))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val xIdx = df.schema.fieldIndex(xCol)
    val yIdx = df.schema.fieldIndex(yCol)
    val zIdx = df.schema.fieldIndex(zCol)
    val m = method
    val zm = zMethod
    val hw = halfWindow
    val bdy = boundary
    df.mapPartitions { iter =>
      val g = bc.value
      val nz = g.zAxis.size
      // one bivariate kernel per z-plane, built lazily and cached
      val planes = new Array[BivariateKernel](nz)
      def planeKernel(k: Int): BivariateKernel = {
        if (planes(k) == null) {
          val vals = new Array[Double](g.xAxis.size * g.yAxis.size)
          var i = 0
          while (i < g.xAxis.size) {
            var j = 0
            while (j < g.yAxis.size) {
              vals(i * g.yAxis.size + j) = g(i, j, k)
              j += 1
            }
            i += 1
          }
          planes(k) = new BivariateKernel(
            Grid2D(g.xAxis, g.yAxis, vals), m, hw, bdy)
        }
        planes(k)
      }
      iter.map { row =>
        val x = row.getDouble(xIdx)
        val y = row.getDouble(yIdx)
        val z = row.getDouble(zIdx)
        val v = g.zAxis.findIndexes(z) match {
          case None => Double.NaN
          case Some((k0, k1)) =>
            val z0 = g.zAxis(k0)
            val z1 = g.zAxis(k1)
            if (zm == "nearest") {
              val k = if (math.abs(z - z0) <= math.abs(z1 - z)) k0 else k1
              planeKernel(k)(x, y)
            } else {
              val v0 = planeKernel(k0)(x, y)
              val v1 = planeKernel(k1)(x, y)
              val t = if (z1 == z0) 0.0 else (z - z0) / (z1 - z0)
              v0 + t * (v1 - v0)
            }
        }
        Row.fromSeq(row.toSeq :+ v)
      }
    }(enc)
  }
}

/** Quadrivariate: 2 (or 4) bivariate surfaces on the bracketing (z, u)
  * planes, then linear/nearest combine along z and u
  * (`pybind/windowed/quadrivariate.hpp`, `pybind/geometric/
  * quadrivariate.hpp` structure). Companion to
  * [[GridInterpolator.trivariate]].
  */
object QuadrivariateInterpolator {
  def quadrivariate(spark: SparkSession, df: DataFrame, xCol: String,
                    yCol: String, zCol: String, uCol: String, grid: Grid4D,
                    method: String, zMethod: String = "linear",
                    uMethod: String = "linear", halfWindow: Int = 3,
                    boundary: Boundary.Value = Boundary.Undef,
                    outputCol: String = "value"): DataFrame = {
    val bc = spark.sparkContext.broadcast(grid)
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, DoubleType, nullable = false))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val xIdx = df.schema.fieldIndex(xCol)
    val yIdx = df.schema.fieldIndex(yCol)
    val zIdx = df.schema.fieldIndex(zCol)
    val uIdx = df.schema.fieldIndex(uCol)
    val m = method
    val zm = zMethod
    val um = uMethod
    val hw = halfWindow
    val bdy = boundary
    df.mapPartitions { iter =>
      val g = bc.value
      // per-(z-plane, u-level) bivariate kernels, built lazily
      val kernels = new java.util.HashMap[(Int, Int), BivariateKernel]()
      def kernel(k: Int, l: Int): BivariateKernel = {
        var kr = kernels.get((k, l))
        if (kr == null) {
          val vals = new Array[Double](g.xAxis.size * g.yAxis.size)
          var i = 0
          while (i < g.xAxis.size) {
            var j = 0
            while (j < g.yAxis.size) {
              vals(i * g.yAxis.size + j) = g(i, j, k, l)
              j += 1
            }
            i += 1
          }
          kr = new BivariateKernel(Grid2D(g.xAxis, g.yAxis, vals), m, hw, bdy)
          kernels.put((k, l), kr)
        }
        kr
      }
      def alongZ(x: Double, y: Double, z: Double, l: Int): Double =
        g.zAxis.findIndexes(z) match {
          case None => Double.NaN
          case Some((k0, k1)) =>
            val z0 = g.zAxis(k0)
            val z1 = g.zAxis(k1)
            if (zm == "nearest") {
              val k = if (math.abs(z - z0) <= math.abs(z1 - z)) k0 else k1
              kernel(k, l)(x, y)
            } else {
              val v0 = kernel(k0, l)(x, y)
              val v1 = kernel(k1, l)(x, y)
              val t = if (z1 == z0) 0.0 else (z - z0) / (z1 - z0)
              v0 + t * (v1 - v0)
            }
        }
      iter.map { row =>
        val x = row.getDouble(xIdx)
        val y = row.getDouble(yIdx)
        val z = row.getDouble(zIdx)
        val u = row.getDouble(uIdx)
        val v = g.uAxis.findIndexes(u) match {
          case None => Double.NaN
          case Some((l0, l1)) =>
            val u0 = g.uAxis(l0)
            val u1 = g.uAxis(l1)
            if (um == "nearest") {
              val l = if (math.abs(u - u0) <= math.abs(u1 - u)) l0 else l1
              alongZ(x, y, z, l)
            } else {
              val v0 = alongZ(x, y, z, l0)
              val v1 = alongZ(x, y, z, l1)
              val t = if (u1 == u0) 0.0 else (u - u0) / (u1 - u0)
              v0 + t * (v1 - v0)
            }
        }
        Row.fromSeq(row.toSeq :+ v)
      }
    }(enc)
  }
}

/** Per-partition bivariate kernel with the geometric / windowed dispatch
  * of `pyinterp/regular_grid_interpolator.py:45-63`. Windowed path keeps
  * a per-instance window cache (reload only when the query leaves the
  * cached window — `math/interpolate/cache.hpp` behavior), so feeding
  * cell-sorted partitions makes consecutive lookups cache hits.
  */
final class BivariateKernel(grid: Grid2D, method: String, halfWindow: Int,
                            boundary: Boundary.Value) extends Serializable {
  private val xAxis = grid.xAxis
  private val yAxis = grid.yAxis

  // window cache state (windowed methods)
  private var cachedXIdx: Array[Int] = null
  private var cachedYIdx: Array[Int] = null
  private var cachedBicubic: Bicubic = null
  private var cachedXs: Array[Double] = null
  private var cachedYs: Array[Double] = null
  private var cachedZ: Array[Array[Double]] = null

  def apply(x: Double, y: Double): Double = method match {
    case "bilinear" | "idw" | "nearest" => geometric(x, y)
    case "bicubic" => windowedBicubic(x, y)
    case "spline_bilinear" => windowedSplineLinear(x, y)
    // windowed separable univariate methods
    // (`regular_grid_interpolator.py:49-63` windowed set)
    case "akima" | "akima_periodic" | "c_spline" | "c_spline_not_a_knot" |
         "c_spline_periodic" | "linear" | "polynomial" | "steffen" =>
      windowedSeparable(x, y)
    case other => throw new IllegalArgumentException(s"method $other")
  }

  @transient private lazy val uniY = graft.core.Univariate1D(method)
  // reused across evaluations: window shapes are constant per kernel
  @transient private var sepTmp: Array[Double] = null
  // per-window cached row fits: the x-direction fits are query-independent,
  // so an unchanged window answers each probe with evaluations + ONE
  // y-direction fit instead of (rows+1) fits (the q_akima_grid hot spot)
  @transient private var sepRowFits: Array[graft.core.Univariate1D] = null
  @transient private var sepRowOk: Array[Boolean] = null
  private var sepFitsValid = false

  /** Separable application of a univariate method: fit along x for each
    * window row, then along y (`math/interpolate/bivariate/spline.hpp`
    * structure generalized to every univariate kernel).
    */
  private def windowedSeparable(x: Double, y: Double): Double = {
    if (!loadWindow(x, y)) return Double.NaN
    val xq = queryX(x)
    val ny = cachedYs.length
    if (sepTmp == null || sepTmp.length != ny)
      sepTmp = new Array[Double](ny)
    if (!sepFitsValid) {
      if (sepRowFits == null || sepRowFits.length != ny) {
        sepRowFits = Array.fill(ny)(graft.core.Univariate1D(method))
        sepRowOk = new Array[Boolean](ny)
      }
      var j = 0
      while (j < ny) {
        // fresh slice per row: fit() retains the array reference
        val colv = new Array[Double](cachedXs.length)
        var i = 0
        while (i < cachedXs.length) { colv(i) = cachedZ(i)(j); i += 1 }
        sepRowOk(j) = sepRowFits(j).fit(cachedXs, colv)
        j += 1
      }
      sepFitsValid = true
    }
    var j = 0
    while (j < ny) {
      if (!sepRowOk(j)) return Double.NaN
      sepTmp(j) = sepRowFits(j).value(xq)
      j += 1
    }
    if (!uniY.fit(cachedYs, sepTmp)) return Double.NaN
    uniY.value(y)
  }

  private def geometric(x: Double, y: Double): Double = {
    val fx = xAxis.findIndexes(x)
    val fy = yAxis.findIndexes(y)
    if (fx.isEmpty || fy.isEmpty) return Double.NaN
    val (i0, i1) = fx.get
    val (j0, j1) = fy.get
    val x0 = xAxis(i0)
    var x1 = xAxis(i1)
    val y0 = yAxis(j0)
    val y1 = yAxis(j1)
    // periodic seam: keep x1 on the +period side of x0
    var xq = xAxis.normalize(x)
    if (xAxis.isPeriodic && x1 < x0) x1 += xAxis.period
    if (xAxis.isPeriodic && xq < x0) xq += xAxis.period
    val q00 = grid(i0, j0)
    val q01 = grid(i0, j1)
    val q10 = grid(i1, j0)
    val q11 = grid(i1, j1)
    method match {
      case "bilinear" => Interpolate.bilinear(xq, y, x0, y0, x1, y1, q00, q01, q10, q11)
      case "idw" => Interpolate.idw4(xq, y, x0, y0, x1, y1, q00, q01, q10, q11)
      case "nearest" => Interpolate.nearest4(xq, y, x0, y0, x1, y1, q00, q01, q10, q11)
    }
  }

  private def loadWindow(x: Double, y: Double): Boolean = {
    val wx = xAxis.window(x, halfWindow, boundary)
    val wy = yAxis.window(y, halfWindow, boundary)
    if (wx.isEmpty || wy.isEmpty) return false
    val xi = wx.get._1
    val yi = wy.get._1
    if (cachedXIdx != null && java.util.Arrays.equals(xi, cachedXIdx) &&
        java.util.Arrays.equals(yi, cachedYIdx)) return true
    val xs = new Array[Double](xi.length)
    var unwrapOffset = 0.0
    var prev = Double.NegativeInfinity
    var i = 0
    while (i < xi.length) {
      var xv = xAxis(xi(i)) + unwrapOffset
      if (xAxis.isPeriodic && xv <= prev) { // wrap across seam
        unwrapOffset += xAxis.period
        xv = xAxis(xi(i)) + unwrapOffset
      }
      xs(i) = xv
      prev = xv
      i += 1
    }
    val ys = yi.map(yAxis(_))
    val z = Array.ofDim[Double](xi.length, yi.length)
    i = 0
    while (i < xi.length) {
      var j = 0
      while (j < yi.length) {
        z(i)(j) = grid(xi(i), yi(j))
        j += 1
      }
      i += 1
    }
    cachedXIdx = xi
    cachedYIdx = yi
    cachedXs = xs
    cachedYs = ys
    cachedZ = z
    cachedBicubic = null
    sepFitsValid = false
    true
  }

  /** Normalize query x into the cached (possibly unwrapped) window. */
  private def queryX(x: Double): Double = {
    if (!xAxis.isPeriodic) return x
    var xq = xAxis.normalize(x)
    if (xq < cachedXs(0)) xq += xAxis.period
    xq
  }

  private def windowedBicubic(x: Double, y: Double): Double = {
    if (!loadWindow(x, y)) return Double.NaN
    if (cachedBicubic == null)
      cachedBicubic = new Bicubic(cachedXs, cachedYs, cachedZ)
    cachedBicubic(queryX(x), y)
  }

  /** Separable spline: cspline along x for each window row, then along y
    * (`math/interpolate/bivariate/spline.hpp` behavior).
    */
  private def windowedSplineLinear(x: Double, y: Double): Double = {
    if (!loadWindow(x, y)) return Double.NaN
    val xq = queryX(x)
    val tmp = new Array[Double](cachedYs.length)
    var j = 0
    while (j < cachedYs.length) {
      val colv = new Array[Double](cachedXs.length)
      var i = 0
      while (i < cachedXs.length) { colv(i) = cachedZ(i)(j); i += 1 }
      tmp(j) = Interpolate.cspline(cachedXs, colv, xq)
      j += 1
    }
    Interpolate.cspline(cachedYs, tmp, y)
  }
}

/** One assembled (2·halfWindow)² window's kernel: the SAME evaluation as
  * [[BivariateKernel]] — lazily-built [[graft.core.Bicubic]], per-row
  * separable [[graft.core.Univariate1D]] fits, or cspline
  * (spline_bilinear) — over a fixed window. The tile-local evaluation
  * stage of [[WindowedTileJoin]] builds one per window (per bracketing
  * z/u plane on the 3-D/4-D paths) from its dense cell block.
  */
private[operators] final class WindowFit(method: String, n: Int,
    xs: Array[Double], ys: Array[Double], z: Array[Array[Double]]) {
  private var bicubic: Bicubic = null
  private var rowFits: Array[graft.core.Univariate1D] = null
  private var rowOk: Array[Boolean] = null
  private var sepFitsValid = false
  private lazy val uniY = graft.core.Univariate1D(method)
  private val sepTmp = new Array[Double](n)

  def eval(x: Double, y: Double): Double = method match {
    case "bicubic" =>
      if (bicubic == null) bicubic = new Bicubic(xs, ys, z)
      bicubic(x, y)
    case "spline_bilinear" => splineLinear(x, y)
    case _ => sepEval(x, y)
  }

  /** Mirror of [[BivariateKernel]].windowedSeparable: fit along x per
    * window row (cached for the window's lifetime), evaluate, fit along y.
    */
  private def sepEval(x: Double, y: Double): Double = {
    if (!sepFitsValid) {
      rowFits = Array.fill(n)(graft.core.Univariate1D(method))
      rowOk = new Array[Boolean](n)
      var j = 0
      while (j < n) {
        val colv = new Array[Double](n)
        var i = 0
        while (i < n) { colv(i) = z(i)(j); i += 1 }
        rowOk(j) = rowFits(j).fit(xs, colv)
        j += 1
      }
      sepFitsValid = true
    }
    var j = 0
    while (j < n) {
      if (!rowOk(j)) return Double.NaN
      sepTmp(j) = rowFits(j).value(x)
      j += 1
    }
    if (!uniY.fit(ys, sepTmp)) return Double.NaN
    uniY.value(y)
  }

  /** Mirror of [[BivariateKernel]].windowedSplineLinear. */
  private def splineLinear(x: Double, y: Double): Double = {
    val tmp = new Array[Double](n)
    var j = 0
    while (j < n) {
      val colv = new Array[Double](n)
      var i = 0
      while (i < n) { colv(i) = z(i)(j); i += 1 }
      tmp(j) = Interpolate.cspline(xs, colv, x)
      j += 1
    }
    Interpolate.cspline(ys, tmp, y)
  }
}
