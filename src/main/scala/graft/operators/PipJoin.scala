package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GeoHash, Polygon2D}
import graft.functions.gf

/** Point-in-polygon join with the two-phase filter-refine structure of the
  * reference's spatial queries (cell prune -> exact predicate), and a
  * size-based broadcast-vs-shuffle choice per the north star:
  *
  *   - **small polygon set** (below `broadcastThreshold`): polygons are
  *     broadcast and evaluated as a codegen'd [[graft.functions.StWithin]]
  *     predicate on a broadcast nested-loop join — no shuffle of the
  *     point side at all;
  *   - **large polygon set**: each polygon explodes into its covering
  *     cells (`geohash/int64.hpp:138-163` bounding_boxes semantics),
  *     points carry their cell, a shuffled **equi-join on cell** prunes,
  *     and the exact `within` test refines. Cells fully classified inside
  *     could skip the refine; we keep the uniform refine for exactness.
  *
  * Output: point columns + `poly_id`. Boundary semantics are boost
  * `within` (exclusive) like the reference's vectorized `within=True`
  * path (`for_each_point_within.hpp:36-79`); pass `coveredBy = true` for
  * the inclusive variant.
  */
object PipJoin {

  def join(spark: SparkSession, points: DataFrame, xCol: String, yCol: String,
           polygons: Seq[(Long, Polygon2D)], precision: Int = 20,
           broadcastThreshold: Int = 64, coveredBy: Boolean = false): DataFrame = {
    if (polygons.size <= broadcastThreshold)
      broadcastJoin(spark, points, xCol, yCol, polygons, coveredBy)
    else
      cellJoin(spark, points, xCol, yCol, polygons, precision, coveredBy)
  }

  /** Broadcast path: one boolean predicate column per polygon would blow
    * the plan up for many polygons; instead a single mapPartitions probe
    * over a broadcast in-memory polygon list with a per-partition bbox
    * prefilter. Kept as a DataFrame flatMap to stay typed.
    */
  def broadcastJoin(spark: SparkSession, points: DataFrame, xCol: String,
                    yCol: String, polygons: Seq[(Long, Polygon2D)],
                    coveredBy: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    val bc = spark.sparkContext.broadcast(polygons.toArray)
    val outSchema = StructType(points.schema.fields :+
      StructField("poly_id", LongType, nullable = false))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val xIdx = points.schema.fieldIndex(xCol)
    val yIdx = points.schema.fieldIndex(yCol)
    val inclusive = coveredBy
    points.mapPartitions { iter =>
      val polys = bc.value
      val bboxes = polys.map(_._2.bbox)
      iter.flatMap { row =>
        val x = row.getDouble(xIdx)
        val y = row.getDouble(yIdx)
        polys.indices.iterator.filter { i =>
          val (x0, y0, x1, y1) = bboxes(i)
          x >= x0 && x <= x1 && y >= y0 && y <= y1 &&
            (if (inclusive) polys(i)._2.coveredBy(x, y)
             else polys(i)._2.contains(x, y))
        }.map(i => Row.fromSeq(row.toSeq :+ polys(i)._1))
      }
    }(enc)
  }

  /** Shuffle path: polygon cell covers exploded to a build table
    * (poly_id, cell), points cell-encoded, equi-join + exact refine.
    */
  def cellJoin(spark: SparkSession, points: DataFrame, xCol: String,
               yCol: String, polygons: Seq[(Long, Polygon2D)],
               precision: Int, coveredBy: Boolean = false): DataFrame = {
    import spark.implicits._
    val covers = polygons.flatMap { case (id, poly) =>
      GeoHash.coverPolygon(poly, precision).map(c => (id, c, poly.serialize))
    }.toDF("poly_id", "cell", "poly")
    val withCell = points.withColumn("cell",
      gf.geohash_encode(col(xCol), col(yCol), precision))
    val pred =
      if (coveredBy)
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.StCoveredBy(
            org.apache.spark.sql.graft.ColumnBridge.expression(col(xCol)),
            org.apache.spark.sql.graft.ColumnBridge.expression(col(yCol)),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("poly"))))
      else
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.StWithin(
            org.apache.spark.sql.graft.ColumnBridge.expression(col(xCol)),
            org.apache.spark.sql.graft.ColumnBridge.expression(col(yCol)),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("poly"))))
    withCell
      .join(covers, Seq("cell"), "inner")
      .filter(pred)
      .drop("cell", "poly")
  }
}
