package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions hook registering the engine's codegen
  * expressions as SQL functions, so `spark.sql("SELECT
  * geohash_encode(lon, lat, 40) ...")` works next to the Column API —
  * the extension-injection pattern the north star calls for. Activate
  * with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * programmatically via `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.table.foreach { case (id, inf, builder) =>
      ext.injectFunction((id, inf, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def fn(name: String, usage: String, arity: Int)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo,
         FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == arity,
          s"$name expects $arity arguments, got ${args.length}")
        build(args)
      })

  private[plans] val table: Seq[(FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder)] = Seq(
    fn("geohash_encode",
      "geohash_encode(lon, lat, precision) - int64 cell id", 3)(a =>
      GeohashEncode(a(0), a(1), a(2))),
    fn("geohash_lon",
      "geohash_lon(hash, precision) - cell centroid longitude", 2)(a =>
      GeohashLon(a(0), a(1))),
    fn("geohash_lat",
      "geohash_lat(hash, precision) - cell centroid latitude", 2)(a =>
      GeohashLat(a(0), a(1))),
    fn("geohash_area",
      "geohash_area(hash, precision) - exact ellipsoidal cell area m^2",
      2)(a => GeohashArea(a(0), a(1))),
    fn("geohash_neighbors",
      "geohash_neighbors(hash, precision) - 8-neighborhood", 2)(a =>
      GeohashNeighbors(a(0), a(1))),
    fn("st_within",
      "st_within(x, y, poly_wkt) - boundary-exclusive containment", 3)(a =>
      StWithin(a(0), a(1), a(2))),
    fn("st_covered_by",
      "st_covered_by(x, y, poly_wkt) - boundary-inclusive containment",
      3)(a => StCoveredBy(a(0), a(1), a(2))),
    fn("haversine",
      "haversine(lon1, lat1, lon2, lat2) - great-circle metres", 4)(a =>
      HaversineDistance(a(0), a(1), a(2), a(3))),
    fn("ecef_distance",
      "ecef_distance(lon1, lat1, lon2, lat2) - ECEF chord metres", 4)(a =>
      EcefDistance(a(0), a(1), a(2), a(3))))

  /** Register into an EXISTING session (e.g. a shell or notebook that was
    * not built with `spark.sql.extensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    table.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
