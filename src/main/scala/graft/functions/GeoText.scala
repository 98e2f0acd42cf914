package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField,
  StructType}

/** WKT / GeoJSON interchange for the engine's flat-ring geometry columns
  * (`array<double>` interleaved x,y; polygons as `array<array<double>>`
  * rings, exterior first) — the reference's text bindings
  * (`cxx/src/pybind/geometry/geographic/algorithm/wkt_geographic.cpp`,
  * `geojson_geographic.cpp`) re-expressed as pure Catalyst column
  * expressions: string building and parsing stay inside whole-stage
  * codegen, no UDFs, fully distributed.
  *
  * Numbers render with Spark's double->string formatting ("3.0",
  * "0.25"); scientific notation appears for |x| >= 1e7 like Java's
  * Double.toString (document-scale coordinates never hit it). Rings are
  * EMITTED closed (first vertex repeated), matching boost's closed WKT
  * output, while the engine stores rings unclosed — [[dropClosing]]
  * normalizes parsed rings back.
  */
object GeoText {

  private def fmt(d: Column): Column = d.cast("string")

  /** "x y, x y, ..." body of one flat ring, closed. */
  private def ringBody(ring: Column): Column = {
    val pairs = transform(sequence(lit(0), ((size(ring) / 2) - 1).cast("int")), i =>
      concat_ws(" ", fmt(element_at(ring, i * 2 + 1)),
        fmt(element_at(ring, i * 2 + 2))))
    val closed = concat(pairs, array(concat_ws(" ",
      fmt(element_at(ring, 1)), fmt(element_at(ring, 2)))))
    array_join(closed, ", ")
  }

  def asWktPoint(x: Column, y: Column): Column =
    concat(lit("POINT ("), fmt(x), lit(" "), fmt(y), lit(")"))

  /** LINESTRING from a flat line column (not closed). */
  def asWktLineString(line: Column): Column = {
    val pairs = transform(sequence(lit(0), ((size(line) / 2) - 1).cast("int")), i =>
      concat_ws(" ", fmt(element_at(line, i * 2 + 1)),
        fmt(element_at(line, i * 2 + 2))))
    concat(lit("LINESTRING ("), array_join(pairs, ", "), lit(")"))
  }

  /** POLYGON from rings (`array<array<double>>`: exterior, then holes). */
  def asWktPolygon(rings: Column): Column =
    concat(lit("POLYGON ("),
      array_join(transform(rings, r =>
        concat(lit("("), ringBody(r), lit(")"))), ", "),
      lit(")"))

  /** POLYGON of a single exterior flat ring. */
  def asWktPolygonRing(ring: Column): Column = asWktPolygon(array(ring))

  /** MULTIPOLYGON from `array<array<array<double>>>` (polygons of rings). */
  def asWktMultiPolygon(polys: Column): Column =
    concat(lit("MULTIPOLYGON ("),
      array_join(transform(polys, p => concat(lit("("),
        array_join(transform(p, r =>
          concat(lit("("), ringBody(r), lit(")"))), ", "),
        lit(")"))), ", "),
      lit(")"))

  /** Parse "POINT (x y)" -> `array<double>` of length 2. */
  def fromWktPoint(wkt: Column): Column =
    transform(split(regexp_replace(regexp_replace(trim(wkt),
      "^POINT\\s*\\(", ""), "\\)$", ""), "\\s+"), s => s.cast("double"))

  /** Parse "LINESTRING (x y, ...)" -> flat `array<double>`. */
  def fromWktLineString(wkt: Column): Column =
    flatten(transform(split(regexp_replace(regexp_replace(trim(wkt),
        "^LINESTRING\\s*\\(", ""), "\\)$", ""), ",\\s*"), p =>
      transform(split(trim(p), "\\s+"), s => s.cast("double"))))

  /** Parse "POLYGON ((...), (...))" -> `array<array<double>>` rings.
    * The closing vertex is kept exactly as written; apply
    * [[dropClosing]] per ring to get the engine's unclosed storage.
    */
  def fromWktPolygon(wkt: Column): Column = {
    val inner = regexp_replace(regexp_replace(trim(wkt),
      "^POLYGON\\s*\\(\\s*\\(", ""), "\\)\\s*\\)$", "")
    transform(split(inner, "\\)\\s*,\\s*\\("), r =>
      flatten(transform(split(r, ",\\s*"), p =>
        transform(split(trim(p), "\\s+"), s => s.cast("double")))))
  }

  /** Drop the closing vertex of a flat ring when first == last. */
  def dropClosing(ring: Column): Column = {
    val n = size(ring)
    when(n >= 4 &&
        element_at(ring, 1) === element_at(ring, n - 1) &&
        element_at(ring, 2) === element_at(ring, n),
      slice(ring, lit(1), n - 2)).otherwise(ring)
  }

  /** One closed GeoJSON ring: "[[x,y],...]". */
  private def ringJson(r: Column): Column = {
    val pts = transform(sequence(lit(0), ((size(r) / 2) - 1).cast("int")), i =>
      concat(lit("["), fmt(element_at(r, i * 2 + 1)), lit(","),
        fmt(element_at(r, i * 2 + 2)), lit("]")))
    val closed = concat(pts, array(concat(lit("["),
      fmt(element_at(r, 1)), lit(","), fmt(element_at(r, 2)), lit("]"))))
    concat(lit("["), array_join(closed, ","), lit("]"))
  }

  /** GeoJSON Polygon geometry from rings (`array<array<double>>`). */
  def asGeoJsonPolygon(rings: Column): Column =
    concat(lit("{\"type\":\"Polygon\",\"coordinates\":["),
      array_join(transform(rings, r => ringJson(r)), ","), lit("]}"))

  private val geoJsonPolygonSchema = StructType(Seq(
    StructField("coordinates",
      ArrayType(ArrayType(ArrayType(DoubleType))))))

  /** Parse a GeoJSON Polygon -> `array<array<double>>` flat rings
    * (closing vertices kept; normalize with [[dropClosing]]).
    */
  def fromGeoJsonPolygon(json: Column): Column =
    transform(from_json(json, geoJsonPolygonSchema).getField("coordinates"),
      r => flatten(r))
}
