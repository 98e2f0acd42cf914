package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Geodesics, Spheroid}

/** DataFrame faces of the geodesic strategy family
  * (`geometry/geographic/algorithms/{distance,azimuth,area}.hpp`): one
  * narrow map stage per call — no shuffle, scales linearly, and the
  * per-partition kernel reuses the spheroid constants.
  */
object GeodesicOps {

  /** Appends `dist_<method>` (m) for each requested strategy plus
    * `az_fwd` / `az_rev` (Vincenty azimuths, degrees) to a table of
    * (lon1, lat1, lon2, lat2) rows. Input columns are read by name; all
    * other columns pass through unchanged via the row id.
    */
  def inverse(spark: SparkSession, df: DataFrame, idCol: String,
              lon1: String, lat1: String, lon2: String, lat2: String,
              methods: Seq[String] = Seq("andoyer", "thomas", "vincenty",
                "karney"),
              spheroid: Spheroid = Spheroid.Wgs84,
              vincentyFixedIterations: Int = 0): DataFrame = {
    import spark.implicits._
    val ms = methods
    val sph = spheroid
    val fixed = vincentyFixedIterations
    val rows = df.select(col(idCol).cast("long"),
        col(lon1).cast("double"), col(lat1).cast("double"),
        col(lon2).cast("double"), col(lat2).cast("double"))
      .as[(Long, Double, Double, Double, Double)]
      .mapPartitions { iter =>
        iter.map { case (id, x1, y1, x2, y2) =>
          val dists = ms.map {
            // fixed iteration count = deterministic mirror of vincentySql
            case "vincenty" if fixed > 0 =>
              Geodesics.vincenty(x1, y1, x2, y2, sph, 100, fixed).distance
            case m => Geodesics.distance(m, x1, y1, x2, y2, sph)
          }.toArray
          val vin = Geodesics.vincenty(x1, y1, x2, y2, sph)
          (id, dists, vin.azimuth, vin.reverseAzimuth)
        }
      }
    val base = rows.toDF(idCol, "_dists", "az_fwd", "az_rev")
    ms.zipWithIndex.foldLeft(base) { case (d, (m, i)) =>
      d.withColumn(s"dist_$m", element_at(col("_dists"), i + 1))
    }.drop("_dists")
  }

  /** Exact ellipsoidal area (m^2) of lon/lat rectangles
    * (`bilinear_weights.hpp` area kernel; also the geohash cell-area
    * upgrade over spherical excess, `geohash/int64.hpp:124-136`).
    */
  def rectangleArea(spark: SparkSession, df: DataFrame, idCol: String,
                    lon0: String, lat0: String, lon1: String, lat1: String,
                    spheroid: Spheroid = Spheroid.Wgs84): DataFrame = {
    import spark.implicits._
    val sph = spheroid
    df.select(col(idCol).cast("long"),
        col(lon0).cast("double"), col(lat0).cast("double"),
        col(lon1).cast("double"), col(lat1).cast("double"))
      .as[(Long, Double, Double, Double, Double)]
      .map { case (id, x0, y0, x1, y1) =>
        (id, Geodesics.rectangleArea(x0, y0, x1, y1, sph))
      }
      .toDF(idCol, "area_m2")
  }

  /** DuckDB-runnable SQL expression computing the Vincenty distance with
    * a FIXED unrolled iteration count — arithmetic mirrors
    * [[graft.core.Geodesics.vincenty]] term by term, so the only
    * cross-engine divergence is libm ulp noise (absorbed by rounding).
    */
  def vincentySql(lon1: String, lat1: String, lon2: String, lat2: String,
                  iterations: Int = 8,
                  spheroid: Spheroid = Spheroid.Wgs84): String = {
    val f = spheroid.f
    val a = spheroid.a
    val b = spheroid.b
    // reduced latitudes and base longitude difference
    val u1 = s"atan((1.0 - $f) * tan(radians($lat1)))"
    val u2 = s"atan((1.0 - $f) * tan(radians($lat2)))"
    val lRad = s"radians((((($lon2) - ($lon1)) % 360.0 + 540.0) % 360.0) - 180.0)"
    val sb = new StringBuilder
    sb ++= s"(WITH _v0 AS (SELECT $u1 AS u1v, $u2 AS u2v, $lRad AS lv), "
    sb ++= "_v1 AS (SELECT sin(u1v) AS su1, cos(u1v) AS cu1, " +
      "sin(u2v) AS su2, cos(u2v) AS cu2, lv FROM _v0), "
    var prev = "_v1"
    var lamExpr = "lv"
    for (i <- 0 until iterations) {
      val t = s"_it$i"
      sb ++= s"$t AS (SELECT su1, cu1, su2, cu2, lv, " +
        s"sin($lamExpr) AS sl, cos($lamExpr) AS cl FROM $prev), "
      val tB = s"_ib$i"
      sb ++= s"$tB AS (SELECT su1, cu1, su2, cu2, lv, sl, cl, " +
        "sqrt((cu2*sl)*(cu2*sl) + (cu1*su2 - su1*cu2*cl)*(cu1*su2 - su1*cu2*cl)) AS ss, " +
        s"su1*su2 + cu1*cu2*cl AS cs FROM $t), "
      val tC = s"_ic$i"
      sb ++= s"$tC AS (SELECT *, atan2(ss, cs) AS sg, " +
        "cu1*cu2*sl / ss AS sa FROM " + tB + "), "
      val tD = s"_id$i"
      sb ++= s"$tD AS (SELECT *, 1.0 - sa*sa AS c2a FROM $tC), "
      val tE = s"_ie$i"
      sb ++= s"$tE AS (SELECT *, CASE WHEN c2a = 0.0 THEN 0.0 " +
        s"ELSE cs - 2.0*su1*su2/c2a END AS c2sm, " +
        s"$f/16.0*c2a*(4.0 + $f*(4.0 - 3.0*c2a)) AS cc FROM $tD), "
      prev = tE
      lamExpr = s"lv + (1.0 - cc)*$f*sa*(sg + cc*ss*(c2sm + cc*cs*" +
        "(-1.0 + 2.0*c2sm*c2sm)))"
    }
    // final evaluation with the last iteration's sigma terms
    sb ++= s"_fin AS (SELECT *, c2a*($a*$a - $b*$b)/($b*$b) AS us FROM $prev) "
    sb ++= "SELECT " +
      s"$b * (1.0 + us/16384.0*(4096.0 + us*(-768.0 + us*(320.0 - 175.0*us)))) * " +
      "(sg - (us/1024.0*(256.0 + us*(-128.0 + us*(74.0 - 47.0*us)))) * ss * " +
      "(c2sm + (us/1024.0*(256.0 + us*(-128.0 + us*(74.0 - 47.0*us))))/4.0 * " +
      "(cs*(-1.0 + 2.0*c2sm*c2sm) - " +
      "(us/1024.0*(256.0 + us*(-128.0 + us*(74.0 - 47.0*us))))/6.0 * c2sm * " +
      "(-3.0 + 4.0*ss*ss)*(-3.0 + 4.0*c2sm*c2sm)))) FROM _fin)"
    sb.toString
  }

  /** DuckDB SQL mirror of [[Geodesics.andoyer]] (term-by-term). */
  def andoyerSql(lon1: String, lat1: String, lon2: String, lat2: String,
                 spheroid: Spheroid = Spheroid.Wgs84): String = {
    val f = spheroid.f
    val a = spheroid.a
    val dl = s"radians((((($lon2) - ($lon1)) % 360.0 + 540.0) % 360.0) - 180.0)"
    s"""(WITH _a0 AS (SELECT (radians($lat1) + radians($lat2))/2.0 AS fm,
       | (radians($lat1) - radians($lat2))/2.0 AS gm, ($dl)/2.0 AS lm),
       | _a1 AS (SELECT sin(gm) AS sg, cos(gm) AS cg, sin(fm) AS sf,
       |  cos(fm) AS cf, sin(lm) AS sl, cos(lm) AS cl FROM _a0),
       | _a2 AS (SELECT sg*sg*cl*cl + cf*cf*sl*sl AS s,
       |  cg*cg*cl*cl + sf*sf*sl*sl AS c, sf, cf, sg, cg FROM _a1),
       | _a3 AS (SELECT s, c, sf, cf, sg, cg, atan(sqrt(s/c)) AS om FROM _a2),
       | _a4 AS (SELECT s, c, sf, cf, sg, cg, om, sqrt(s*c)/om AS r,
       |  2.0*om*$a AS d FROM _a3)
       |SELECT CASE WHEN s = 0.0 THEN 0.0 ELSE
       | d*(1.0 + $f*((3.0*r - 1.0)/(2.0*c))*sf*sf*cg*cg
       |        - $f*((3.0*r + 1.0)/(2.0*s))*cf*cf*sg*sg) END
       |FROM _a4)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB SQL mirror of [[Geodesics.thomas]] (term-by-term). */
  def thomasSql(lon1: String, lat1: String, lon2: String, lat2: String,
                spheroid: Spheroid = Spheroid.Wgs84): String = {
    val f = spheroid.f
    val a = spheroid.a
    val dl = s"radians((((($lon2) - ($lon1)) % 360.0 + 540.0) % 360.0) - 180.0)"
    s"""(WITH _t0 AS (SELECT atan((1.0 - $f)*tan(radians($lat1))) AS t1,
       |  atan((1.0 - $f)*tan(radians($lat2))) AS t2, $dl AS dl),
       | _t1 AS (SELECT (t1 + t2)/2.0 AS tm, (t2 - t1)/2.0 AS dtm,
       |  dl/2.0 AS dlm FROM _t0),
       | _t2 AS (SELECT sin(tm) AS stm, cos(tm) AS ctm, sin(dtm) AS sdtm,
       |  cos(dtm) AS cdtm, sin(dlm) AS sdlm FROM _t1),
       | _t3 AS (SELECT stm, ctm, sdtm, cdtm,
       |  sdtm*sdtm + (ctm*ctm - sdtm*sdtm)*sdlm*sdlm AS l FROM _t2),
       | _t4 AS (SELECT stm, ctm, sdtm, cdtm, l, 1.0 - 2.0*l AS cd,
       |  acos(1.0 - 2.0*l) AS d FROM _t3),
       | _t5 AS (SELECT l, cd, d, sin(d) AS sd,
       |  2.0*stm*stm*cdtm*cdtm/(1.0 - l) AS u,
       |  2.0*sdtm*sdtm*ctm*ctm/l AS v FROM _t4),
       | _t6 AS (SELECT l, cd, d, sd, u + v AS x, u - v AS y, d/sd AS t
       |  FROM _t5),
       | _t7 AS (SELECT l, cd, sd, x, y, t, 4.0*t*t AS dd, 2.0*cd AS e
       |  FROM _t6)
       |SELECT CASE WHEN l <= 0.0 THEN 0.0 ELSE
       | $a*sd*(t - $f*(t*x - y)/4.0
       |  + ($f*$f/64.0)*(x*(dd*e + (t - (dd*e - e)/2.0)*x)
       |    - y*(2.0*dd + e*y) + dd*x*y)) END
       |FROM _t7)""".stripMargin.replace("\n", " ")
  }
}
