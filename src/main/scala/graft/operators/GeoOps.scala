package graft.operators

import graft.{Q, Tables}
import graft.osm.Geo
import org.apache.spark.sql.functions._

/** Oracle-checked geospatial queries. Coordinates are synthesized
  * deterministically from customer keys (the star schema carries no geo
  * columns); the operators themselves — Z-order bucketing, bbox filtering —
  * are the real surface, and both are pure arithmetic so the DuckDB oracle
  * reproduces them bit-exactly. */
object GeoOps {

  private val Bits = 16

  /** DuckDB-side morton key over qlat/qlon columns. */
  private def mortonDuck(qlat: String, qlon: String): String =
    (0 until Bits).map { b =>
      s"((($qlat >> $b) & 1) << ${2 * b + 1}) + ((($qlon >> $b) & 1) << ${2 * b})"
    }.mkString(" + ")

  val defs: Seq[Q] = Seq(

    Q("q64_geo_zorder",
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    CAST(-90.0 AS DOUBLE) + CAST(c_custkey % 1800 AS DOUBLE) * CAST(0.1 AS DOUBLE) AS lat,
         |    CAST(-180.0 AS DOUBLE) + CAST((c_custkey * 7) % 3600 AS DOUBLE) * CAST(0.1 AS DOUBLE) AS lon
         |  FROM customer),
         |q AS (
         |  SELECT c_custkey, lat, lon,
         |    LEAST(GREATEST(CAST(floor((lat - (-90.0)) / 180.0 * 65536.0) AS BIGINT), 0), 65535) AS qlat,
         |    LEAST(GREATEST(CAST(floor((lon - (-180.0)) / 360.0 * 65536.0) AS BIGINT), 0), 65535) AS qlon
         |  FROM pts)
         |SELECT c_custkey, lat, lon,
         |  ${mortonDuck("qlat", "qlon")} AS morton,
         |  lat >= 40.0 AND lat <= 60.0 AND lon >= 0.0 AND lon <= 20.0 AS in_bbox
         |FROM q ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val lat = lit(-90.0) + (col("c_custkey") % 1800) * 0.1
      val lon = lit(-180.0) + ((col("c_custkey") * 7) % 3600) * 0.1
      Tables.t(s, d, "customer")
        .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
        .select(
          col("c_custkey"), col("lat"), col("lon"),
          Geo.mortonKey(col("lat"), col("lon"), Bits).as("morton"),
          Geo.inBbox(col("lat"), col("lon"), 40.0, 60.0, 0.0, 20.0).as("in_bbox"))
        .orderBy("c_custkey")
    },

    Q("q65_geo_cells",
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    CAST(-90.0 AS DOUBLE) + CAST(c_custkey % 1800 AS DOUBLE) * CAST(0.1 AS DOUBLE) AS lat,
         |    CAST(-180.0 AS DOUBLE) + CAST((c_custkey * 7) % 3600 AS DOUBLE) * CAST(0.1 AS DOUBLE) AS lon
         |  FROM customer),
         |q AS (
         |  SELECT c_custkey, lat, lon,
         |    LEAST(GREATEST(CAST(floor((lat - (-90.0)) / 180.0 * 65536.0) AS BIGINT), 0), 65535) AS qlat,
         |    LEAST(GREATEST(CAST(floor((lon - (-180.0)) / 360.0 * 65536.0) AS BIGINT), 0), 65535) AS qlon
         |  FROM pts),
         |m AS (SELECT c_custkey, ${mortonDuck("qlat", "qlon")} AS morton FROM q)
         |SELECT morton >> 22 AS cell, count(*) AS n,
         |  CAST(min(c_custkey) AS BIGINT) AS first_key
         |FROM m GROUP BY 1 ORDER BY cell""".stripMargin) { (s, d) =>
      val lat = lit(-90.0) + (col("c_custkey") % 1800) * 0.1
      val lon = lit(-180.0) + ((col("c_custkey") * 7) % 3600) * 0.1
      Tables.t(s, d, "customer")
        .select(col("c_custkey"),
          Geo.mortonKey(lat, lon, Bits).as("morton"))
        .groupBy(shiftright(col("morton"), 22).as("cell"))
        .agg(count(lit(1)).as("n"), min("c_custkey").as("first_key"))
        .orderBy("cell")
    }
  )
}
