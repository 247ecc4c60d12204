package graft

import graft.sources.JdbcSink
import org.apache.spark.sql.functions._

/** CSV→DB load parity (SURVEY.md §2.1 S4): the reference imports its CSVs
  * into SQLite and queries them there; this round-trips the shaped OSM
  * tables through an embedded Derby database (the JDBC engine available in
  * the container) and runs a Readme-style query pushed down to the DB. */
class JdbcSinkSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("shaped node table round-trips through a JDBC database") {
    import spark.implicits._
    val nodes = Seq(
      (1001L, 52.37, 4.89, "alice", 42L),
      (1002L, 52.38, 4.90, "bob", 43L),
      (1003L, 52.39, 4.91, "alice", 42L))
      .toDF("id", "lat", "lon", "user", "uid")
    JdbcSink.write(nodes, url, "nodes_jdbc")
    val back = JdbcSink.read(spark, url, "nodes_jdbc")
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ===
      Seq("id", "lat", "lon", "uid", "user"))
    val alice = back.filter(col("uid") === 42L).orderBy("id")
      .collect().map(_.getAs[Long]("id"))
    assert(alice.toSeq === Seq(1001L, 1003L))
  }

  test("EP3 analog: aggregate query pushed down to the external DB") {
    import spark.implicits._
    // k/v names: `key`/`value` are reserved words in Derby's SQL dialect
    val tags = Seq(
      (1L, "amenity", "restaurant"), (2L, "amenity", "restaurant"),
      (3L, "amenity", "cafe"), (4L, "name", "Foo"))
      .toDF("id", "k", "v")
    JdbcSink.write(tags, url, "tags_jdbc",
      columnTypes = Some("k VARCHAR(64), v VARCHAR(1024)"))
    // Spark's JDBC writer quotes column identifiers, so they are stored
    // case-sensitively lowercase — the pushed-down SQL must quote them too
    val counts = JdbcSink.readQuery(spark, url,
      """SELECT "v", count(*) AS num FROM tags_jdbc WHERE "k" = 'amenity' GROUP BY "v"""")
      .collect().map(r => r.getString(0) -> r.getAs[Number](1).longValue).toMap
    assert(counts === Map("restaurant" -> 2L, "cafe" -> 1L))
  }
}
