package graft.osm

import graft.functions.Cleaners
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OSM XML → 5 normalized tables, Spark-first (SURVEY.md §2.1 S1/S2, §2.4).
  *
  * The reference stream-parses with iterparse one element at a time
  * (py:179–186); here the whole shape is declarative: the built-in XML
  * source scans `<node>`/`<way>` row-tags in parallel splits, projection +
  * cleaning are codegen'd expressions, and the child `<tag>`/`<nd>` lists
  * flatten with explode/posexplode (G1/G2). The entire pipeline is narrow —
  * no shuffle — so it scales linearly with input splits.
  *
  * `<relation>` elements are dropped by row-tag selection (S2, py:108/149).
  *
  * Explicit read schemas (no inference): single-child elements then parse as
  * 1-element arrays, and a second schema-inference pass over 100 TB of XML
  * is avoided.
  */
object OsmIngest {

  private val tagArray = ArrayType(StructType(Seq(
    StructField("_k", StringType), StructField("_v", StringType))))

  // Attributes read as strings, typed via try_cast in the projections:
  // the XML source's typed attribute parsing throws on a single malformed
  // value even in PERMISSIVE mode (and ANSI casts would too); try_cast
  // degrades bad cells to null without killing a 100 TB job.
  val nodeReadSchema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("_lat", StringType),
    StructField("_lon", StringType), StructField("_user", StringType),
    StructField("_uid", StringType), StructField("_version", StringType),
    StructField("_changeset", StringType), StructField("_timestamp", StringType),
    StructField("tag", tagArray)))

  val wayReadSchema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("_user", StringType),
    StructField("_uid", StringType), StructField("_version", StringType),
    StructField("_changeset", StringType), StructField("_timestamp", StringType),
    StructField("tag", tagArray),
    StructField("nd", ArrayType(StructType(Seq(StructField("_ref", StringType)))))))

  def readRaw(spark: SparkSession, path: String, rowTag: String,
              schema: StructType): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("attributePrefix", "_")
      // one malformed element must not kill a 100 TB job: unparseable
      // attributes degrade to nulls instead of failing the task
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .load(path)

  def readNodesRaw(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path, "node", nodeReadSchema)

  def readWaysRaw(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path, "way", wayReadSchema)

  private def tc(c: String, t: String) = expr(s"try_cast($c AS $t)")

  /** P1: node attribute projection (py:108–110). */
  def nodes(raw: DataFrame): DataFrame =
    raw.select(
      tc("_id", "BIGINT").as("id"), tc("_lat", "DOUBLE").as("lat"),
      tc("_lon", "DOUBLE").as("lon"), col("_user").as("user"),
      tc("_uid", "BIGINT").as("uid"), tc("_version", "INT").as("version"),
      tc("_changeset", "BIGINT").as("changeset"),
      tc("_timestamp", "TIMESTAMP").as("timestamp"))

  /** G1 + T1 + node-only T2/T3 cleaning (py:111–147).
    * The postcode/phone branches are exclusive if/elif (py:128,131):
    * postcode matches the POST-split key, phone matches the RAW key. */
  def nodeTags(raw: DataFrame): DataFrame = nodeTags(raw, dropProblemTags = false)

  /** dropProblemTags enables the reference's documented-but-never-enforced
    * PROBLEMCHARS rule (py:33 vs py:88 — SURVEY.md §2.3). Default false =
    * the reference's ACTUAL behavior (nothing dropped). */
  def nodeTags(raw: DataFrame, dropProblemTags: Boolean): DataFrame = {
    val exploded0 = raw
      .select(tc("_id", "BIGINT").as("id"), explode(col("tag")).as("t"))
      .select(col("id"), col("t._k").as("k"), col("t._v").as("v"))
    val exploded =
      if (dropProblemTags) exploded0.filter(!Cleaners.hasProblemChars(col("k")))
      else exploded0
    exploded
      .withColumn("key", Cleaners.keyTail(col("k")))
      .withColumn("type", Cleaners.keyType(col("k")))
      .withColumn("value",
        when(col("key") === "postcode", Cleaners.nlPostcode(col("v")))
          .when(col("k") === "phone", Cleaners.nlPhone(col("v")))
          .otherwise(col("v")))
      .select("id", "key", "value", "type")
  }

  /** P2: way attribute projection (py:150–151). */
  def ways(raw: DataFrame): DataFrame =
    raw.select(
      tc("_id", "BIGINT").as("id"), col("_user").as("user"),
      tc("_uid", "BIGINT").as("uid"), tc("_version", "INT").as("version"),
      tc("_changeset", "BIGINT").as("changeset"),
      tc("_timestamp", "TIMESTAMP").as("timestamp"))

  /** G1 + T1 only — the way branch does NO value cleaning (py:160–173;
    * verified in the committed golden output, SURVEY.md §2.3). */
  def wayTags(raw: DataFrame): DataFrame =
    raw.select(tc("_id", "BIGINT").as("id"), explode(col("tag")).as("t"))
      .select(
        col("id"),
        Cleaners.keyTail(col("t._k")).as("key"),
        col("t._v").as("value"),
        Cleaners.keyType(col("t._k")).as("type"))

  /** G2: positional explode of `<nd>` refs — position is the 0-based
    * document order (py:152–159), which posexplode preserves without a
    * window function. */
  def wayNodes(raw: DataFrame): DataFrame =
    raw.select(tc("_id", "BIGINT").as("id"), posexplode(col("nd")).as(Seq("position", "n")))
      .select(col("id"), expr("try_cast(n._ref AS BIGINT)").as("node_id"), col("position"))

  // ---- typed surface: Dataset[T] views of the 5 tables ----

  import OsmModel._

  def nodesDs(spark: SparkSession, raw: DataFrame): Dataset[Node] = {
    import spark.implicits._; nodes(raw).as[Node]
  }
  def nodeTagsDs(spark: SparkSession, raw: DataFrame): Dataset[NodeTag] = {
    import spark.implicits._; nodeTags(raw).as[NodeTag]
  }
  def waysDs(spark: SparkSession, raw: DataFrame): Dataset[Way] = {
    import spark.implicits._; ways(raw).as[Way]
  }
  def wayTagsDs(spark: SparkSession, raw: DataFrame): Dataset[WayTag] = {
    import spark.implicits._; wayTags(raw).as[WayTag]
  }
  def wayNodesDs(spark: SparkSession, raw: DataFrame): Dataset[WayNode] = {
    import spark.implicits._; wayNodes(raw).as[WayNode]
  }

  /** Register the 5 shaped tables as temp views — the SQL surface of EP3
    * (the reference's interactive sqlite> shell, SURVEY.md §3). */
  def registerViews(spark: SparkSession, nodesRaw: DataFrame,
                    waysRaw: DataFrame): Unit = {
    nodes(nodesRaw).createOrReplaceTempView("nodes")
    nodeTags(nodesRaw).createOrReplaceTempView("node_tags")
    ways(waysRaw).createOrReplaceTempView("ways")
    wayTags(waysRaw).createOrReplaceTempView("way_tags")
    wayNodes(waysRaw).createOrReplaceTempView("way_nodes")
  }

  /** The full ETL (EP1, py:206–236): one XML pass per row-tag, 5 CSV sinks.
    * Equivalent of process_map; each output is an independent narrow job. */
  def runEtl(spark: SparkSession, osmPath: String, outDir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val n = readNodesRaw(spark, osmPath).cache()
    val w = readWaysRaw(spark, osmPath).cache()
    // Submit all five sink jobs concurrently: the scheduler overlaps the
    // node-side and way-side parses and the per-table writes (cached raw
    // frames are computed once — RDD cache locks per partition). Serial
    // submission would serialize five scans of work behind one another.
    val jobs = Seq(
      Future(OsmCsv.write(nodes(n), s"$outDir/nodes", "nodes")),
      Future(OsmCsv.write(nodeTags(n), s"$outDir/node_tags", "node_tags")),
      Future(OsmCsv.write(ways(w), s"$outDir/ways", "ways")),
      Future(OsmCsv.write(wayTags(w), s"$outDir/way_tags", "way_tags")),
      Future(OsmCsv.write(wayNodes(w), s"$outDir/way_nodes", "way_nodes")))
    Await.result(Future.sequence(jobs), Duration.Inf)
    n.unpersist(); w.unpersist()
  }
}
