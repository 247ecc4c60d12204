package graft

import graft.functions.Cleaners
import graft.osm.{OsmCsv, OsmModel, Workload}
import org.apache.spark.sql.functions._

/** Inverse golden tests (SURVEY.md §5.2 item 1) against the reference's
  * committed ETL outputs: /root/reference/ways.csv (22,391 rows) and
  * ways_tags.csv (108,541 rows). The input OSM extract was pruned from the
  * reference repo, so instead of re-running the ETL we assert that the
  * committed output is a fixed point of OUR operators — every split key
  * round-trips through keySplit, published counts match, etc. */
class GoldenWaysSpec extends SparkTestBase {

  private lazy val ways =
    OsmCsv.read(spark, "/root/reference/ways.csv", OsmModel.waysSchema).cache()
  private lazy val wayTags =
    OsmCsv.read(spark, "/root/reference/ways_tags.csv", OsmModel.tagsSchema).cache()

  test("published way count matches (Readme.md:163–165)") {
    assert(Workload.tableCount(ways) === 22391L)
  }

  test("golden ways_tags row count") {
    assert(Workload.tableCount(wayTags) === 108541L)
  }

  test("T1 invariant: split keys round-trip through keySplit") {
    // For every split row, applying our T1 to the reconstructed raw key
    // must reproduce exactly the committed (type, key).
    val split = wayTags.filter(col("type") =!= "regular")
      .withColumn("raw", concat(col("type"), lit(":"), col("key")))
    val mismatches = split.filter(
      Cleaners.keyType(col("raw")) =!= col("type") ||
        Cleaners.keyTail(col("raw")) =!= col("key"))
    assert(mismatches.count() === 0)
    assert(split.count() > 30000) // sanity: the invariant isn't vacuous
  }

  test("T1 invariant: regular keys do not match LOWER_COLON") {
    val bad = wayTags.filter(col("type") === "regular")
      .filter(col("key").rlike(Cleaners.LowerColon))
    assert(bad.count() === 0)
  }

  test("way-branch rule: raw (uncleaned) postcodes and phones survive") {
    // SURVEY.md §2.3: the way branch does NO value cleaning — the golden
    // file must contain un-normalized values.
    val rawPostcodes = wayTags.filter(
      col("key") === "postcode" && col("value").rlike("^[0-9]{4}[A-Z]{2}$"))
    assert(rawPostcodes.count() > 0)
  }

  test("type distribution matches the golden file") {
    // Ground truth independently verified with Python's csv module (the
    // reference's own writer dialect): regular=70397. (FIXTURES.md §1's
    // 70358 was a survey-time miscount under a different quote handling.)
    val dist = wayTags.groupBy("type").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dist === Seq(("regular", 70397L), ("ref", 16647L),
      ("source", 16630L), ("addr", 3089L)))
  }

  test("workload shapes run over golden data (A3/O1 on way_tags)") {
    // The Readme's top-k amenity query runs on node_tags (pruned); the same
    // operator over way_tags must agree with an independent computation.
    val topHighway = wayTags.filter(col("key") === "highway")
      .groupBy("value").agg(count(lit(1)).as("num"))
      .orderBy(col("num").desc, col("value")).limit(1).collect()
    val expected = wayTags.filter(col("key") === "highway")
      .collect().map(_.getString(2)).groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy { case (v, n) => (-n, v) }.head
    assert(topHighway.head.getString(0) === expected._1)
    assert(topHighway.head.getLong(1) === expected._2.toLong)
  }

  test("pythonCsvDialect round-trips the golden ways.csv BYTE-exactly") {
    assertByteExactRoundTrip("/root/reference/ways.csv", "ways", OsmModel.waysSchema)
  }

  test("pythonCsvDialect round-trips golden ways_tags.csv (quoted fields) BYTE-exactly") {
    // ways_tags contains commas and doubled quotes inside values — the
    // stress case for the minimal-quoting dialect
    assertByteExactRoundTrip("/root/reference/ways_tags.csv", "way_tags",
      OsmModel.tagsSchema)
  }

  private def assertByteExactRoundTrip(golden: String, table: String,
                                       schema: org.apache.spark.sql.types.StructType): Unit = {
    val expected = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(golden))
    val out = java.nio.file.Files.createTempDirectory("graft-bytecsv").toFile
    out.deleteOnExit()
    // single input file read into one partition + coalesce(1): row order is
    // partition-local and preserved end to end
    val df = OsmCsv.read(spark, golden, schema).coalesce(1)
    OsmCsv.write(df, out.toString, table, pythonCsvDialect = true)
    val part = out.listFiles().filter(_.getName.endsWith(".csv")).head
    val actual = java.nio.file.Files.readAllBytes(part.toPath)
    assert(actual.length === expected.length,
      s"byte length ${actual.length} != golden ${expected.length}")
    assert(java.util.Arrays.equals(actual, expected), "byte-level diff vs golden")
  }

  test("A2 distinct contributors over ways∪ways runs (shape check)") {
    val n = Workload.distinctContributors(
      ways.select(col("uid")), ways.select(col("uid"))).head().getLong(0)
    assert(n > 100 && n < 22391)
  }
}
