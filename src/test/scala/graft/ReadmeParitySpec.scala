package graft

import graft.osm.{OsmCsv, OsmIngest, OsmModel, Workload}
import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.Files

/** EP1→EP3 end-to-end at REFERENCE CARDINALITY (Readme.md parity).
  *
  * Generates a deterministic synthetic extract with the reference's
  * published shape planted into it — 197,331 nodes / 22,391 ways
  * (Readme.md:158–165), 519 distinct contributors (Readme.md:168–171),
  * 22 'coffee%' names of which 13 match 'coffee%shop%' under
  * case-INsensitive LIKE (Readme.md:189–200), and a 37.33%
  * restaurant+fast-food amenity share (Readme.md:226) — then runs the full
  * ETL (EP1, the CLI code path), reads the CSV outputs back (EP2), and
  * asserts every published number through the Workload queries (EP3).
  */
class ReadmeParitySpec extends SparkTestBase {

  private val NNodes = 197331
  private val NWays = 22391

  /** Runs the ETL once for the whole suite; returns the CSV output dir. */
  private lazy val etlOut: String = {
    val dir = Files.createTempDirectory("graft-readme").toFile
    dir.deleteOnExit()
    val osm = new File(dir, "extract.osm")
    val w = new BufferedWriter(new FileWriter(osm), 1 << 20)
    w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n")
    var i = 1
    while (i <= NNodes) {
      val uid = i % 400 + 1 // node contributors: uids 1..400
      w.write(s"""  <node id="$i" lat="52.${i % 100000}" lon="4.${i % 100000}" user="u$uid" uid="$uid" version="1" changeset="7" timestamp="2015-01-01T00:00:00Z"""")
      // planted tag subsets (all deterministic, all disjoint id ranges)
      val tag: Option[(String, String)] =
        if (i <= 9) Some("name" -> s"COFFEE Corner $i") // coffee%, not shop
        else if (i <= 22) Some("name" -> s"Coffee house Shop $i") // both patterns
        else if (i >= 101 && i <= 292) Some("amenity" -> "restaurant") // 192
        else if (i >= 293 && i <= 380) Some("amenity" -> "fast_food") // 88
        else if (i >= 381 && i <= 510) Some("amenity" -> "cafe") // 130
        else if (i >= 511 && i <= 630) Some("amenity" -> "pub") // 120
        else if (i >= 631 && i <= 730) Some("amenity" -> "school") // 100
        else if (i >= 731 && i <= 850) Some("amenity" -> "bank") // 120
        else if (i >= 10001 && i <= 10095) Some("addr:postcode" -> "1012NX") // raw
        else if (i >= 10096 && i <= 10190) Some("addr:postcode" -> "1012 NX") // spaced
        else if (i >= 10191 && i <= 10340) Some("addr:postcode" -> "1017CT")
        else None
      tag match {
        case Some((k, v)) => w.write(s">\n    <tag k=\"$k\" v=\"$v\"/>\n  </node>\n")
        case None         => w.write("/>\n")
      }
      i += 1
    }
    var j = 1
    while (j <= NWays) {
      val uid = j % 519 + 1 // way contributors extend the union to 519
      w.write(s"""  <way id="${500000 + j}" user="w$uid" uid="$uid" version="1" changeset="7" timestamp="2016-01-01T00:00:00Z">
  |    <nd ref="${j % NNodes + 1}"/>
  |    <nd ref="${(j + 7) % NNodes + 1}"/>
  |    <tag k="highway" v="residential"/>
  |  </way>
  |""".stripMargin('|'))
      j += 1
    }
    // relations must be dropped by row-tag selection (S2)
    w.write("""  <relation id="900001" user="r" uid="1" version="1" changeset="7" timestamp="2016-01-01T00:00:00Z"><member type="way" ref="500001" role="outer"/><tag k="type" v="multipolygon"/></relation>""" + "\n")
    w.write("</osm>\n")
    w.close()
    val out = new File(dir, "csv")
    OsmIngest.runEtl(spark, osm.toString, out.toString) // EP1 (CLI code path)
    out.toString
  }

  private lazy val nodes = OsmCsv.read(spark, s"$etlOut/nodes", OsmModel.nodesSchema).cache()
  private lazy val ways = OsmCsv.read(spark, s"$etlOut/ways", OsmModel.waysSchema).cache()
  private lazy val nodeTags = OsmCsv.read(spark, s"$etlOut/node_tags", OsmModel.tagsSchema).cache()

  test("published table counts: 197,331 nodes / 22,391 ways (Readme.md:158-165)") {
    assert(Workload.tableCount(nodes) === NNodes.toLong)
    assert(Workload.tableCount(ways) === NWays.toLong)
  }

  test("published distinct contributors: 519 over nodes UNION ways (Readme.md:168-171)") {
    assert(Workload.distinctContributors(nodes, ways).head().getLong(0) === 519L)
  }

  test("published LIKE counts need case-insensitive semantics (Readme.md:189-200)") {
    assert(Workload.nameLikeCount(nodeTags, "coffee%").head().getLong(0) === 22L)
    assert(Workload.nameLikeCount(nodeTags, "coffee%shop%").head().getLong(0) === 13L)
    // and the planted names are genuinely mixed-case: a case-SENSITIVE LIKE
    // must disagree, proving ilike carries the published numbers
    import org.apache.spark.sql.functions.col
    val cs = nodeTags.filter(col("key") === "name" && col("value").like("coffee%")).count()
    assert(cs < 22L)
  }

  test("busiest postcode merges raw and pre-spaced forms via T2 (Readme.md:205-222)") {
    val top = Workload.busiestPostcodes(nodeTags, 2).collect()
    assert(top(0).getString(0) === "1012 NX" && top(0).getLong(1) === 190L)
    assert(top(1).getString(0) === "1017 CT" && top(1).getLong(1) === 150L)
  }

  test("top amenity + published 37.33% restaurant/fast-food share (Readme.md:226-246)") {
    val top = Workload.topAmenities(nodeTags, 1).head()
    assert(top.getString(0) === "restaurant" && top.getLong(1) === 192L)
    val share = Workload.valueShare(nodeTags, "amenity",
      Seq("restaurant", "fast_food")).head().getDouble(0)
    assert(share === 280.0 / 750.0) // exactly 0.3733… = the published 37.33%
  }
}
