package graft.operators

import graft.Q
import graft.osm.OsmIngest
import java.nio.file.Files

/** Driver-gated surface for the OSM ETL itself: synthesizes a small OSM
  * extract (the fixture matrix of FIXTURES.md §1), runs the full XML →
  * shape → clean pipeline, and returns the shaped node_tags rows. Rows-only
  * gate (the input isn't a warehouse table, so there's no DuckDB oracle);
  * golden-file and semantics checks live in OsmIngestSpec/GoldenWaysSpec. */
object OsmOps {

  private val SampleOsm =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osm version="0.6">
      |  <node id="1" lat="52.37" lon="4.89" user="ałice" uid="42" version="2" changeset="111" timestamp="2015-01-01T10:00:00Z">
      |    <tag k="addr:postcode" v="1074CM"/>
      |    <tag k="phone" v="020-555 1234"/>
      |    <tag k="contact:phone" v="020-555 9999"/>
      |    <tag k="cycleway:right:surface:color" v="red"/>
      |    <tag k="CEMT" v="II"/>
      |    <tag k="name" v="Café Früh"/>
      |  </node>
      |  <way id="2" user="bob" uid="43" version="1" changeset="112" timestamp="2016-10-06T10:16:56Z">
      |    <nd ref="1"/><nd ref="3"/>
      |    <tag k="addr:postcode" v="1091GC"/>
      |  </way>
      |  <relation id="9" user="x" uid="1" version="1" changeset="1" timestamp="2016-01-01T00:00:00Z"/>
      |</osm>
      |""".stripMargin

  /** The shaped output of the fixed sample extract is fully deterministic
    * (fixture above + the reference's cleaning semantics), so the oracle is
    * the literal expected relation — this flips q68 from a rows-only check
    * to the same hash-exact gate as every warehouse query. */
  private val ExpectedSql =
    """SELECT CAST(id AS BIGINT) AS id, "key", "value", "type" FROM (VALUES
      |  (1, 'CEMT', 'II', 'regular'),
      |  (1, 'name', 'Café Früh', 'regular'),
      |  (1, 'phone', '020-555 9999', 'contact'),
      |  (1, 'phone', '+31205551234', 'regular'),
      |  (1, 'postcode', '1074 CM', 'addr'),
      |  (1, 'right:surface:color', 'red', 'cycleway'),
      |  (2, 'postcode', '1091GC', 'addr')
      |) t(id, "key", "value", "type")
      |ORDER BY id, "key", "type"""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("q68_osm_etl_pipeline", ExpectedSql) { (s, _) =>
      val dir = Files.createTempDirectory("graft-osmop")
      dir.toFile.deleteOnExit()
      val f = dir.resolve("sample.osm")
      Files.write(f, SampleOsm.getBytes("UTF-8"))
      val nodeTags = OsmIngest.nodeTags(OsmIngest.readNodesRaw(s, f.toString))
      val wayTags = OsmIngest.wayTags(OsmIngest.readWaysRaw(s, f.toString))
      nodeTags.union(wayTags).orderBy("id", "key", "type")
    }
  )
}
