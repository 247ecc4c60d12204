package graft

import graft.osm.{OsmCsv, OsmIngest, OsmModel}
import graft.sources.Tuning
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink breadth beyond parquet+CSV+XML (ORC, JSON round-trips),
  * malformed-input behavior, and sizing helpers. */
class FormatsRobustnessSpec extends SparkTestBase {

  test("ORC and JSON sinks round-trip the lineitem slice losslessly") {
    val dir = Files.createTempDirectory("graft-fmt"); dir.toFile.deleteOnExit()
    val li = Tables.t(spark, Sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
      .filter(col("l_orderkey") <= 100)
    li.write.orc(s"$dir/orc")
    li.write.json(s"$dir/json")
    val orc = spark.read.orc(s"$dir/orc")
    val json = spark.read.schema(li.schema).json(s"$dir/json")
    val ref = li.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(orc.orderBy("l_orderkey", "l_linenumber").collect().toSeq === ref)
    assert(json.orderBy("l_orderkey", "l_linenumber").collect().toSeq === ref)
  }

  test("malformed XML elements degrade to nulls, not job failure") {
    val dir = Files.createTempDirectory("graft-bad"); dir.toFile.deleteOnExit()
    val f = dir.resolve("bad.osm")
    Files.write(f,
      """<osm>
        |<node id="1" lat="52.1" lon="4.1" user="u" uid="1" version="1" changeset="1" timestamp="2016-01-01T00:00:00Z"/>
        |<node id="notanumber" lat="bad" lon="4.2" user="u" uid="2" version="1" changeset="1" timestamp="2016-01-01T00:00:00Z"/>
        |</osm>""".stripMargin.getBytes("UTF-8"))
    val nodes = OsmIngest.nodes(OsmIngest.readNodesRaw(spark, f.toString)).collect()
    assert(nodes.length === 2) // both rows survive (PERMISSIVE)
    assert(nodes.count(r => !r.isNullAt(0)) === 1) // bad id parsed as null
  }

  test("malformed CSV rows degrade to nulls under the pinned schema") {
    val dir = Files.createTempDirectory("graft-badcsv"); dir.toFile.deleteOnExit()
    Files.write(dir.resolve("ways.csv"),
      """id,user,uid,version,changeset,timestamp
        |1,alice,10,1,5,2016-01-01T00:00:00Z
        |oops,bob,x,y,z,not-a-date
        |""".stripMargin.getBytes("UTF-8"))
    val df = OsmCsv.read(spark, dir.toString, OsmModel.waysSchema)
    assert(df.count() === 2)
    assert(df.filter(col("id").isNull).count() === 1)
  }

  test("shuffle-partition advice scales with bytes and floors at parallelism") {
    assert(Tuning.adviseShufflePartitions(0L, 32) === 32)
    assert(Tuning.adviseShufflePartitions(1L << 30, 32) === 32)     // 1 GiB -> 8, floored
    assert(Tuning.adviseShufflePartitions(1L << 40, 32) === 8192)   // 1 TiB -> 8192 exact
    assert(Tuning.adviseShufflePartitions(100L << 40, 32) ===
      math.ceil(math.ceil(100.0 * (1L << 40) / Tuning.TargetPartitionBytes) / 32).toInt * 32)
    val bytes = Tuning.inputBytes(Tables.t(spark, Sf, "lineitem"))
    assert(bytes > 0)
  }
}
