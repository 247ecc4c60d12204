package graft

import graft.operators.Skew
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Physical layout + skew mitigation: the 100 TB strategies, proven on the
  * executed plans and exact-result equivalence at test scale. */
class LayoutSkewSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("bucketed join on the bucket key needs no exchange") {
    val li = Tables.t(spark, Sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.t(spark, Sf, "orders").select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)
    // disable broadcast so the join would otherwise shuffle both sides
    val bt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.readTable(spark, "li_bucketed")
        .join(Layout.readTable(spark, "ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val p = finalPlan(joined)
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // same result as the plain-parquet join
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("l_orderkey").collect().toSeq ===
        plain.orderBy("l_orderkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bt)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("date-partitioned write prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
    dir.toFile.deleteOnExit()
    val ev = Tables.t(spark, Sf, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Layout.writePartitioned(ev, dir.toString, "day")
    val read = spark.read.parquet(dir.toString)
      .filter(col("day") === "2024-01-05")
    val p = finalPlan(read)
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(read.count() === expected && expected > 0)
  }

  test("salted aggregation matches plain aggregation exactly") {
    val ev = Tables.t(spark, Sf, "events")
    val salted = Skew.saltedCount(ev, "event_type", 16)
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
    val saltedSum = Skew.saltedSum(ev, "event_type", "value", 16)
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getDouble(1)))
    val plainSum = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("s"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(saltedSum.toSeq === plainSum.toSeq) // decimal path: exact equality
  }

  test("salted join matches plain join row-for-row") {
    val li = Tables.t(spark, Sf, "lineitem").select("l_orderkey", "l_linenumber")
    val ord = Tables.t(spark, Sf, "orders").select("o_orderkey", "o_orderpriority")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
  }
}
