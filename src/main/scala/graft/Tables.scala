package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  *
  * One parquet file per table under `dir`. Schemas are fixed (FIXTURES.md §2)
  * so we read without inference; Parquet carries the schema. At 100 TB these
  * reads become partitioned multi-file scans — nothing here assumes a single
  * file, and all downstream operators rely on Catalyst pushdown (filters /
  * column pruning reach the scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark refuses by default:
    // read nanos as long and floor-divide to micros — same truncation DuckDB
    // applies when it reads nanos into its microsecond TIMESTAMP.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (SQL surface parity with the
    * reference's CSV→SQLite load, SURVEY.md §2.1 S4). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
