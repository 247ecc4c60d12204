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
    // events.ts has shipped as TIMESTAMP(NANOS) (refused by Spark unless
    // read as long) and as TIMESTAMP(MICROS) NTZ, depending on fixture
    // generation — normalize BOTH to TimestampType so event-time ops
    // (and streaming watermarks, which reject NTZ) always see the same
    // type. The session timezone is UTC, so the NTZ cast preserves wall
    // values exactly — the same instants DuckDB reads either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Nanos-as-long → floor-divide to micros (DuckDB's truncation);
    * micros-NTZ → cast (value-preserving under the UTC session tz). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every table as a temp view (SQL surface parity with the
    * reference's CSV→SQLite load, SURVEY.md §2.1 S4). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
