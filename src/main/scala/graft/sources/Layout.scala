package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical data layout for 100 TB-scale tables: bucketing for co-located
  * (exchange-free) joins and partitioning for pruning.
  *
  * At the target scale, the fact-fact shuffle is the dominant cost of the
  * join workload; pre-bucketing both sides by the join key makes every
  * subsequent join/aggregation on that key shuffle-free (the scan itself
  * reports the hash distribution). Date-partitioning the event/fact tables
  * turns time filters into directory pruning (PartitionFilters at the scan,
  * zero I/O for out-of-range data).
  */
object Layout {

  /** Write a table bucketed by `key` (sorted within buckets) so joins and
    * aggregations on `key` need no exchange. Requires a catalog table
    * (bucket metadata lives in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Write a table hive-partitioned by the given column (e.g. a date
    * bucket); filters on it prune directories at planning time. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
