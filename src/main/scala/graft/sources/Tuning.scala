package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spill-aware sizing helpers (SURVEY-prompt: size shuffle partitions and
  * scan splits so partitions fit executor memory at the target SF).
  *
  * The rules of thumb encoded here: shuffle partitions ≈ shuffled bytes /
  * target (128 MiB) rounded up to a multiple of parallelism, never below
  * it; AQE then coalesces small outputs at runtime, so oversizing is cheap
  * and undersizing (spill) is not. Scan-side parallelism comes from
  * spark.sql.files.maxPartitionBytes, which Spark applies per file split.
  */
object Tuning {

  val TargetPartitionBytes: Long = 128L * 1024 * 1024

  /** Partition count that keeps ~target bytes per shuffle partition. */
  def adviseShufflePartitions(shuffledBytes: Long, parallelism: Int,
                              targetBytes: Long = TargetPartitionBytes): Int = {
    val byBytes = math.ceil(shuffledBytes.toDouble / targetBytes).toInt
    val rounded = math.ceil(byBytes.toDouble / parallelism).toInt * parallelism
    math.max(parallelism, rounded)
  }

  /** Sum of input file sizes behind a DataFrame's scan(s) — the cheap
    * planning-time proxy for shuffle volume of a scan-heavy stage. */
  def inputBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.sizeInBytes
    }.sum

  /** Apply advised sizing to a session for a given expected input. */
  def configureFor(spark: SparkSession, expectedInputBytes: Long): Unit = {
    val parallelism = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions",
      adviseShufflePartitions(expectedInputBytes, parallelism).toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      TargetPartitionBytes.toString)
  }

  /** Enable Catalyst's runtime bloom-filter join pruning for shuffle
    * joins with a selective build side — the 100 TB fact-table move:
    * before the fact side shuffles, a bloom filter built from the
    * (filtered) dim side's join keys drops non-matching fact rows AT THE
    * SCAN, so the shuffle moves only rows that can join (`might_contain`
    * appears in the fact-side scan filter — pinned in PlanSpec). Spark
    * gates injection on an application-side scan ≥ 10 GB by default,
    * which a local fixture never reaches; production defaults are kept,
    * only the size gate is caller-adjustable. Returns the previous conf
    * values so callers (and the spec) can restore. */
  def enableRuntimeJoinFilters(spark: SparkSession,
      applicationSideScanBytesThreshold: Long = 10L << 30)
      : Map[String, String] = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k).orNull).toMap
    spark.conf.set(keys.head, "true")
    spark.conf.set(keys(1), applicationSideScanBytesThreshold.toString)
    prev
  }

  /** Restore confs captured by [[enableRuntimeJoinFilters]]. */
  def restoreConfs(spark: SparkSession, prev: Map[String, String]): Unit =
    prev.foreach { case (k, v) =>
      if (v == null) spark.conf.unset(k) else spark.conf.set(k, v)
    }
}
