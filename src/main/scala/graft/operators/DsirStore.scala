package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted DSIR model (q279): the 256-row hashed-unigram log-ratio
  * table plus the base corpus's mean weight — the frozen selection
  * threshold. Constant-sized at ANY corpus (the DSIR hashing trick),
  * written params-LAST with the on-disk row count; load validates
  * through the shared [[ArtifactParams]] owner and refuses torn /
  * malformed / future-version artifacts with designed messages.
  *
  * Why it exists: the frozen-model ingest paths (q277 batch delta,
  * q278 streaming front door) score arrivals against shipped state —
  * but a freeze that lives only in one JVM dies with it. Persisting
  * the model makes ingest-time selection RESTART-DURABLE: the nightly
  * job loads the shipped ratios and threshold instead of re-reading
  * the whole base corpus, and every value is an exact integer, so the
  * parquet round-trip is lossless and scoring is bit-identical across
  * process boundaries. */
object DsirStore {
  val FormatVersion = 1

  /** Persist a trained [[TextOps.DsirModel]] under `path`. The 1-row
    * mean frame collapses to a params column (driver-sized by
    * definition). */
  def save(m: TextOps.DsirModel, path: String): Unit = {
    val spark = m.lr.sparkSession
    import spark.implicits._
    m.lr.coalesce(1).write.mode("overwrite").parquet(s"$path/lr")
    val n = spark.read.parquet(s"$path/lr").count()
    Seq((FormatVersion, n, m.mu)).toDF("version", "n_lr", "mu")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Rebuild the scoring state from a [[save]] artifact: two bounded
    * reads, zero training jobs. Returns (lr table, mu threshold) ready
    * for [[TextOps.dsirScore]]. */
  def load(spark: SparkSession, path: String): (DataFrame, Long) = {
    val p = ArtifactParams.read(spark, path, "DSIR model",
      Seq("version", "n_lr", "mu"))
    p.requireVersion(FormatVersion.toLong)
    val lr = spark.read.parquet(s"$path/lr")
    val got = lr.count()
    p.verifyCounts(())(
      ArtifactParams.Count("lr", Some(p.long("n_lr")), got))
    (lr, p.long("mu"))
  }
}
