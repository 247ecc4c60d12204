package graft.operators

import org.apache.spark.sql.SparkSession

/** Persisted perceptron classifier (q286): the trained weight row
  * (bias + feature weights) — O(features) at ANY corpus size. Written
  * params-LAST with the on-disk row count; load validates through the
  * shared [[ArtifactParams]] owner and refuses torn / malformed /
  * future-version artifacts with designed messages.
  *
  * Why it exists: the frozen-classifier ingest paths (q284 batch delta,
  * q285 streaming front door) score arrivals against shipped weights —
  * persisting them makes ingest-time filtering RESTART-DURABLE, and
  * every weight is an exact integer, so the parquet round-trip is
  * lossless and scoring is bit-identical across process boundaries
  * (the [[DsirStore]] stance for the discriminative family). */
object PerceptronStore {
  val FormatVersion = 1

  /** Persist trained weights under `path` as a 1-row wide table
    * (b0..bN) plus a params record carrying the weight COUNT — the
    * torn-write check's evidence. */
  def save(spark: SparkSession, w: Array[Long], path: String): Unit = {
    import spark.implicits._
    val cols = w.indices.map(i => s"b$i")
    Seq(w.toSeq).toDF("w")
      .selectExpr(w.indices.map(i => s"w[$i] AS b$i"): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
    val n = spark.read.parquet(s"$path/weights").columns
      .count(cols.contains)
    Seq((FormatVersion, n.toLong)).toDF("version", "n_w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Rebuild the weight array from a [[save]] artifact: two bounded
    * reads, zero training jobs. */
  def load(spark: SparkSession, path: String): Array[Long] = {
    val p = ArtifactParams.read(spark, path, "classifier",
      Seq("version", "n_w"))
    p.requireVersion(FormatVersion.toLong)
    val wf = spark.read.parquet(s"$path/weights")
    val nW = p.long("n_w")
    val cols = (0L until nW).map(i => s"b$i")
    val got = wf.columns.count(cols.contains).toLong
    p.verifyCounts(())(ArtifactParams.Count("weights", Some(nW), got))
    val rows = wf.collect()
    require(rows.length == 1,
      s"malformed classifier artifact at $path: weights holds " +
        s"${rows.length} rows, expected 1")
    cols.map(c => rows.head.getLong(rows.head.fieldIndex(c))).toArray
  }
}
