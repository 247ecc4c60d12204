package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted semantic-dedup router: the Lloyd-trained k-means centroid
  * frame (cid, cq, cnsq) — O(k·dim) by definition, the one piece of
  * trained state the semantic family owns. Written params-LAST with the
  * on-disk centroid count; load validates through the shared
  * [[ArtifactParams]] owner and refuses torn / malformed /
  * future-version artifacts with designed messages.
  *
  * Why it exists: the incremental path ([[Similarity.semanticDedupDeltaResult]])
  * freezes the router on the shipped base so nightly deltas route
  * snapshot-stably — but a freeze that lives only in one JVM dies with
  * it. Persisting the router makes the freeze RESTART-DURABLE: the
  * nightly job loads the shipped router instead of retraining, so
  * routing is bit-identical across process boundaries (centroid
  * components are exact integers — the parquet round-trip is lossless).
  */
object SemanticRouter {
  val FormatVersion = 1

  /** Persist `cent` (cid, cq, cnsq) under `path`, params written LAST
    * with the on-disk count — the torn-write discipline every artifact
    * family shares. */
  def save(cent: DataFrame, k: Int, path: String): Unit = {
    val spark = cent.sparkSession
    import spark.implicits._
    cent.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val n = spark.read.parquet(s"$path/centroids").count()
    Seq((FormatVersion, k, n)).toDF("version", "k", "n_centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Rebuild the routing frame from a [[save]] artifact: two bounded
    * reads (params + the k-row centroid table), zero training jobs.
    * Returns (centroid frame, k) ready for
    * [[Similarity.semanticCells]]. */
  def load(spark: SparkSession, path: String): (DataFrame, Int) = {
    val p = ArtifactParams.read(spark, path, "semantic router",
      Seq("version", "k", "n_centroids"))
    p.requireVersion(FormatVersion.toLong)
    val k = p.int("k")
    val cent = spark.read.parquet(s"$path/centroids")
    val got = cent.count()
    p.verifyCounts(())(
      ArtifactParams.Count("centroids", Some(p.long("n_centroids")), got))
    (cent, k)
  }
}
