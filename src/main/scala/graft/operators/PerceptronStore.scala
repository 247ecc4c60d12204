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
    // designed refusal, not selectExpr()'s opaque zero-expression
    // analysis error: nothing upstream guarantees non-empty weights
    // for future callers (round-14 advice)
    require(w.nonEmpty,
      s"classifier artifact at $path: cannot persist an empty weight row")
    Seq(w.toSeq).toDF("w")
      .selectExpr(w.indices.map(i => s"w[$i] AS b$i"): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
    // the same TOTAL-b-column measure load verifies against, so the
    // recorded count and the torn-check count can never drift
    val n = spark.read.parquet(s"$path/weights").columns
      .count(_.matches("^b\\d+$"))
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
    // EXACT equality against the TOTAL on-disk weight-column count, not
    // a subset check (round-14 advice): a crash after writing a new,
    // WIDER weights parquet but before rewriting params would leave old
    // params whose expected b0..b(n_w-1) all exist in the new file — a
    // hybrid artifact the subset check would silently serve truncated.
    val got = wf.columns.count(_.matches("^b\\d+$")).toLong
    p.verifyCounts(())(ArtifactParams.Count("weights", Some(nW), got))
    // the count alone doesn't prove CONTIGUITY (round-15 advice): a
    // foreign artifact with b0,b2 and n_w=2 passes the total check, then
    // fieldIndex("b1") throws a raw IllegalArgumentException instead of
    // the designed refusal
    val present = wf.columns.filter(_.matches("^b\\d+$")).toSet
    val missing = cols.filterNot(present.contains)
    require(missing.isEmpty,
      s"malformed classifier artifact at $path: weights is missing " +
        s"column(s) ${missing.mkString(", ")} (expected contiguous " +
        s"b0..b${nW - 1})")
    val rows = wf.collect()
    require(rows.length == 1,
      s"malformed classifier artifact at $path: weights holds " +
        s"${rows.length} rows, expected 1")
    // widen foreign integer widths the way ArtifactParams.Handle does,
    // and refuse non-integer weights with the designed message instead
    // of a raw ClassCastException (round-14 advice)
    cols.map { c =>
      rows.head.get(rows.head.fieldIndex(c)) match {
        case v: Long  => v
        case v: Int   => v.toLong
        case v: Short => v.toLong
        case v: Byte  => v.toLong
        case other => throw new IllegalArgumentException(
          s"requirement failed: malformed classifier artifact at $path: " +
            s"weights column $c holds non-integer " +
            (if (other == null) "null" else other.getClass.getSimpleName))
      }
    }.toArray
  }
}
