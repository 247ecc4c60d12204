package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. Splits must be (a) stable across runs and engines — no
  * rand() — and (b) key-based, so a document lands in the same split no
  * matter how the corpus is partitioned or re-shuffled. Both come from
  * hashing the id: md5 (cross-engine identical) → 32-bit prefix → modulo.
  *
  * Scale: assignment is a narrow per-row map; the split never shuffles.
  * Downstream stratified counts are ordinary two-phase aggregations.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id — md5-based, so uniform
    * and reproducible in any engine (no salt, no rand). */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** train/eval label holding out `evalOutOf10` tenths (e.g. 1 → 90/10). */
  def splitLabel(id: Column, evalOutOf10: Int): Column =
    when(hashBucket(id, 10) < 10 - evalOutOf10, lit("train")).otherwise(lit("eval"))

  val defs: Seq[Q] = Seq(

    // ---- deterministic 90/10 split with per-split corpus stats ----
    Q("q85_train_split",
      """WITH t AS (
        |  SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 9
        |              THEN 'train' ELSE 'eval' END AS split,
        |    len(string_split(text, ' ')) AS ntok
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS total_tokens
        |FROM t GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      Tables.t(s, d, "documents")
        .select(splitLabel(col("doc_id"), 1).as("split"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok").cast("long")).as("total_tokens"))
        .orderBy("split")
    }
  )
}
