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
    },

    // ---- quality-weighted subsampling (the DCLM/FineWeb resample shape):
    //      keep probability per quality band — good 100%, ok 50%, short
    //      10% — decided by the doc's md5 bucket against an integer
    //      threshold, so the "random" draw is reproducible in any engine
    //      and under any partitioning. Narrow map + one 3-row agg. ----
    Q("q118_weighted_sample",
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS ntok,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'the' OR w = 'a')) AS INTEGER) AS nstop
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, ntok,
        |    CASE WHEN ntok >= 50 AND CAST(nstop AS DOUBLE) / CAST(ntok AS DOUBLE) < 0.1
        |         THEN 'good'
        |         WHEN ntok >= 20 THEN 'ok' ELSE 'short' END AS band,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS u
        |  FROM q),
        |k AS (
        |  SELECT band, ntok,
        |    CASE WHEN u < CASE band WHEN 'good' THEN 1000 WHEN 'ok' THEN 500 ELSE 100 END
        |         THEN 1 ELSE 0 END AS kept
        |  FROM b)
        |SELECT band, count(*) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept = 1 THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM k GROUP BY band ORDER BY band""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val toks = tokens(col("text"))
      val ntok = size(toks)
      val nstop = size(filter(toks, w => w === "the" || w === "a"))
      val band = when(col("ntok") >= 50 &&
          col("nstop").cast("double") / col("ntok").cast("double") < 0.1, "good")
        .when(col("ntok") >= 20, "ok").otherwise("short")
      val threshold = when(col("band") === "good", 1000)
        .when(col("band") === "ok", 500).otherwise(100)
      Tables.t(s, d, "documents")
        .select(col("doc_id"), ntok.as("ntok"), nstop.as("nstop"))
        .withColumn("band", band)
        .withColumn("kept",
          when(hashBucket(col("doc_id"), 1000) < threshold, 1).otherwise(0))
        .groupBy("band")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept")).cast("long").as("n_kept"),
          sum(when(col("kept") === 1, col("ntok")).otherwise(0))
            .cast("long").as("kept_tokens"))
        .orderBy("band")
    },

    // ---- stratified EXACT-count sample: per language keep the lowest
    //      20% of docs by md5 rank — an exact-quota stratified draw
    //      (row_number over the md5 order), unlike q118's per-row
    //      Bernoulli whose per-group count only concentrates around the
    //      rate. The quota test is pure integer arithmetic (rn*5 <= n):
    //      a DOUBLE `n * 0.2` would round differently from DuckDB's
    //      DECIMAL literal. Both window functions share one hash
    //      partitioning on lang; at 100 TB the per-group sort is bounded
    //      by the largest stratum, and strata are languages — tens of
    //      them, each itself hash-partitionable if a single lang
    //      dominates (the same salting remedy as any skewed window). ----
    Q("q121_stratified_sample",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn, CAST(n AS BIGINT) AS n_lang
        |FROM r WHERE rn * 5 <= n ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byLang = Window.partitionBy(col("lang"))
      val ranked = byLang.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(ranked).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(byLang))
        .filter(col("rn") * 5 <= col("n_lang"))
        .select(col("lang"), col("doc_id"), col("rn"), col("n_lang"))
        .orderBy("lang", "doc_id")
    }
  )
}
