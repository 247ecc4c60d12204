package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Documented cap on stratum cardinality for [[stratifiedQuotaSample]]:
    * the two-pass design collects a per-(stratum, bucket) histogram to the
    * driver, which is only "tiny by construction" while the stratum column
    * is a genuine stratification key (language, source, split — tens to
    * thousands of values). 4096 strata × 1024 buckets ≈ 4M short rows is
    * the most the driver is ever asked to hold. */
  val MaxStrata = 4096

  /** Stable bucket in [0, buckets) from the row id — md5-based, so uniform
    * and reproducible in any engine (no salt, no rand). */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** The uniform 32-bit integer behind the q176 priority draw: the id's
    * md5 prefix as a long. */
  def md5Prefix32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** The q176 priority over columns named `h` ([[md5Prefix32]]) and `w`
    * (the weight): pri = (h << 20) div w, the integer-quantized image of
    * the u^(1/w) exponential key (smaller pri ⟺ larger weighted key), so
    * a bottom-k cut is a weight-biased reproducible draw. ONE definition
    * shared by the gated q176 body and SamplingSpec's statistical gate —
    * the spec measures the formula's DEFINING property (inclusion rate
    * ∝ w below saturation), so a drift here fails both the q176 hash and
    * the measured ratios. */
  val priorityKey: Column = expr("(h * 1048576) div w")

  // ---- q137/q140 shared mixing weights (thousandths): ONE owner for the
  //      per-source table, Spark and oracle sides (the drift hazard the
  //      k-means CTE helpers solved for the packed-argmin constants) ----
  val MixWeightCaseSql: String =
    "CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 1500 " +
      "WHEN 'src2' THEN 250 ELSE 1000 END"

  /** Per-source mixing weight in thousandths (expects a `source` column). */
  def mixWeightMil: Column =
    when(col("source") === "src0", 2500)
      .when(col("source") === "src1", 1500)
      .when(col("source") === "src2", 250)
      .otherwise(1000)

  /** Epoch copies for a doc under [[mixWeightMil]]: floor(w) plus one more
    * when the doc's md5 bucket falls under the fractional part (expects
    * `w_mil` and `u` columns; deterministic — no rand()). */
  def mixReps: Column =
    expr("w_mil div 1000") + when(col("u") < col("w_mil") % 1000, 1).otherwise(0)

  /** train/eval label holding out `evalOutOf10` tenths (e.g. 1 → 90/10). */
  def splitLabel(id: Column, evalOutOf10: Int): Column =
    when(hashBucket(id, 10) < 10 - evalOutOf10, lit("train")).otherwise(lit("eval"))

  /** The DuckDB image of [[splitLabel]] over an arbitrary id expression —
    * ONE owner for the split CASE text, shared by the doc-keyed gates
    * (q85 and the DSIR/classifier deltas) and the CLUSTER-keyed
    * leakage-safe split (q280/q281, which hash the component label
    * instead of the doc id). */
  def splitLabelSql(idExpr: String, evalOutOf10: Int): String =
    s"CASE WHEN CAST(('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 8)) AS BIGINT) " +
      s"% 10 < ${10 - evalOutOf10} THEN 'train' ELSE 'eval' END"

  /** Scale-safe stratified exact-quota sample — the production form of the
    * q121 rank-formula shape: per stratum keep exactly `n div outOf` docs,
    * the smallest by (md5, id), WITHOUT ever ranking a whole stratum.
    *
    * Two passes:
    *  1. histogram the md5-prefix space into 1024 coarse buckets per
    *     stratum (one tiny two-phase aggregate — strata × 1024 rows);
    *  2. from the cumulative histogram derive each stratum's BOUNDARY
    *     bucket (where the quota lands) and the residual quota inside it;
    *     rows below the boundary are kept outright (a narrow filter), and
    *     only the boundary bucket — ~1/1024 of the stratum — is exactly
    *     ranked.
    *
    * The kept set is IDENTICAL to the full rank formula's: md5-prefix
    * order is a prefix of the full (md5, id) order, so "every bucket below
    * the boundary + the residual smallest inside it" IS the n div outOf
    * smallest overall. That identity is what the oracle asserts — the gate
    * SQL is the q121 rank formula itself.
    *
    * Scale: q121's `row_number() OVER (PARTITION BY lang)` sorts the whole
    * dominant stratum in ONE task — the per-group global sort that kills
    * skewed corpora. Here no window ever sees the corpus: one window runs
    * over the 1024-row-per-stratum histogram, the other over the boundary
    * slice. Costs one extra corpus scan (pass 1), the standard two-pass
    * trade. */
  def stratifiedQuotaSample(docs: DataFrame, idCol: String, strataCol: String,
                            outOf: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(outOf > 1, s"outOf=$outOf must be > 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val bucketShift = 4194304L // 2^22: 32-bit md5 prefix -> 1024 buckets
    val rows = docs.select(col(strataCol).cast("string").as("stratum"), col(idCol),
        md5(col(idCol).cast("string")).as("hfull"))
      .withColumn("b",
        expr(s"CAST(conv(substring(hfull, 1, 8), 16, 10) AS BIGINT) div $bucketShift"))
    // pass 1: per-(stratum, bucket) histogram — a two-phase count whose
    // output is |strata|·1024 rows, tiny for a REAL stratum column
    // (lang/source/split), so the boundary walk runs driver-side (the
    // same O(summary) argument as k-means centroids; windowing the
    // histogram instead would duplicate the whole subtree under the
    // Union's two consumers below). That "tiny" claim only holds while
    // |strata| is bounded, so it is enforced (round-5 verdict): take()
    // caps what can ever reach the driver, and a stratum column with more
    // than MaxStrata distinct values (a doc_id passed by mistake) fails
    // with a clear require() instead of a driver OOM.
    val histCap = MaxStrata * 1024 // ≥ any compliant column's histogram
    val taken = rows.groupBy(col("stratum"), col("b"))
      .agg(count(lit(1)).as("c")).take(histCap + 1)
    lazy val nStrata = taken.iterator.map(_.getString(0)).toSet.size
    require(taken.length <= histCap && nStrata <= MaxStrata,
      s"stratifiedQuotaSample: stratum column '$strataCol' has more than " +
        s"$MaxStrata distinct values — the per-stratum histogram would no " +
        "longer be driver-sized; pass a bounded stratum (lang/source/split)")
    val hist = taken.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val info = hist.groupBy(_._1).toSeq.map { case (stratum, unsorted) =>
      val buckets = unsorted.sortBy(_._2)
      val n = buckets.map(_._3).sum
      val m = n / outOf // quota: rn*outOf <= n  <=>  rn <= n div outOf
      var cum = 0L
      var bb = buckets.head._2
      var keptBefore = 0L
      var found = false
      for ((_, b, c) <- buckets if !found) {
        if (cum + c >= m) { bb = b; keptBefore = cum; found = true }
        else cum += c
      }
      (stratum, bb, m - keptBefore, n)
    }
    val infoDf = info.toDF("stratum", "bb", "r", "n_stratum")
    // pass 2: rows below the boundary bucket are kept by a narrow filter;
    // ONLY the boundary bucket (~1/1024 of its stratum) is exactly ranked
    val tagged = rows.join(broadcast(infoDf), Seq("stratum"))
    val below = tagged.filter(col("b") < col("bb"))
      .select(col("stratum"), col(idCol), col("n_stratum"))
    val wBoundary = Window.partitionBy("stratum")
      .orderBy(col("hfull"), col(idCol))
    val boundary = tagged.filter(col("b") === col("bb"))
      .withColumn("rn", row_number().over(wBoundary))
      .filter(col("rn") <= col("r"))
      .select(col("stratum"), col(idCol), col("n_stratum"))
    below.union(boundary)
  }

  val defs: Seq[Q] = Seq(

    // ---- deterministic 90/10 split with per-split corpus stats ----
    Q("q85_train_split",
      s"""WITH t AS (
        |  SELECT ${splitLabelSql("doc_id", 1)} AS split,
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

    // ---- weighted PRIORITY sample (deterministic A-ES/priority-sampling
    //      shape): one global top-k where each doc's inclusion odds scale
    //      with its token count — the "sample documents proportional to
    //      length" draw a token-budgeted pretraining mix uses, vs q118's
    //      per-band Bernoulli (band-level rates, no global k) and q121's
    //      UNWEIGHTED per-stratum quota. The priority is pure integer
    //      math: pri = (h << 20) div w with h the doc's 32-bit md5 prefix
    //      and w its token count — dividing a uniform integer by the
    //      weight is the integer-quantized image of the u^(1/w) key
    //      (smaller pri ⟺ larger weighted key), so the k smallest
    //      priorities are a weight-biased reproducible draw with NO rand()
    //      and NO libm (Q.scala float rules). At 100 TB this is a narrow
    //      map + TakeOrderedAndProject (per-partition top-k, k rows to the
    //      driver) — no global sort, no shuffle of the corpus. ----
    Q("q176_priority_sample",
      """WITH q AS (
        |  SELECT doc_id, source,
        |    greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS w,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, source, w,
        |  (h * 1048576) // w AS pri
        |FROM q ORDER BY pri, doc_id LIMIT 100""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          greatest(size(tokens(col("text"))).cast("long"), lit(1L)).as("w"),
          md5Prefix32(col("doc_id")).as("h"))
        .select(col("doc_id"), col("source"), col("w"),
          priorityKey.as("pri"))
        .orderBy(col("pri"), col("doc_id"))
        .limit(100)
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
    },

    // ---- the SCALE-SAFE form of q121: two-pass md5-threshold quota
    //      selection (bucket histogram -> boundary bucket -> rank only
    //      the boundary slice; no window ever sees the corpus). The
    //      oracle is deliberately the q121 RANK FORMULA itself — the
    //      hash match proves the two algorithms keep the IDENTICAL set,
    //      per stratum, at every SF. ----
    // ---- deterministic source-weighted epoch mixing (the Pile/LLaMA
    //      per-source upsample): each source has a mixing weight in
    //      thousandths; a doc is emitted `w div 1000` times plus one more
    //      when its md5 bucket falls under the fractional part, so the
    //      epoch schedule is reproducible in any engine and under any
    //      partitioning (no rand()), and a re-crawled doc keeps its draw.
    //      Narrow map + generator explode — ZERO shuffle (the output sort
    //      is gate-ordering only; a writer would instead hash-partition
    //      the exploded stream straight to shards). ----
    Q("q137_mix_upsample",
      s"""WITH w AS (
        |  SELECT doc_id, source, $MixWeightCaseSql AS w_mil,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    w_mil // 1000 + CASE WHEN u < w_mil % 1000 THEN 1 ELSE 0 END AS reps
        |  FROM w)
        |SELECT doc_id, source, CAST(unnest(range(1, reps + 1)) AS BIGINT) AS epoch_copy
        |FROM r WHERE reps > 0 ORDER BY source, doc_id, epoch_copy""".stripMargin) { (s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("w_mil", mixWeightMil)
        .withColumn("u", hashBucket(col("doc_id"), 1000))
        .withColumn("reps", mixReps)
        // the filter also guards sequence(): with reps = 0 Spark's
        // sequence(1, 0) would RAMP DOWN ([1, 0]), not return empty
        .filter(col("reps") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1), col("reps"))).as("c"))
        .select(col("doc_id"), col("source"), col("c").cast("long").as("epoch_copy"))
        .orderBy("source", "doc_id", "epoch_copy")
    },

    Q("q132_stratified_twopass",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, doc_id, CAST(n AS BIGINT) AS n_lang
        |FROM r WHERE rn * 5 <= n ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      stratifiedQuotaSample(Tables.t(s, d, "documents"), "doc_id", "lang", 5)
        .select(col("stratum").as("lang"), col("doc_id"), col("n_stratum").as("n_lang"))
        .orderBy("lang", "doc_id")
    },

    // ---- deterministic training-shard manifest: the "global shuffle"
    //      step of training-data prep WITHOUT a global sort. Each doc's
    //      shard is its md5 bucket (hashBucket — engine-independent,
    //      partitioning-independent); within a shard the training order
    //      is md5 order, so the manifest's first/last doc pin it at both
    //      ends. At 100 TB this is `repartition(shard)` + per-partition
    //      sortWithinPartitions(h) + a partitioned write — one shuffle,
    //      no total order ever materialized; the manifest itself is one
    //      two-phase agg to |shards| rows (min_by/arg_min carry the
    //      boundary docs through the partial aggregation). ----
    Q("q147_shard_manifest",
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS shard,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  arg_min(doc_id, h) AS first_doc, arg_max(doc_id, h) AS last_doc
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          hashBucket(col("doc_id"), 16).as("shard"),
          md5(col("doc_id").cast("string")).as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"),
          min_by(col("doc_id"), col("h")).as("first_doc"),
          max_by(col("doc_id"), col("h")).as("last_doc"))
        .orderBy("shard")
    },

    // ---- token-budget WATER-FILLING: allocate a global token budget
    //      (60% of the corpus) across sources with a single per-source
    //      cap T — the largest integer T with Σ min(tokens_s, T) ≤ B —
    //      so small sources keep everything and oversized sources are
    //      capped to the common water line (the mixture-rebalancing
    //      step between q137's fixed upsample weights and a raw
    //      proportional cut, cf. the per-source caps in Pile/LLaMA-style
    //      mixes). Closed form, no iteration: sort sources by tokens
    //      asc; with prefix sums P_k, T lives in the segment after the
    //      LAST k where P_{k-1} + (n−k+1)·t_k ≤ B, then
    //      T = (B − P_K) div (n − K). All integer arithmetic; every
    //      window runs over the |sources|-row aggregate (the q111
    //      bounded-window rule), the corpus is touched by exactly one
    //      two-phase count agg. Audit columns (cap, budget) ride on
    //      every row; the oracle replays prefix sums, feasibility,
    //      segment choice and the division. ----
    Q("q196_token_budget_waterfill",
      """WITH ps AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, t,
        |  row_number() OVER (ORDER BY t, source) AS k,
        |  sum(t) OVER (ORDER BY t, source ROWS UNBOUNDED PRECEDING) AS pk,
        |  count(*) OVER () AS n,
        |  sum(t) OVER () AS total FROM ps),
        |r2 AS (SELECT *, (total * 6) // 10 AS b,
        |  CASE WHEN pk - t + (n - k + 1) * t <= (total * 6) // 10
        |    THEN k ELSE 0 END AS feask FROM r),
        |r3 AS (SELECT *, max(feask) OVER () AS kk FROM r2),
        |r4 AS (SELECT *, max(CASE WHEN k = kk THEN pk END) OVER () AS pkk,
        |  max(t) OVER () AS tmax FROM r3),
        |r5 AS (SELECT *, CASE WHEN kk = n THEN tmax
        |  ELSE (b - coalesce(pkk, 0)) // (n - kk) END AS cap FROM r4)
        |SELECT source, t AS tokens, CAST(LEAST(t, cap) AS BIGINT) AS allocated,
        |  t > cap AS capped, CAST(cap AS BIGINT) AS cap,
        |  CAST(b AS BIGINT) AS budget
        |FROM r5 ORDER BY source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.orderBy(col("t"), col("source"))
      val wAll = Window.partitionBy()
      // every window below runs over the |sources|-row aggregate — the
      // single-partition sort touches a handful of rows, never the corpus
      Tables.t(s, d, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy("source").agg(sum("nt").as("t"))
        .withColumn("k", row_number().over(wOrd).cast("long"))
        .withColumn("pk", sum("t").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("total", sum("t").over(wAll))
        .withColumn("b", expr("(total * 6) div 10"))
        .withColumn("feask",
          when(col("pk") - col("t") + (col("n") - col("k") + 1) * col("t")
            <= col("b"), col("k")).otherwise(lit(0L)))
        .withColumn("kk", max("feask").over(wAll))
        .withColumn("pkk",
          max(when(col("k") === col("kk"), col("pk"))).over(wAll))
        .withColumn("tmax", max("t").over(wAll))
        .withColumn("cap", when(col("kk") === col("n"), col("tmax"))
          .otherwise(expr("(b - coalesce(pkk, 0L)) div (n - kk)")))
        .select(col("source"), col("t").as("tokens"),
          least(col("t"), col("cap")).as("allocated"),
          (col("t") > col("cap")).as("capped"),
          col("cap").cast("long").as("cap"),
          col("b").cast("long").as("budget"))
        .orderBy("source")
    },

    // ---- per-DOMAIN cap (the C4/RefinedWeb domain-balancing rule): no
    //      source may contribute more than cap docs, keeping its
    //      highest-quality ones — rank within source by length (quality
    //      proxy) with a doc_id tie-break, keep rank ≤ cap. The cap is
    //      occupancy-scaled (GREATEST(8, n_s div 4) — the q83/q192
    //      adaptivity rule), so the gate exercises DIFFERENT caps across
    //      SFs instead of pinning a fixture-tuned constant. Differs from
    //      q196 (token budget ACROSS sources, one global water line):
    //      this is row-level winnowing WITHIN each source. Cost: one
    //      per-source window — the corpus shuffles once by source; at
    //      100 TB a skewed source salts exactly like q177. ----
    // ---- TEMPERATURE-sampled source mixing (the multilingual upsampling
    //      rule of XLM-R/mBERT: p_s ∝ n_s^α flattens the source
    //      distribution so low-resource sources aren't drowned): α = 1/2,
    //      because sqrt is the ONE power function that is correctly
    //      rounded IEEE in both engines (the Q.scala rule — pow/exp/ln
    //      are libm, not cross-engine-safe). Weights quantize to integer
    //      ppm immediately after the sqrt (floor(√tokens · 10⁶)), so the
    //      cross-source normalization is an ORDER-INDEPENDENT integer
    //      sum — a double Σ√t would depend on partition summation order.
    //      Derived per-source quota → q137's deterministic rep rule
    //      (w_mil + md5 fractional draw), so the sampler EMITS epoch
    //      counts, not just a report. Scale: one corpus scan, every
    //      window-free aggregate two-phase, the |sources|-row weight
    //      table broadcast back. ----
    Q("q222_temperature_mix",
      """WITH t AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents),
        |ps AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS toks FROM t GROUP BY source),
        |w AS (SELECT *, CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1000000) AS BIGINT) AS wq
        |  FROM ps),
        |g AS (SELECT CAST(sum(wq) AS BIGINT) AS wtot,
        |  CAST(sum(n_docs) AS BIGINT) AS ndocs,
        |  CAST(sum(toks) AS BIGINT) AS ttot FROM w),
        |sh AS (SELECT w.*, wq * 1000000 // wtot AS share_ppm,
        |  toks * 1000000 // ttot AS raw_share_ppm,
        |  (wq * 1000000 // wtot) * ndocs // 1000000 AS quota_docs FROM w, g),
        |m AS (SELECT *, quota_docs * 1000 // n_docs AS w_mil FROM sh),
        |r AS (SELECT t.source,
        |  m.w_mil // 1000 + CASE WHEN
        |    CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
        |    < m.w_mil % 1000 THEN 1 ELSE 0 END AS reps
        |  FROM t JOIN m USING (source)),
        |e AS (SELECT source, CAST(sum(reps) AS BIGINT) AS epoch_docs
        |  FROM r GROUP BY source)
        |SELECT m.source, CAST(m.n_docs AS BIGINT) AS n_docs, m.toks AS tokens,
        |  m.wq AS w_sqrt_ppm, CAST(m.share_ppm AS BIGINT) AS share_ppm,
        |  CAST(m.raw_share_ppm AS BIGINT) AS raw_share_ppm,
        |  CAST(m.quota_docs AS BIGINT) AS quota_docs,
        |  CAST(m.w_mil AS BIGINT) AS w_mil,
        |  coalesce(e.epoch_docs, 0) AS epoch_docs
        |FROM m LEFT JOIN e USING (source) ORDER BY m.source""".stripMargin) { (s, d) =>
      val t = Tables.t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
      val w = t.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").cast("long").as("toks"))
        .withColumn("wq",
          floor(sqrt(col("toks").cast("double")) * lit(1000000.0))
            .cast("long"))
      val g = w.agg(sum("wq").cast("long").as("wtot"),
        sum("n_docs").cast("long").as("ndocs"),
        sum("toks").cast("long").as("ttot"))
      val m = w.crossJoin(broadcast(g))
        .withColumn("share_ppm", expr("wq * 1000000L div wtot"))
        .withColumn("raw_share_ppm", expr("toks * 1000000L div ttot"))
        .withColumn("quota_docs", expr("share_ppm * ndocs div 1000000L"))
        .withColumn("w_mil", expr("quota_docs * 1000L div n_docs"))
      val e = t.join(broadcast(m.select("source", "w_mil")), "source")
        .withColumn("u", hashBucket(col("doc_id"), 1000))
        .withColumn("reps", mixReps)
        .groupBy("source").agg(sum("reps").cast("long").as("epoch_docs"))
      m.join(e, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("toks").as("tokens"),
          col("wq").as("w_sqrt_ppm"), col("share_ppm"),
          col("raw_share_ppm"), col("quota_docs"), col("w_mil"),
          coalesce(col("epoch_docs"), lit(0L)).as("epoch_docs"))
        .orderBy("source")
    },

    Q("q208_domain_cap",
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, CAST(rk AS INTEGER) AS rk,
        |  CAST(GREATEST(8, n // 4) AS BIGINT) AS cap,
        |  rk <= GREATEST(8, n // 4) AS kept
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wS = Window.partitionBy("source")
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          row_number().over(wS.orderBy(col("n_chars").desc, col("doc_id")))
            .as("rk"),
          count(lit(1)).over(wS).as("n"))
        .withColumn("cap", greatest(lit(8L), expr("n div 4")))
        .select(col("doc_id"), col("source"), col("rk"), col("cap"),
          (col("rk") <= col("cap")).as("kept"))
        .orderBy("doc_id")
    }
  )
}
