package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking + TF-IDF — the remaining training-data text ops.
  *
  * Chunking composes from builtins (sequence → slice → explode) rather than
  * a custom Generator: SURVEY.md §7.3's ladder prefers composition when the
  * semantics fit, and the composed form stays inside the optimizer's reach
  * (column pruning through the Generate, no custom strategy to maintain).
  *
  * TF-IDF avoids ln() deliberately: libm transcendentals differ across
  * engines in final ulps, so the score uses the exact rational N/df — same
  * ranking monotonicity, bit-reproducible everywhere.
  */
object ChunkingOps {

  /** Overlapping fixed-size token chunks: windows of `chunk` tokens every
    * `stride` tokens, last partial window included iff >= minTail tokens. */
  def chunks(text: Column, chunk: Int, stride: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks)
    // window starts: 0, stride, 2*stride, ... while start < n
    val starts = sequence(lit(0), greatest(n - 1, lit(0)), lit(stride))
    filter(
      transform(starts, s => concat_ws(" ", slice(toks, s + 1, lit(chunk)))),
      c => c =!= "")
  }

  val defs: Seq[Q] = Seq(

    // ---- END-TO-END pretraining-data prep (the LLM-side EP1): quality
    //      filter (q124's four integer rules) → global exact dedup on the
    //      normalized fingerprint (keeper = min doc_id per fingerprint,
    //      resolved by one groupBy + one equi-join back — never a window
    //      over the corpus) → source-weighted epoch mixing (q137's shared
    //      weight table, drawn on the KEEPER's md5 bucket) → 2048-token
    //      pack sizing. One per-source summary row out; every stage is
    //      integer-exact and the oracle replays all four, so a drift in
    //      any stage (a rule, the keeper choice, a weight, the ceil)
    //      breaks the hash. Scale: two corpus scans (quality stats +
    //      dedup), both two-phase aggs keyed on uniform md5; the final
    //      join is |sources|-sized. ----
    Q("q140_pretrain_pipeline",
      s"""WITH t AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS toks,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, source, fp,
         |    CAST(len(toks) AS BIGINT) AS ntok,
         |    CAST(len(list_filter(toks, w -> w = 'the' OR w = 'a')) AS BIGINT) AS nstop,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS ndist,
         |    CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS lensum
         |  FROM t),
         |q AS (
         |  SELECT doc_id, source, fp, ntok FROM f
         |  WHERE ntok >= 20 AND nstop >= 2 AND ndist * 2 >= ntok
         |    AND lensum >= 3 * ntok AND lensum <= 10 * ntok),
         |keepers AS (SELECT fp, min(doc_id) AS doc_id FROM q GROUP BY fp),
         |kept AS (
         |  SELECT q.doc_id, q.source, q.ntok,
         |    ${Sampling.MixWeightCaseSql} AS w_mil,
         |    CAST(('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS u
         |  FROM q JOIN keepers USING (fp, doc_id)),
         |mixed AS (
         |  SELECT doc_id, source, ntok,
         |    w_mil // 1000 + CASE WHEN u < w_mil % 1000 THEN 1 ELSE 0 END AS reps
         |  FROM kept),
         |a1 AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(CASE WHEN ntok >= 20 AND nstop >= 2 AND ndist * 2 >= ntok
         |      AND lensum >= 3 * ntok AND lensum <= 10 * ntok
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
         |  FROM f GROUP BY source),
         |a2 AS (
         |  SELECT source, count(*) AS n_unique,
         |    CAST(sum(reps) AS BIGINT) AS epoch_docs,
         |    CAST(sum(reps * ntok) AS BIGINT) AS epoch_tokens,
         |    CAST((sum(reps * ntok) + 2047) // 2048 AS BIGINT) AS n_packs
         |  FROM mixed GROUP BY source)
         |SELECT a1.source, a1.n_docs, a1.n_quality,
         |  CAST(coalesce(a2.n_unique, 0) AS BIGINT) AS n_unique,
         |  coalesce(a2.epoch_docs, 0) AS epoch_docs,
         |  coalesce(a2.epoch_tokens, 0) AS epoch_tokens,
         |  coalesce(a2.n_packs, 0) AS n_packs
         |FROM a1 LEFT JOIN a2 USING (source) ORDER BY source""".stripMargin) { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      val base = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.fingerprint(TextFunctions.normalized(col("text"))).as("fp"),
          size(toks).cast("long").as("ntok"),
          size(filter(toks, w => w === "the" || w === "a")).cast("long").as("nstop"),
          size(array_distinct(toks)).cast("long").as("ndist"),
          aggregate(transform(toks, w => length(w).cast("long")),
            lit(0L), (acc, x) => acc + x).as("lensum"))
      val isQuality = col("ntok") >= 20 && col("nstop") >= 2 &&
        col("ndist") * 2 >= col("ntok") &&
        col("lensum") >= col("ntok") * 3 && col("lensum") <= col("ntok") * 10
      val qual = base.filter(isQuality).select("doc_id", "source", "fp", "ntok")
      val keepers = qual.groupBy("fp").agg(min("doc_id").as("doc_id"))
      val mixed = qual.join(keepers, Seq("fp", "doc_id"))
        .withColumn("w_mil", Sampling.mixWeightMil)
        .withColumn("u", Sampling.hashBucket(col("doc_id"), 1000))
        .withColumn("reps", Sampling.mixReps)
      val a1 = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(isQuality, 1).otherwise(0)).cast("long").as("n_quality"))
      val a2 = mixed.groupBy("source").agg(
        count(lit(1)).as("n_unique"),
        sum("reps").cast("long").as("epoch_docs"),
        sum(col("reps") * col("ntok")).cast("long").as("epoch_tokens"))
        .withColumn("n_packs", expr("(epoch_tokens + 2047) div 2048"))
      a1.join(a2, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_quality"),
          coalesce(col("n_unique"), lit(0L)).as("n_unique"),
          coalesce(col("epoch_docs"), lit(0L)).as("epoch_docs"),
          coalesce(col("epoch_tokens"), lit(0L)).as("epoch_tokens"),
          coalesce(col("n_packs"), lit(0L)).as("n_packs"))
        .orderBy("source")
    },

    // ---- chunking: 32-token windows, stride 16 (50% overlap) ----
    Q("q58_chunk_documents",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, CAST(len(toks) AS BIGINT), 16),
        |      s -> array_to_string(list_slice(toks, CAST(s + 1 AS BIGINT), CAST(s + 32 AS BIGINT)), ' '))) AS chunk_text,
        |    unnest(range(0, CAST((len(toks) + 15) // 16 AS BIGINT))) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text,
        |  CAST(len(string_split(chunk_text, ' ')) AS INTEGER) AS chunk_tokens
        |FROM c WHERE chunk_text <> ''
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(chunks(col("text"), 32, 16)).as(Seq("chunk_idx", "chunk_text")))
        .select(
          col("doc_id"), col("chunk_idx"), col("chunk_text"),
          size(TextFunctions.tokens(col("chunk_text"))).as("chunk_tokens"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- sequence packing: concatenate documents into fixed-token-budget
    //      training sequences (greedy by running token offset). Packing is
    //      PER SOURCE SHARD (window partitioned by source), so at corpus
    //      scale each shard packs independently — no global sort. ----
    Q("q86_seq_pack",
      """WITH t AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS ntok
        |  FROM documents),
        |c AS (
        |  SELECT source, ntok,
        |    SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
        |                    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - ntok) // 2048 AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
        .withColumn("cum", sum("ntok").over(w))
        .withColumn("pack_id", expr("(cum - ntok) div 2048"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("pack_tokens"))
        .orderBy("source", "pack_id")
    },

    // ---- TF-IDF (rational idf, engine-exact) ----
    Q("q59_tfidf",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        |FROM tf JOIN df USING (term) CROSS JOIN n
        |WHERE tf >= 3
        |ORDER BY doc_id, term""".stripMargin) { (s, d) =>
      val tok = Tables.t(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
      val n = Tables.t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      // df (document frequency per term) grows with the VOCABULARY — at
      // corpus scale that's billions of terms, so it must never be
      // broadcast: plain shuffle equi-join on term (both sides already
      // hash-partitioned by term from their aggregations). The 1-row corpus
      // count is the only broadcast side.
      tf.join(df.hint("shuffle_hash"), "term")
        .crossJoin(broadcast(n))
        .filter(col("tf") >= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf").cast("double") *
            (col("n_docs").cast("double") / col("df").cast("double"))).as("score"))
        .orderBy("doc_id", "term")
    },

    // ---- padding-efficiency audit for length-bucketed batching: each doc
    //      pads to the next multiple of 32 tokens; per pad-target bucket
    //      report doc count, real tokens, and padding waste. The batch-prep
    //      question "how much compute burns on pad tokens at this bucket
    //      width" answered with pure integers — narrow map + one two-phase
    //      agg, no shuffle beyond the k-bucket aggregation. ----
    Q("q127_padding_efficiency",
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |           FROM documents),
        |p AS (SELECT ntok, ((ntok + 31) // 32) * 32 AS pad_to FROM t)
        |SELECT pad_to, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS sum_tokens,
        |  CAST(sum(pad_to - ntok) AS BIGINT) AS pad_waste
        |FROM p GROUP BY pad_to ORDER BY pad_to""".stripMargin) { (s, d) =>
      val ntok = size(TextFunctions.tokens(col("text"))).cast("long")
      Tables.t(s, d, "documents")
        .select(ntok.as("ntok"))
        .withColumn("pad_to", expr("(ntok + 31) DIV 32") * 32)
        .groupBy("pad_to")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("sum_tokens"),
          sum(col("pad_to") - col("ntok")).cast("long").as("pad_waste"))
        .orderBy("pad_to")
    },

    // ---- BATCH-padding waste, naive vs length-bucketed (the loader
    //      decision q127's per-doc audit feeds): a training batch pads
    //      every member to the batch MAX, so batch composition decides
    //      the waste — random (md5-"shuffled") batches of ~8 pay for the
    //      longest member, length-bucketed batches (ntok div 16, then
    //      md5 within the bucket) co-locate similar lengths and reclaim
    //      most of it. Batches are md5-keyed, so the comparison is
    //      deterministic in any engine and under any partitioning —
    //      NO corpus-wide window, no row_number ordering. Scale: two
    //      group-bys on bounded keys; the per-bucket batch counts are a
    //      |buckets|-row broadcast. ----
    Q("q291_batch_padding_waste",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |c AS (SELECT CAST(GREATEST(1, count(*) // 8) AS BIGINT) AS nb FROM t),
        |nv AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % (SELECT nb FROM c) AS b, ntok FROM t),
        |nvb AS (SELECT b, count(*) AS n, max(ntok) AS mx, sum(ntok) AS s
        |        FROM nv GROUP BY b),
        |na AS (SELECT count(*) AS n_batches, CAST(sum(s) AS BIGINT) AS tokens,
        |       CAST(sum(n * mx) AS BIGINT) AS slots FROM nvb),
        |lt AS (SELECT doc_id, ntok, ntok // 16 AS lb FROM t),
        |lc AS (SELECT lb, CAST(GREATEST(1, count(*) // 8) AS BIGINT) AS nb
        |       FROM lt GROUP BY lb),
        |lv AS (SELECT l.lb,
        |    CAST(('0x' || substr(md5(CAST(l.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % lc.nb AS b, l.ntok
        |  FROM lt l JOIN lc USING (lb)),
        |lvb AS (SELECT lb, b, count(*) AS n, max(ntok) AS mx, sum(ntok) AS s
        |        FROM lv GROUP BY lb, b),
        |la AS (SELECT count(*) AS n_batches, CAST(sum(s) AS BIGINT) AS tokens,
        |       CAST(sum(n * mx) AS BIGINT) AS slots FROM lvb)
        |SELECT 'length_bucketed' AS strategy, n_batches, tokens, slots,
        |  CAST(CAST(slots - tokens AS HUGEINT) * 1000000 // slots AS BIGINT) AS waste_ppm
        |FROM la
        |UNION ALL
        |SELECT 'naive', n_batches, tokens, slots,
        |  CAST(CAST(slots - tokens AS HUGEINT) * 1000000 // slots AS BIGINT)
        |FROM na
        |ORDER BY strategy""".stripMargin) { (s, d) =>
      val t = Tables.t(s, d, "documents")
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("ntok"))
      val h = graft.operators.Sampling.md5Prefix32(col("doc_id"))
      def summarize(batches: DataFrame, strategy: String): DataFrame =
        batches
          .agg(count(lit(1)).as("n_batches"),
            sum(col("s")).cast("long").as("tokens"),
            sum(col("n") * col("mx")).cast("long").as("slots"))
          .select(lit(strategy).as("strategy"), col("n_batches"),
            col("tokens"), col("slots"),
            // ppm numerator in 128-bit (DECIMAL(38,0) here, HUGEINT in
            // the oracle — both truncating division on non-negatives):
            // at the 100TB corpus scale slots reaches ~1e13 token slots
            // and a BIGINT 1e6·(slots-tokens) product can overflow
            // (round-14 advice)
            expr("(CAST(slots - tokens AS DECIMAL(38,0)) * 1000000)" +
              " div slots").cast("long").as("waste_ppm"))
      val nbF = t.agg(expr("CAST(greatest(1, count(1) div 8) AS BIGINT)")
        .as("nb"))
      val naive = t.crossJoin(broadcast(nbF))
        .select((h % col("nb")).as("b"), col("ntok"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), max("ntok").as("mx"), sum("ntok").as("s"))
      val lt = t.withColumn("lb", expr("ntok div 16"))
      val lc = lt.groupBy("lb")
        .agg(expr("CAST(greatest(1, count(1) div 8) AS BIGINT)").as("nb"))
      val bucketed = lt.join(broadcast(lc), "lb")
        .select(col("lb"), (h % col("nb")).as("b"), col("ntok"))
        .groupBy("lb", "b")
        .agg(count(lit(1)).as("n"), max("ntok").as("mx"), sum("ntok").as("s"))
      summarize(bucketed, "length_bucketed")
        .unionAll(summarize(naive, "naive"))
        .orderBy("strategy")
    },

    // ---- CONCAT-AND-CHUNK packing audit (the q291 decision's sibling
    //      for packed pretraining loaders): docs concatenate in md5
    //      order into fixed 256-token context windows; per source, how
    //      many docs a window boundary SPLITS (a split doc trains with
    //      truncated context — the number an attention-masking /
    //      best-fit-packing decision starts from) and the worst
    //      windows-spanned count. The md5 order makes the layout
    //      deterministic in any engine; the cumulative token offset is
    //      a DISTRIBUTED prefix sum — rows hash to 16 md5-prefix
    //      buckets that are RANGES of the (h, doc_id) total order, the
    //      running sum windows WITHIN a bucket, and each bucket adds a
    //      broadcast 16-row cumulative offset. A bare global
    //      Window.orderBy would drag the whole corpus through ONE task
    //      (the q149 rule this engine bans); the bucketed form computes
    //      the identical offsets with per-bucket parallelism, which is
    //      what physical packing costs anyway (the loader must emit
    //      windows in SOME total order). ----
    Q("q296_pack_sequences",
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |c AS (SELECT doc_id, source, ntok,
        |   COALESCE(SUM(ntok) OVER (ORDER BY h, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        |   FROM t),
        |f AS (SELECT source, ntok, st // 256 AS w0,
        |   (st + ntok - 1) // 256 AS w1 FROM c)
        |SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CASE WHEN w1 > w0 THEN 1 END), 0) AS BIGINT) AS n_split_docs,
        |  CAST(max(w1 - w0 + 1) AS BIGINT) AS max_windows_spanned
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("ntok"),
          md5(col("doc_id").cast("string")).as("h"))
        // the first hex digit is a RANGE of the (h, doc_id) order —
        // the distributed-prefix-sum partition key
        .withColumn("bk", substring(col("h"), 1, 1))
      val wIn = Window.partitionBy("bk").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      // 16-row bucket totals → cumulative offsets (a bounded window
      // over 16 rows, then broadcast back)
      val wBk = Window.orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = t.groupBy("bk").agg(sum(col("ntok")).as("bt"))
        .withColumn("off", coalesce(sum(col("bt")).over(wBk), lit(0L)))
        .select("bk", "off")
      val f = t.join(broadcast(offs), Seq("bk"))
        .withColumn("st",
          col("off") + coalesce(sum(col("ntok")).over(wIn), lit(0L)))
        .select(col("source"), col("ntok"),
          expr("st div 256").as("w0"),
          expr("(st + ntok - 1) div 256").as("w1"))
      f.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("n_tokens"),
          coalesce(sum(when(col("w1") > col("w0"), 1L)), lit(0L))
            .cast("long").as("n_split_docs"),
          max(col("w1") - col("w0") + lit(1L)).cast("long")
            .as("max_windows_spanned"))
        .orderBy("source")
    },

    // ---- composed RAG serving path end-to-end (the retrieval sibling of
    //      q140's training-prep composition): q58's chunking → chunk-level
    //      sparse-cosine retrieval (q130's probe-broadcast shape) → top-3
    //      chunks per query → payload join back to chunk text (md5) and
    //      parent-doc source. One gated surface proves the three stages
    //      compose without drift. Scale: chunk postings are corpus-sized
    //      and keyed by token; the 3-query probe tf BROADCASTS; the text
    //      store joins only against the 9 winning (query, chunk) keys —
    //      broadcast of the HITS, never a shuffle of the store (q126). ----
    Q("q162_rag_pipeline",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, CAST(len(toks) AS BIGINT), 16),
        |      s -> array_to_string(list_slice(toks, CAST(s + 1 AS BIGINT), CAST(s + 32 AS BIGINT)), ' '))) AS chunk_text,
        |    unnest(range(0, CAST((len(toks) + 15) // 16 AS BIGINT))) AS chunk_idx
        |  FROM t),
        |cc AS (SELECT * FROM c WHERE chunk_text <> ''),
        |ctf AS (SELECT doc_id, chunk_idx, w, count(*) AS c FROM (
        |    SELECT doc_id, chunk_idx, unnest(string_split(chunk_text, ' ')) AS w
        |    FROM cc) u GROUP BY 1, 2, 3),
        |cn AS (SELECT doc_id, chunk_idx, sum(c * c) AS n2 FROM ctf GROUP BY 1, 2),
        |qtf AS (SELECT doc_id AS qid, w, count(*) AS qc FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE doc_id < 3) u GROUP BY 1, 2),
        |qn AS (SELECT qid, sum(qc * qc) AS qn2 FROM qtf GROUP BY 1),
        |dots AS (
        |  SELECT q.qid, t.doc_id AS nid, t.chunk_idx,
        |    CAST(sum(q.qc * t.c) AS BIGINT) AS dp
        |  FROM qtf q JOIN ctf t ON t.w = q.w AND t.doc_id <> q.qid
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT d.qid, d.nid, d.chunk_idx,
        |    CAST(d.dp AS DOUBLE) / sqrt(CAST(a.qn2 * b.n2 AS DOUBLE)) AS cos
        |  FROM dots d JOIN qn a ON a.qid = d.qid
        |  JOIN cn b ON b.doc_id = d.nid AND b.chunk_idx = d.chunk_idx),
        |r AS (SELECT qid, nid, chunk_idx, cos,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY cos DESC, nid, chunk_idx) AS rn FROM scored)
        |SELECT r.qid, CAST(r.rn AS INTEGER) AS rank, r.nid,
        |  CAST(r.chunk_idx AS INTEGER) AS chunk, r.cos,
        |  md5(cc.chunk_text) AS chunk_md5, d2.source
        |FROM r JOIN cc ON cc.doc_id = r.nid AND cc.chunk_idx = r.chunk_idx
        |JOIN documents d2 ON d2.doc_id = r.nid
        |WHERE r.rn <= 3 ORDER BY r.qid, r.rn""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.t(s, d, "documents")
      val cc = docs.select(col("doc_id"),
          posexplode(chunks(col("text"), 32, 16)).as(Seq("chunk_idx", "chunk_text")))
        .filter(col("chunk_text") =!= "")
      val ctf = cc.select(col("doc_id"), col("chunk_idx"),
          explode(TextFunctions.tokens(col("chunk_text"))).as("w"))
        .groupBy("doc_id", "chunk_idx", "w").agg(count(lit(1)).as("c"))
      val cn = ctf.groupBy("doc_id", "chunk_idx")
        .agg(sum(col("c") * col("c")).as("n2"))
      val qtf = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          explode(TextFunctions.tokens(col("text"))).as("w"))
        .groupBy("qid", "w").agg(count(lit(1)).as("qc"))
      val qn = qtf.groupBy("qid").agg(sum(col("qc") * col("qc")).as("qn2"))
      val rw = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("nid"), col("chunk_idx"))
      val top = ctf.join(broadcast(qtf), Seq("w"))
        .filter(col("doc_id") =!= col("qid"))
        .groupBy(col("qid"), col("doc_id").as("nid"), col("chunk_idx"))
        .agg(sum(col("qc") * col("c")).cast("long").as("dp"))
        .join(broadcast(qn), Seq("qid"))
        .join(cn.withColumnRenamed("doc_id", "nid"), Seq("nid", "chunk_idx"))
        .select(col("qid"), col("nid"), col("chunk_idx"),
          (col("dp").cast("double") /
            sqrt((col("qn2") * col("n2")).cast("double"))).as("cos"))
        .withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 3)
      // payload join: broadcast the 9 hits onto the corpus-sized stores
      // (hit keys renamed — top shares cc's lineage, and same-name columns
      // across a self-derived join are ambiguous)
      val hits = top.select(col("qid"), col("rank"), col("nid"),
        col("chunk_idx").as("h_chunk"), col("cos"))
      val withChunk = cc.join(broadcast(hits),
          col("doc_id") === col("nid") && col("chunk_idx") === col("h_chunk"))
        .select(col("qid"), col("rank"), col("nid"),
          col("h_chunk").cast("int").as("chunk"), col("cos"),
          md5(col("chunk_text")).as("chunk_md5"))
      docs.select(col("doc_id").as("nid"), col("source"))
        .join(broadcast(withChunk), Seq("nid"))
        .select(col("qid"), col("rank"), col("nid"), col("chunk"),
          col("cos"), col("chunk_md5"), col("source"))
        .orderBy("qid", "rank")
    }
  )
}
