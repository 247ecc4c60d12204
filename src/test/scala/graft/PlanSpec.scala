package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that make these operators
  * survive a 100×–1000× scale-up. Asserted on the executed plan so a
  * regression (lost pushdown, accidental sort-merge join of a dim table,
  * full sort instead of top-k) fails CI rather than a future bench run. */
class PlanSpec extends SparkTestBase {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, Sf)

  private def planOf(df: DataFrame): String = {
    df.collect() // ensure AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q01: filters and projection reach the parquet scan") {
    val p = planOf(q("q01_scan_filter_project"))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    // column pruning: the 11-column table reads only the 4 projected columns
    // plus the filter column (which the final Project then drops)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_returnflag:string"), p)
  }

  test("q07: dimension joins broadcast (no shuffle of the fact side)") {
    val p = planOf(q("q07_join_star"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q05: top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = planOf(q("q05_group_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q03: aggregation is two-phase (partial + final hash agg)") {
    val p = planOf(q("q03_agg_pricing_summary"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("q42: pairwise scoring runs the codegen'd graft_dot in WholeStageCodegen") {
    val df = q("q42_embedding_neardup")
    val p = planOf(df)
    assert(p.contains("graft_dot"), p)
    // the pair-scoring Project sits inside a WholeStageCodegen stage
    // (rendered as "*(n) Project [... graft_dot ...]" in the plan string)
    assert(p.linesIterator.exists(l => l.contains("graft_dot") &&
      l.contains("Project") && l.contains("*(")), p)
  }

  test("q40: signature aggregation runs in ObjectHashAggregate (no sort fallback)") {
    val p = planOf(q("q40_minhash_lsh"))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("q52: merge hint forces a shuffle sort-merge join") {
    val p = planOf(q("q52_join_sortmerge"))
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q61: band lookup broadcasts the small side of the non-equi join") {
    val p = planOf(q("q61_range_join"))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q39: probe shingles broadcast — no shingle self-join, no corpus shuffle") {
    // other suites may have cached the documents table in the shared
    // session; these gates assert the engine's OWN plan has no cache
    spark.sharedState.cacheManager.clearCache()
    val p = planOf(q("q39_ngram_jaccard"))
    // the bounded probe set is the build side of a broadcast join: the
    // corpus side is a single narrow scan, nothing shuffles on the shingle
    assert(p.contains("BroadcastHashJoin"), p)
    // a join keyed by the shingle with shuffled sides is the quadratic
    // hot-key shape this query was re-scoped to avoid
    assert(!p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("InMemoryRelation"), p)
  }

  test("CC symmetrization is one-pass: the edge subtree is scanned once") {
    // an aggregate-shaped edge list (stand-in for the keep-list pipelines'
    // expensive candidate/verify subtree): the two-branch union form would
    // scan + aggregate it twice; the explode form must plan ONE scan
    import graft.operators.Graph
    val docs = Tables.t(spark, Sf, "documents")
    val edges = docs.groupBy(col("lang"))
      .agg(min("doc_id").as("src"), max("doc_id").as("dst"))
    // AQE's toString renders the plan twice (final + initial) — count scans
    // in the final plan only
    val p = planOf(Graph.symmetrized(edges)).split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(p.contains("Generate explode"), p)
  }

  test("q40: band self-join reuses the signature exchange instead of caching") {
    spark.sharedState.cacheManager.clearCache()
    val p = planOf(q("q40_minhash_lsh"))
    assert(p.contains("ReusedExchange"), p)
    assert(!p.contains("InMemoryRelation"), p)
  }

  test("q97: capped path two-phases the df count and still shuffle-joins cache-free") {
    spark.sharedState.cacheManager.clearCache()
    val p = planOf(q("q97_ngram_jaccard_capped"))
    // round-10 advice item 2: the df cap is groupBy(s).count + equi-join
    // (map-side partial counts — a hot shingle never materializes its full
    // posting list in one task, which the old count-over-Window did); the
    // pair self-join still shuffles and stays cache-free
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("InMemoryRelation"), p)
  }

  test("q105: contamination two-phases the df cap, join never broadcasts") {
    spark.sharedState.cacheManager.clearCache()
    val p = planOf(q("q105_contamination"))
    // two-phase df cap (see q97 pin); the train-distinct and the train⋈eval
    // join key on the same shingle partitioning — the train shingle set is
    // vocabulary-sized and must never collect to the driver
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("InMemoryRelation"), p)
  }

  test("q59: TF-IDF document-frequency join never broadcasts the vocabulary") {
    val p = planOf(q("q59_tfidf"))
    // term-keyed join must be a shuffle join (df table is vocabulary-sized);
    // the only broadcast allowed is the 1-row corpus count
    val termJoin = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("term#")).toSeq
    assert(termJoin.nonEmpty, p)
    assert(!termJoin.exists(_.contains("BroadcastHashJoin")), p)
  }

  test("keep-list pair stage is LSH-routed: no raw-shingle self-join") {
    // Same pipeline nearDupKeepList builds internally (its own executed plan
    // hides these stages behind the CC checkpoints, so assert on the pair
    // stage directly): candidates from the band-bucket equi-join, exact
    // Jaccard restricted to candidates via doc-id-keyed joins.
    import graft.operators.Dedup
    val docs = Tables.t(spark, Sf, "documents")
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val bands = Dedup.lshBands(
      Dedup.signaturesFromShingles(sh, "doc_id", 16), "doc_id", 16, 4)
    val pairs = Dedup.verifyCandidates(
      Dedup.candidatesFromBands(bands, "doc_id"), sh, "doc_id", 0.8)
    val p = planOf(pairs)
    assert(p.contains("band_hash"), p)
    // a join keyed by the shingle ALONE is the quadratic hot-key shape;
    // the verification join is keyed by (doc id, shingle), which is fine
    assert("Join \\[s#\\d+[^,\\]]*\\], \\[s#\\d+".r.findFirstIn(p).isEmpty, p)
  }

  test("q81: multi-probe candidates come from an equi-join, never a nested loop") {
    val p = planOf(q("q81_knn_multiprobe"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("graft_lsh_bucket"), p) // codegen'd bucketing in the scan stage
  }

  test("q107: k-means centroids broadcast, argmin is a two-phase agg") {
    val p = planOf(q("q107_kmeans_assign"))
    // k centroids broadcast (n×k scoring is a narrow map over one scan);
    // the packed-key argmin must partial-aggregate map-side so the shuffle
    // carries one row per vector — a Window formulation would shuffle n×k
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q109: IVF candidates come from the list equi-join, assignment stays packed") {
    val p = planOf(q("q109_knn_ivf")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // exactly TWO nested-loop joins, both with a k-bounded broadcast build
    // side: corpus×centroids (assignment scoring) and queries×centroids
    // (probe routing). The corpus is never joined against itself — rerank
    // candidates come only from the cid equi-join over the inverted lists.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_min"), p)
  }

  test("q84: SimHash band join is an equi-join, never a nested loop") {
    val p = planOf(q("q84_simhash_bands"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("band_val"), p)
  }

  test("q86: sequence packing windows per source shard — no global sort barrier") {
    val p = planOf(q("q86_seq_pack"))
    // the running-sum Window must be partitioned (by source), not a single
    // global ordering — that's what keeps packing shard-parallel at scale
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty, p)
    assert(windowLines.forall(_.contains("source#")), p)
  }

  test("q91: as-of runs on the custom physical operator, not a window buffer") {
    val p = planOf(q("q91_asof_merge_join"))
    assert(p.contains("AsOfMergeJoin"), p)
    assert(!p.contains("Window"), p)
    // co-partitioned: exactly one exchange per side feeding the merge
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("entry flagship broadcasts dims and aggregates exactly once per region") {
    val df = SparkEntry.entry(spark)
    val p = planOf(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(df.count() === 5)
  }

  test("q116: char-diversity is per-row — no exchange before the final sort") {
    val p = planOf(q("q116_char_diversity")).split("== Initial Plan ==").head
    // the only exchange allowed is the rangepartitioning of the ORDER BY;
    // the quality math itself must stay narrow
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q119: outlier top-k is TakeOrderedAndProject, never a full sort") {
    val p = planOf(q("q119_kmeans_outliers")).split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), p)
  }

  test("q115: both window functions and the final agg ride ONE source partitioning") {
    val p = planOf(q("q115_length_percentiles")).split("== Initial Plan ==").head
    // rank + count windows and the groupBy all key on `source`: one hash
    // exchange total (plus the tiny ORDER BY range partitioning)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q114: substring dedup joins on the uniform window hash — no cartesian") {
    val p = planOf(q("q114_substring_dedup")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // per-doc rollup is two-phase
    assert(p.contains("partial_count"), p)
  }

  test("q120: vocab frequency table is shuffle-joined, never broadcast; bottom-k is top-k") {
    val p = planOf(q("q120_unigram_commonness")).split("== Initial Plan ==").head
    // the corpus-frequency side grows with the vocabulary — a broadcast
    // here OOMs the driver at corpus scale
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q121: both windows and the quota filter ride ONE lang partitioning") {
    val p = planOf(q("q121_stratified_sample")).split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q132: two-pass quota sample — the only window ranks the boundary-bucket slice") {
    val p = planOf(q("q132_stratified_twopass")).split("== Initial Plan ==").head
    // exactly ONE window in the whole plan, and its input is the output of
    // the broadcast bb equi-join (the ~1/1024 boundary slice) — q121's
    // full-stratum row_number never appears. The histogram pass runs
    // eagerly at build and leaves no Window behind.
    assert("Window \\[".r.findAllIn(p).size === 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q122: PII redaction is a narrow map — zero hash exchange") {
    val p = planOf(q("q122_pii_redact")).split("== Initial Plan ==").head
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q137: mixing upsample is a narrow map + generator — zero hash exchange") {
    val p = planOf(q("q137_mix_upsample")).split("== Initial Plan ==").head
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("q138: random projection is a narrow codegen'd map — zero hash exchange") {
    val p = planOf(q("q138_random_projection")).split("== Initial Plan ==").head
    assert(!p.contains("Exchange hashpartitioning"), p)
    // each projected component is one codegen'd exact integer dot
    assert(p.contains("graft_dot"), p)
  }

  test("q139: both projected-kNN ranking windows share ONE qid partitioning") {
    val p = planOf(q("q139_projected_knn")).split("== Initial Plan ==").head
    // candidate cut (prank) and exact rerank (rank) must ride the same
    // hash partitioning on qid — a second exchange would reshuffle the
    // full candidate set between the two windows
    assert("Exchange hashpartitioning\\(qid".r.findAllIn(p).size === 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q140: pretrain pipeline — keeper resolution never windows the corpus") {
    val p = planOf(q("q140_pretrain_pipeline")).split("== Initial Plan ==").head
    // exact dedup picks keepers with a groupBy + equi-join back, so no
    // Window (a row_number-per-fingerprint would sort the corpus), and
    // the only joins are equi-joins (fp/doc_id keeper, |sources| summary)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q123: semantic-dedup pairs come only from the cid equi-join") {
    val p = planOf(q("q123_semantic_dedup")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins are the k-bounded corpus×centroids
    // assignment scoring (the subtree appears once per side of the pair
    // join); the pair search itself must be a within-cluster EQUI-join,
    // so the corpus is never cross-paired
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(p.contains("partial_min"), p)
  }

  test("q124: quality funnel is one narrow map + one source aggregation") {
    val p = planOf(q("q124_quality_funnel")).split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("q136: bloom bitmap broadcasts, the exact twin keeps its shuffle-hash probe") {
    val p = planOf(q("q136_incremental_bloom")).split("== Initial Plan ==").head
    // exact path: the corpus-sized distinct-hash set must stay a shuffle
    // join (q125's property); bloom path: the fixed-size bitmap is the
    // broadcast side of a narrow probe
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q125: old-snapshot hash set is shuffle-probed, never broadcast") {
    val p = planOf(q("q125_incremental_dedup")).split("== Initial Plan ==").head
    // the old corpus's distinct window-hash set is corpus-sized at scale
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q126: document payload join broadcasts the tiny top-k, text store never shuffles") {
    val p = planOf(q("q126_rag_retrieve")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // the (queries × k) result is the build side; a sort-merge here would
    // shuffle the whole text corpus for a 15-row lookup
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q127: padding audit is one narrow map + one bucket aggregation") {
    val p = planOf(q("q127_padding_efficiency")).split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("q128: sketch cells broadcast; the token stream aggregates map-side first") {
    val p = planOf(q("q128_countmin_heavyhitters")).split("== Initial Plan ==").head
    // the depth×width sketch is constant-size — the ONE broadcast-legal
    // summary; token occurrences must partial-aggregate before any shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q129: corpus-frequency side is shuffle-joined on the token, totals broadcast") {
    val p = planOf(q("q129_source_signature")).split("== Initial Plan ==").head
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q142: BM25 — probes broadcast, df shuffle-joined, no corpus self-join") {
    val p = planOf(q("q142_bm25_retrieve")).split("== Initial Plan ==").head
    // probe terms + the 1-row corpus constants broadcast; the vocab-sized
    // df side must shuffle-join on the token (broadcasting "the vocab" is
    // the classic it-fits-at-sf0.1 trap)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q130: probe postings broadcast onto the inverted index — no corpus self-join") {
    val p = planOf(q("q130_sparse_cosine_retrieve")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // candidates come from the token-keyed broadcast join of the bounded
    // probe set; the corpus posting list is never joined against itself
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q146: fixed top-100 vocab broadcasts onto the token stream") {
    val p = planOf(q("q146_vocab_oov")).split("== Initial Plan ==").head
    // the vocab is a BOUNDED top-k (not the corpus vocabulary), so
    // broadcasting is the right call — the probe side stays shuffle-free
    // until the final per-source aggregation
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q147: shard manifest is one two-phase agg, no window, no sort barrier") {
    val p = planOf(q("q147_shard_manifest")).split("== Initial Plan ==").head
    assert(!p.contains("Window"), p)
    // min_by/max_by ride the partial aggregation (map-side combine), so
    // the only exchange carries |shards| partial rows, not the corpus
    // (min_by's extremum buffer forces SortAggregate — still two-phase,
    // and the per-partition sort is on the 16-value shard key)
    assert(p.contains("partial_min_by"), p)
    assert("(Sort|Hash)Aggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q150: PageRank rounds are join-aggregate — no cartesian, top-k broadcast") {
    val p = planOf(q("q150_token_pagerank")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // the bounded top-20 node set broadcasts onto the pair stream; each
    // round's contribution is an equi-join + two-phase sum
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q148: MERGE apply is anti-join + union — no window, no cartesian") {
    val p = planOf(q("q148_cdc_merge")).split("== Initial Plan ==").head
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("q149: SCD2 windows partition by user — never a global window") {
    val df = q("q149_scd2_history")
    val p = planOf(df)
    // both lag/lead windows carry the user_id partitioning; an empty
    // PARTITION BY would single-task the corpus (the q115 trap)
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(user_id"), p)
    // a lost partition spec would shuffle everything into one task
    assert(!p.contains("SinglePartition"), p)
  }

  test("q162: RAG pipeline — probes and hits broadcast, stores never self-joined") {
    val p = planOf(q("q162_rag_pipeline")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // the 3-query probe tf and the 9 winning hits broadcast; the chunk
    // postings and the text store never shuffle against each other
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q152: late-arrival audit windows partition by user — never one task") {
    val p = planOf(q("q152_late_arrivals"))
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("partitioned ORC layout prunes partitions on a source filter") {
    // the layout q144 writes: a filtered read must push the partition
    // predicate into the scan (directory pruning), not filter post-scan —
    // THE property that makes a partitioned 100 TB corpus store usable
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune")
    tmp.toFile.deleteOnExit()
    Tables.t(spark, Sf, "documents")
      .write.mode("overwrite").partitionBy("source").orc(tmp.toString)
    val df = spark.read.orc(tmp.toString).filter(col("source") === "src0")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("src0"), p)
    // the data filter must NOT survive as a post-scan Filter on source
    assert(!p.contains("Filter (source"), p)
  }

  test("q171: both lineitem coverage legs ride ONE lineitem scan") {
    val p = planOf(q("q171_join_coverage")).split("== Initial Plan ==").head
    // the two lineitem->dim legs share a single fact scan (left-join both
    // unique-key dims in sequence, one agg, stack into two rows) — a
    // per-leg scan doubles the 100 TB fact read
    assert("lineitem".r.findAllIn(
      p.linesIterator.filter(_.contains("FileScan parquet")).mkString("\n"))
      .size === 1, p)
    assert(!p.contains("SortMergeJoin"), p) // dims broadcast at this SF
  }

  test("q170: Benford total is computed in-plan (one orders scan, no " +
    "BroadcastNestedLoopJoin)") {
    val p = planOf(q("q170_benford_digits")).split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert("Window \\[".r.findAllIn(p).size === 1, p)
  }

  test("q165: trailing-7-day membership is an equi-join (hash), never a " +
    "nested-loop day×activity compare") {
    val p = planOf(q("q165_dau_wau")).split("== Initial Plan ==").head
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("q176: weighted priority sample is a narrow map + top-k — no " +
    "shuffle of the corpus, no full sort") {
    val p = planOf(q("q176_priority_sample")).split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q175: corpus-sized frequency tables hash-join (never broadcast), " +
    "final top-k not a full sort") {
    val p = planOf(q("q175_bigram_coherence")).split("== Initial Plan ==").head
    // both the bigram- and unigram-frequency tables grow with the corpus:
    // a broadcast would OOM the driver at 100 TB
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q177: salted join keys on (w, salt) — the hot token spreads over " +
    "R partitions; df side never broadcasts") {
    val p = planOf(q("q177_salted_join")).split("== Initial Plan ==").head
    assert(p.contains("ShuffledHashJoin [w#"), p)
    // the join key must include the salt column, or the demo degrades to
    // the plain skewed join
    assert("ShuffledHashJoin \\[w#\\d+, salt#".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q179: PQ encode is narrow (no Exchange before the ADC join); the " +
    "bounded sides broadcast at both stages; top-100 cut is map-side") {
    val p = planOf(q("q179_pq_knn")).split("== Initial Plan ==").head
    // stage 1: queries broadcast over the corpus code stream — the corpus
    // side reaches the ADC join straight from its scan, encode is a map
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    val corpusSide = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
      .split("BroadcastExchange").head
    assert(!corpusSide.contains("Exchange hashpartitioning"), p)
    // the candidate cut runs BEFORE the qid shuffle (only ~100·|queries|
    // rows move), not after it
    assert("WindowGroupLimit \\[qid#\\d+L\\], \\[adist#\\d+L[\\s\\S]{0,120}100, Partial"
      .r.findFirstIn(p).isDefined, p)
    // stage 2: the bounded candidate set is the BUILD side (BuildLeft) —
    // the corpus never builds a hash table
    assert("BroadcastHashJoin \\[nid#\\d+L\\], \\[nid#\\d+L\\], Inner, BuildLeft"
      .r.findFirstIn(p).isDefined, p)
  }

  test("q180: the LIMIT-bounded induced stop list broadcasts; the df cut " +
    "is a top-k, not a full sort") {
    val p = planOf(q("q180_stopword_density")).split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("BroadcastHashJoin \\[w#".r.findFirstIn(p).isDefined, p)
  }

  test("q181: the vocab-sized type table is the build side — the corpus " +
    "token stream is never shuffled by word") {
    val p = planOf(q("q181_bpe_fertility")).split("== Initial Plan ==").head
    assert("BroadcastHashJoin \\[w#".r.findFirstIn(p).isDefined, p)
    // no exchange keyed by the token column anywhere: the only shuffle
    // keys are doc/source aggregates
    assert(!"Exchange hashpartitioning\\(w#".r.findFirstIn(p).isDefined, p)
  }

  test("q182: decile thresholds ride broadcast inequality joins — the " +
    "vocab/doc aggregates are the only shuffles") {
    val p = planOf(q("q182_vocab_growth")).split("== Initial Plan ==").head
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q183: corpus-derived unigram tables join by shuffle hash (never " +
    "broadcast); top-20 is a TakeOrderedAndProject") {
    val p = planOf(q("q183_collocation_lift")).split("== Initial Plan ==").head
    assert("ShuffledHashJoin \\[w1#".r.findFirstIn(p).isDefined, p)
    assert("ShuffledHashJoin \\[w2#".r.findFirstIn(p).isDefined, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q184: IVFADC candidates come from a cell equi-join against the " +
    "broadcast routed queries; the index build is narrow; rerank builds " +
    "on the candidate side") {
    val p = planOf(q("q184_ivf_adc_knn")).split("== Initial Plan ==").head
    // candidate generation: equi-join on the cell id, queries broadcast
    assert("BroadcastHashJoin \\[cell#".r.findFirstIn(p).isDefined, p)
    // no cartesian/BNLJ anywhere except the tiny query-routing cross join
    assert(!p.contains("CartesianProduct"), p)
    // rerank: bounded candidate set is the build side
    assert("BroadcastHashJoin \\[nid#\\d+L\\], \\[nid#\\d+L\\], Inner, BuildLeft"
      .r.findFirstIn(p).isDefined, p)
  }

  test("q185: handle-served ANN reads the materialized index (flat RDD " +
    "scan, no corpus re-encode), same join shapes as the inline q184") {
    val p = planOf(q("q185_ann_index_serve")).split("== Initial Plan ==").head
    // the index side is the persisted (nid, cell, codes) artifact — a
    // bare scan, NOT a parquet scan + encode projection
    assert(p.contains("Scan ExistingRDD"), p)
    // encode is the only least() user on this route (routing is a
    // window, ADC tables are plain arrays): any least() in the serving
    // plan means the optimizer folded the corpus re-encode back in
    assert(!p.contains("least("), p)
    // candidate generation + rerank keep q184's shapes
    assert("BroadcastHashJoin \\[cell#".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin \\[nid#\\d+L\\], \\[nid#\\d+L\\], Inner, BuildLeft"
      .r.findFirstIn(p).isDefined, p)
  }

  test("q198: SQ8 encode is narrow (no Exchange before the code-distance " +
    "join); bounded sides broadcast at both stages; top-100 cut is map-side") {
    val p = planOf(q("q198_sq8_knn")).split("== Initial Plan ==").head
    // stage 1: encoded queries broadcast over the corpus code stream —
    // the corpus side reaches the code-distance join straight from its
    // scan (encode is a literal-bound projection, never a shuffle)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    val corpusSide = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
      .split("BroadcastExchange").head
    assert(!corpusSide.contains("Exchange hashpartitioning"), p)
    // the candidate cut runs BEFORE the qid shuffle
    assert("WindowGroupLimit \\[qid#\\d+L\\], \\[adist#\\d+L[\\s\\S]{0,120}100, Partial"
      .r.findFirstIn(p).isDefined, p)
    // stage 2: bounded candidates are the build side
    assert("BroadcastHashJoin \\[nid#\\d+L\\], \\[nid#\\d+L\\], Inner, BuildLeft"
      .r.findFirstIn(p).isDefined, p)
  }

  test("q200: LM freq tables hash-join (never broadcast); the 1-row mean " +
    "is the only nested-loop side") {
    val p = planOf(q("q200_lm_loglik_filter")).split("== Initial Plan ==").head
    // bigram- and unigram-frequency tables grow with the corpus — q175's
    // broadcast-would-OOM rule
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the threshold join is the broadcast 1-row mean — and nothing else
    // nested-loops
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size === 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q201: both role rankings (pos + hard-neg) share ONE qid window " +
    "partitioning; queries broadcast over the corpus") {
    val p = planOf(q("q201_hard_negative_mining")).split("== Initial Plan ==").head
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    // a second hashpartitioning on qid would mean the two roles ranked in
    // separate shuffles
    assert("Exchange hashpartitioning\\(qid#".r.findAllIn(p).size === 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q204: fidelity candidates come from the band equi-join — no join " +
    "keyed by the raw shingle alone, signatures join by doc id") {
    val p = planOf(q("q204_minhash_fidelity")).split("== Initial Plan ==").head
    // band-bucket equi-join present
    assert("ShuffledHashJoin \\[band_idx#|SortMergeJoin \\[band_idx#|BroadcastHashJoin \\[band_idx#"
      .r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
    // the shingle-intersection join is keyed (id, s) — never s alone,
    // which would be the quadratic stopword blow-up
    assert(!"Exchange hashpartitioning\\(s#\\d+, 32\\)".r.findFirstIn(p).isDefined, p)
  }

  test("q206: matryoshka keeps q198's funnel shape — prefix scoring " +
    "narrow, queries broadcast, map-side candidate cut, BuildLeft rerank") {
    val p = planOf(q("q206_matryoshka_rerank")).split("== Initial Plan ==").head
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    val corpusSide = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
      .split("BroadcastExchange").head
    assert(!corpusSide.contains("Exchange hashpartitioning"), p)
    assert("WindowGroupLimit \\[qid#\\d+L\\], \\[adist#\\d+L[\\s\\S]{0,120}100, Partial"
      .r.findFirstIn(p).isDefined, p)
    assert("BroadcastHashJoin \\[nid#\\d+L\\], \\[nid#\\d+L\\], Inner, BuildLeft"
      .r.findFirstIn(p).isDefined, p)
  }

  test("q210: drift thresholds broadcast; the only corpus-keyed shuffle " +
    "is the 10-bucket aggregation") {
    val p = planOf(q("q210_embedding_drift_chi2")).split("== Initial Plan ==").head
    // the 9-element threshold array and the 1-row totals ride broadcasts
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // bucket counting shuffles by the bucket id (≤ 10 groups), never by
    // the vector id
    assert("Exchange hashpartitioning\\(b#".r.findFirstIn(p).isDefined, p)
    assert(!"Exchange hashpartitioning\\(vec_id#".r.findFirstIn(p).isDefined, p)
  }

  test("runtime bloom-filter join pruning: the fact scan carries " +
    "might_contain from the selective dim side") {
    // the 100 TB fact-join move Tuning.enableRuntimeJoinFilters turns on:
    // the fact side is filtered AT THE SCAN by a bloom filter of the dim
    // side's surviving join keys, so the shuffle moves only joinable rows.
    // Shuffle join forced (broadcast would sidestep injection); the size
    // gate is lowered because a local fixture never reaches 10 GB.
    val prevBloom = graft.sources.Tuning.enableRuntimeJoinFilters(spark,
      applicationSideScanBytesThreshold = 0L)
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.t(spark, Sf, "lineitem")
      val ord = Tables.t(spark, Sf, "orders")
        .filter(col("o_orderstatus") === "F")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity"))
      val p = planOf(j)
      assert(p.contains("might_contain"), p)
      // and the filter sits on the lineitem (fact) side, keyed by its column
      assert("might_contain[\\s\\S]{0,80}l_orderkey".r.findFirstIn(p).isDefined, p)
    } finally {
      graft.sources.Tuning.restoreConfs(spark, prevBloom)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("q214 span cutter: candidates ride the shingle equi-join, the " +
    "token rebuild is a narrow array map (no range join)") {
    val p = planOf(q("q214_substring_run_cut"))
    // no interval range-join: the cut test is an array `exists` per
    // token, so nothing may plan as a nested-loop/cartesian over
    // (tokens x intervals)
    assert(!p.contains("CartesianProduct"), p)
    // the run detection shuffles by the uniform shingle hash, never by
    // raw text or position
    assert("Exchange hashpartitioning\\(h#".r.findFirstIn(p).isDefined, p)
  }

  test("q215 release composition: no cartesian product; exact dedup " +
    "keyed by fingerprint; the near-dup stage sits behind its snapshot") {
    val p = planOf(q("q215_corpus_release"))
    assert(!p.contains("CartesianProduct"), p)
    // stage-2 exact dedup joins keeper ids back BY FINGERPRINT — the
    // corpus-sized shuffle is keyed by the uniform md5 fp, never raw text
    assert("hashpartitioning\\(fp#".r.findFirstIn(p).isDefined, p)
    // the decontamination stage's 5-gram shuffle is keyed by the uniform
    // shingle hash WITH the df-cap window riding the same partitioning
    // (the q97/q105 skew rule — capped, never a raw self-join)
    assert("hashpartitioning\\(s#".r.findFirstIn(p).isDefined, p)
    assert(p.contains("Window"), p)
  }

  test("q243/q245: artifact-served consumers read ONLY the artifact — " +
    "file-backed parquet scan, zero joins on the serve path") {
    // the returned frame IS the serve path (the save/load happen eagerly
    // inside the body): if any release-pipeline stage leaked into it, a
    // Join or an fp/s-keyed exchange would appear here
    val p43 = planOf(q("q243_release_epoch_mix_from_artifact"))
    assert(p43.contains("Scan parquet") || p43.contains("FileScan parquet"), p43)
    assert(!p43.contains("Join"), p43)
    assert(!p43.contains("hashpartitioning(fp#"), p43)
    val p45 = planOf(q("q245_release_pack_from_artifact"))
    assert(p45.contains("Scan parquet") || p45.contains("FileScan parquet"), p45)
    assert(!p45.contains("Join"), p45)
    // packing stays per source shard: the running-offset window rides a
    // source partitioning, never one global task
    assert("hashpartitioning\\(source#".r.findFirstIn(p45).isDefined, p45)
  }

  test("q251/q257: the LOADED SQ8 handle serves from the persisted code " +
    "table — corpus side never re-encoded; the filtered variant's " +
    "allow-list semi-join sits BELOW the candidate cut") {
    import graft.operators.Sq8Index
    val emb = Tables.t(spark, Sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-sq8")
    dir.toFile.deleteOnExit()
    val built = Sq8Index.build(emb, "vec_id", "embedding", dim = 64)
    built.save(dir.toString)
    built.release()
    val loaded = Sq8Index.load(spark, dir.toString, emb)
    val served = loaded.query(emb.filter(col("vec_id") < 10), k = 5,
      candidates = 100)
    served.collect()
    val p = served.queryExecution.executedPlan.toString
    // the q198 funnel shape survives the artifact round-trip: bounded
    // encoded queries broadcast over the corpus code stream
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    // the corpus side between the join and the query-side broadcast is
    // the persisted table — the literal-bound div/clamp encode lanes
    // (`least(greatest(`) must NOT reappear there (they'd mean the load
    // path re-encodes the corpus per query)
    val corpusSide = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
      .split("BroadcastExchange").head
    assert(!corpusSide.contains("least(greatest("), p)
    assert(corpusSide.contains("InMemoryTableScan"), p)
    // map-side candidate cut, bounded-candidate rerank build side
    assert("WindowGroupLimit \\[qid#\\d+L\\], \\[adist#\\d+L[\\s\\S]{0,120}100, Partial"
      .r.findFirstIn(p).isDefined, p)
    // filtered serving: the allow-list admission join must run BEFORE
    // the WindowGroupLimit cut — budget spent on admissible vectors
    val filtered = loaded.queryFiltered(emb.filter(col("vec_id") < 10),
      emb.filter(col("label") < 5).select("vec_id"), k = 5,
      candidates = 100)
    filtered.collect()
    val pf = filtered.queryExecution.executedPlan.toString
    val semiAt = "Join [A-Za-z]*,? ?LeftSemi|LeftSemi".r
      .findFirstMatchIn(pf).map(_.start)
    val cutAt = "WindowGroupLimit".r.findFirstMatchIn(pf).map(_.start)
    assert(semiAt.isDefined && cutAt.isDefined, pf)
    // plan text prints top-down: the cut appears ABOVE (before) the
    // semi-join that feeds it
    assert(cutAt.get < semiAt.get,
      s"allow-list semi-join is not below the candidate cut:\n$pf")
    loaded.release()
  }

  test("semantic dedup: the pair stage rides the cid equi-join (never a " +
    "cartesian); the only nested-loop broadcast is the k-row centroid " +
    "table on the build side") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, Sf, "embeddings")
    val cent = Similarity.kmeansTrain(emb, "vec_id", "embedding",
      k = 8, rounds = 2)
    val cells = Similarity.semanticCells(emb, "vec_id", "embedding",
      cent, k = 8)
    val p = planOf(Similarity.semanticPairs(cells, "vec_id", 0.45)
      .select("loser")).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    // the pair candidates come from the trained-cell equi-join — the
    // Σ|cell|² budget; an unkeyed join here is the n² scale-killer
    assert("(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \\[cid#"
      .r.findFirstIn(p).isDefined, p)
    // every nested-loop broadcast is the centroid-assign cross (k rows
    // by definition, BuildRight); the corpus never builds a nested loop
    assert("BroadcastNestedLoopJoin (?!BuildRight, Cross)"
      .r.findFirstIn(p).isEmpty, p)
    assert(!p.contains("BroadcastNestedLoopJoin BuildLeft"), p)
  }

  test("q292/q293 adaptive twins: the pair stage under an occupancy-" +
    "scaled router still rides the cid equi-join, and the gated plans " +
    "stay cartesian-free (the pair joins themselves materialize behind " +
    "the losers snapshot, so they are pinned directly)") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, Sf, "embeddings")
    val k = Similarity.adaptiveNlist(emb.count())
    val cent = Similarity.kmeansTrain(emb, "vec_id", "embedding", k,
      rounds = 2)
    val cells = Similarity.semanticCells(emb, "vec_id", "embedding",
      cent, k)
    val pp = planOf(Similarity.semanticPairs(cells, "vec_id", 0.45)
      .select("loser")).split("== Initial Plan ==").head
    assert(!pp.contains("CartesianProduct"), pp)
    assert("(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \\[cid#"
      .r.findFirstIn(pp).isDefined, pp)
    val p292 = planOf(q("q292_semantic_dedup_delta_adaptive"))
      .split("== Initial Plan ==").head
    assert(!p292.contains("CartesianProduct"), p292)
    assert(!p292.contains("BroadcastNestedLoopJoin BuildLeft"), p292)
    val p293 = planOf(q("q293_semantic_split_audit_adaptive"))
      .split("== Initial Plan ==").head
    assert(!p293.contains("CartesianProduct"), p293)
    assert(!p293.contains("BroadcastNestedLoopJoin BuildLeft"), p293)
  }

  test("q296 packing: the per-row running sum windows WITHIN the md5 " +
    "bucket — the corpus never passes through one window partition " +
    "(the distributed-prefix-sum shape)") {
    val p = planOf(q("q296_pack_sequences"))
    // the row-level cumulative sum must carry the bucket partition key
    assert("Window \\[[^\\]]*\\], \\[bk#".r.findFirstIn(p).isDefined, p)
  }

  test("q294 binary-hamming: candidates come only from the (band, word) " +
    "equi-join — the 1-bit route must never scan corpus pairs") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, Sf, "embeddings")
    val p = planOf(Similarity.binaryHammingKnn(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
        emb, "vec_id", "embedding", k = 5, candidates = 50))
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate source is the multi-probed band equi-join on
    // (band index, word value)
    assert("(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin) \\[b#"
      .r.findFirstIn(p).isDefined, p)
  }

  test("q276 DSIR: the model joins broadcast (constant-sized at any " +
    "corpus); the corpus is never self-joined") {
    import graft.operators.TextOps
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, Sf, "documents")
    val m = TextOps.dsirTrain(docs, col("lang") === "en")
    // the scoring path: the ONLY join is the 256-row local model on
    // the broadcast side; a shuffled or merge join here would mean a
    // corpus-keyed join crept into the per-token scoring
    val ps = planOf(TextOps.dsirScore(docs, m.lr))
      .split("== Initial Plan ==").head
    assert(!ps.contains("CartesianProduct"), ps)
    assert(ps.contains("BroadcastHashJoin"), ps)
    assert(!ps.contains("SortMergeJoin") && !ps.contains("ShuffledHashJoin"),
      ps)
    // the gated frame itself serves from the snapshotted scores — no
    // join of any kind survives on the served plan (the q243 stance)
    val pf = planOf(q("q276_dsir_select")).split("== Initial Plan ==").head
    assert(!pf.contains("Join"), pf)
  }

  test("q283/q284 quality filter: scoring is a join-free narrow map; the " +
    "sweep's only join is the broadcast threshold ladder") {
    // the frozen-weights scoring path (the q284/q285/q286 serve shape):
    // six literal multiplies over the feature projection — any join here
    // would mean the model stopped being driver-embedded literals
    import graft.operators.TextOps
    val docs = Tables.t(spark, Sf, "documents")
    val w = TextOps.trainQualityFilter(docs)
    val ps = planOf(TextOps.scoreQualityFilter(docs, w))
      .split("== Initial Plan ==").head
    assert(!ps.contains("Join"), ps)
    assert(!ps.contains("Exchange hashpartitioning"), ps)
    // the sweep joins the per-doc margin map to the |thresholds|-row
    // ladder — broadcast nested loop over a LocalRelation is the right
    // plan for a 7-row unconditioned expansion; a shuffled join on it
    // would mean the ladder grew a corpus-sized key
    val pw = planOf(q("q283_calibrated_select"))
      .split("== Initial Plan ==").head
    assert(!pw.contains("CartesianProduct"), pw)
    assert(!pw.contains("SortMergeJoin") && !pw.contains("ShuffledHashJoin"),
      pw)
  }

  test("q280: the split report rides the labels-vs-corpus equi-join — " +
    "no cartesian, no corpus-wide window") {
    val p = planOf(q("q280_leakage_safe_split"))
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("q291: batch assignment is md5-keyed — no window, no row_number, " +
    "bucket counts broadcast") {
    val p = planOf(q("q291_batch_padding_waste"))
      .split("== Initial Plan ==").head
    // the whole point of md5 batch keys: a corpus-wide ordering window
    // here would serialize 100 TB through one task
    assert(!p.contains("Window"), p)
    assert(!p.contains("row_number"), p)
    // the per-bucket batch-count table joins broadcast (|buckets| rows)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p)
  }

  test("OSM shape pipeline is narrow - no exchange anywhere") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan")
    dir.toFile.deleteOnExit()
    val f = dir.resolve("w.osm")
    java.nio.file.Files.write(f,
      """<osm><way id="1" user="u" uid="1" version="1" changeset="1"
        |timestamp="2016-01-01T00:00:00Z"><nd ref="2"/><nd ref="3"/></way></osm>
        |""".stripMargin.getBytes("UTF-8"))
    val df = graft.osm.OsmIngest.wayNodes(
      graft.osm.OsmIngest.readWaysRaw(spark, f.toString))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(df.count() === 2)
  }

}
