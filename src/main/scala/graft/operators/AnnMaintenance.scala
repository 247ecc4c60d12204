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

    // canary: frozen-quantizer top-k vs exact gold on the sample
    val apprRows = appended.query(queries, k, candidates, nprobe).collect()
    val gold = Similarity.exactL2Knn(queries, union, idCol, vecCol, k)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = apprRows.count(r => gold.contains((r.getLong(0), r.getLong(1))))
    canaryServeDecided(appended, queries, k, candidates, nprobe,
      apprRows, hits.toLong, gold.size.toLong, minRecallPct, rebuilt,
      releaseRebuilt)
  }

  /** The decision + serve TAIL of the canary loop, over an
    * ALREADY-MEASURED canary (apprRows = `appended`'s served top-k on
    * `queries`, hits/total vs exact gold over the full corpus): the
    * streaming front door's last micro-batch canary measures exactly
    * this (after the drain, the arrived corpus IS base ∪ delta and the
    * resident index is the final appended state), so re-querying and
    * re-golding in the nightly window would recompute identical rows —
    * one full exact-kNN pass and one index query saved per run (guide
    * §1.2: don't compute things you throw away). CONSUMES `appended`
    * (releases it). */
  def canaryServeDecided(appended: IvfAdcIndex, queries: DataFrame,
      k: Int, candidates: Int, nprobe: Int,
      apprRows: Array[org.apache.spark.sql.Row], hits: Long, total: Long,
      minRecallPct: Int, rebuilt: () => IvfAdcIndex,
      releaseRebuilt: Boolean, releaseAppended: Boolean = true): DataFrame = {
    require(minRecallPct >= 0 && minRecallPct <= 100,
      s"minRecallPct=$minRecallPct out of 0..100")
    val spark = queries.sparkSession
    if (releaseAppended) appended.release()
    val retrained = hits * 100L < minRecallPct.toLong * total

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
    val (_, h, t) = canaryHitsRows(idx, corpus, queries, idCol, vecCol,
      k, candidates, nprobe)
    (h, t)
  }

  /** [[canaryHits]] plus the served rows the verdict was measured on —
    * so a caller whose LAST canary already covers the final state (the
    * q217 stream drain) can hand them to [[canaryServeDecided]] instead
    * of re-measuring. */
  def canaryHitsRows(idx: IvfAdcIndex, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      candidates: Int, nprobe: Int):
      (Array[org.apache.spark.sql.Row], Long, Long) = {
    val appr = idx.query(queries, k, candidates, nprobe).collect()
    val gold = Similarity.exactL2Knn(queries, corpus, idCol, vecCol, k)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (appr,
      appr.count(r => gold.contains((r.getLong(0), r.getLong(1)))).toLong,
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
    stageDeltaGroups(delta, stageDir, groups, idCol)
    val baseIdx = IvfAdcIndex.build(base, idCol, vecCol, nlist,
      trainRounds, m, ksub, dim, pqTrainRounds)
    streamMaintainOn(baseIdx, releaseBase = true, base, delta,
      stageDir, groups, queries, idCol, vecCol, k, candidates, nprobe,
      minRecallPct,
      rebuilt = () => IvfAdcIndex.build(
        base.select(col(idCol), col(vecCol))
          .union(delta.select(col(idCol), col(vecCol))),
        idCol, vecCol, nlist, trainRounds, m, ksub, dim, pqTrainRounds),
      releaseRebuilt = true)
  }

  /** Stage the delta as one parquet file per `pmod(id, groups)` group —
    * the arrival fixture [[streamMaintainOn]] drains. Deterministic per
    * (delta, groups), so a bench body may stage once per data dir and
    * re-drain the same files each pass (the q253 stagedDeltaBatches
    * rule). */
  def stageDeltaGroups(delta: DataFrame, stageDir: String, groups: Int,
      idCol: String): Unit =
    (0 until groups).foreach { g =>
      delta.filter(pmod(col(idCol), lit(groups)) === g).coalesce(1)
        .write.mode("overwrite").parquet(s"$stageDir/b$g")
    }

  /** The drain + per-batch canary + nightly decision over a
    * CALLER-SUPPLIED base index and ALREADY-STAGED arrival files — the
    * [[canaryServeWith]] factoring applied to the streaming front door,
    * so the q217 bench body can pass the memoized staging and the
    * buildCached base (timed work = the stream run itself; Verify gates
    * the fresh-build [[streamMaintain]]). `releaseBase = false` when
    * `baseIdx` is a shared cached handle that must outlive this call.
    *
    * The nightly decision reuses the LAST micro-batch's canary verdict:
    * after the drain the arrived corpus IS base ∪ delta (every group's
    * rows have been appended; an all-groups filter selects the whole
    * delta) and `cur` is the final appended state — measuring again
    * would re-run one index query and one exact-kNN gold pass to
    * produce byte-identical inputs to the same integer decision. Only
    * an all-empty delta (no batch carried rows, so no canary ran)
    * falls back to measuring in the nightly window. */
  def streamMaintainOn(baseIdx: IvfAdcIndex, releaseBase: Boolean,
      base: DataFrame, delta: DataFrame, stageDir: String, groups: Int,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      candidates: Int, nprobe: Int, minRecallPct: Int,
      rebuilt: () => IvfAdcIndex,
      releaseRebuilt: Boolean): (DataFrame, Seq[Double]) = {
    require(minRecallPct >= 0 && minRecallPct <= 100,
      s"minRecallPct=$minRecallPct out of 0..100")
    val spark = base.sparkSession
    // foreachBatch runs sequentially on the driver: plain vars are safe
    var cur = baseIdx
    var arrived = List.empty[Long]
    var recalls = List.empty[Double]
    var lastCanary:
      Option[(Array[org.apache.spark.sql.Row], Long, Long)] = None
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
          if (cur ne baseIdx) cur.release()
          else if (releaseBase) cur.release()
          cur = next
          arrived = g :: arrived
          val soFar = base.select(col(idCol), col(vecCol)).union(
            delta.filter(pmod(col(idCol), lit(groups)).isin(arrived: _*))
              .select(col(idCol), col(vecCol)))
          val (rows, h, t) = canaryHitsRows(cur, soFar, queries, idCol,
            vecCol, k, candidates, nprobe)
          lastCanary = Some((rows, h, t))
          recalls = (h.toDouble / t) :: recalls
        }
      }
    val served = lastCanary match {
      case Some((rows, h, t)) =>
        // the final state's canary is the last batch's (arrived corpus
        // ≡ base ∪ delta, same index handle, same query sample); `cur`
        // is always a post-append handle here, never the caller's base
        canaryServeDecided(cur, queries, k, candidates, nprobe, rows,
          h, t, minRecallPct, rebuilt, releaseRebuilt)
      case None =>
        // nothing arrived: measure in the nightly window. `cur` is
        // still the CALLER's base index — release only if asked to.
        val union = base.select(col(idCol), col(vecCol))
          .union(delta.select(col(idCol), col(vecCol)))
        val (rows, h, t) = canaryHitsRows(cur, union, queries, idCol,
          vecCol, k, candidates, nprobe)
        canaryServeDecided(cur, queries, k, candidates, nprobe, rows,
          h, t, minRecallPct, rebuilt, releaseRebuilt,
          releaseAppended = releaseBase)
    }
    (served, recalls.reverse)
  }
}
