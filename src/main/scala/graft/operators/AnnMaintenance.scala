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
    require(minRecallPct >= 0 && minRecallPct <= 100,
      s"minRecallPct=$minRecallPct out of 0..100")
    val spark = base.sparkSession
    val union = base.select(col(idCol), col(vecCol))
      .union(delta.select(col(idCol), col(vecCol)))

    // nightly maintenance: train on base, freeze, append the delta
    val baseIdx = IvfAdcIndex.build(base, idCol, vecCol, nlist,
      trainRounds, m, ksub, dim, pqTrainRounds)
    val appended = baseIdx.append(delta)
    baseIdx.release()

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
        val rebuilt = IvfAdcIndex.build(union, idCol, vecCol, nlist,
          trainRounds, m, ksub, dim, pqTrainRounds)
        val out = rebuilt.query(queries, k, candidates, nprobe).collect()
        rebuilt.release()
        out
      }

    import spark.implicits._
    val meanRecall = hits.toDouble / total
    servedRows.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        meanRecall, retrained))
      .toDF("qid", "nid", "d2", "rank", "mean_recall", "retrained")
  }
}
