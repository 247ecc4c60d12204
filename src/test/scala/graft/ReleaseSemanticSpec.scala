package graft

import org.apache.spark.sql.functions._
import graft.operators.{ReleaseOps, Similarity}

/** q275's semantic release stage, pinned at the seams the hash gate
  * can't see in isolation:
  *  - the stage is an ANTI-join against rule-(b) losers, so a doc
  *    WITHOUT an embedding must survive it (an inner join with the
  *    keep-list — the tempting refactor — zeroes every source the
  *    moment the embedding table is incomplete);
  *  - [[Similarity.semanticDropList]] is exactly the complement of the
  *    gated keep frame (same training, same routing, same pair rule —
  *    only the projection differs), so the release stage inherits the
  *    q267 family's verified drop rule rather than re-deriving it;
  *  - at the release threshold the stage actually DROPS on the fixture
  *    (a gate over a provably-no-op stage pins nothing — the reason
  *    the stage threshold is 0.32, the measured knee, not the serving
  *    default 0.45 that verifies zero pairs among release survivors).
  */
class ReleaseSemanticSpec extends SparkTestBase {

  test("docs without an embedding survive the semantic stage") {
    val docs = Tables.t(spark, Sf, "documents")
    val emptyEmb = Tables.t(spark, Sf, "embeddings").limit(0)
    val card = ReleaseOps.prepareCorpusSemantic(docs, emptyEmb)
      .select("source", "n_neardup", "n_semantic").collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"source ${r.getString(0)}: empty embeddings must make the " +
          s"semantic stage a no-op, got n_neardup=${r.getLong(1)} " +
          s"n_semantic=${r.getLong(2)}")
    }
  }

  test("semanticDropList is the exact complement of the gated keep frame") {
    val emb = Tables.t(spark, Sf, "embeddings")
    val drop = Similarity.semanticDropList(emb, "vec_id", "embedding",
        minCosine = 0.45, k = 8)
      .collect().map(_.getLong(0)).toSet
    val keep = Similarity.semanticDedupKeepList(emb, "vec_id", "embedding",
        minCosine = 0.45, k = 8)
      .collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(drop.intersect(keep).isEmpty, "a loser appeared in the keep set")
    assert(drop.union(keep) === all,
      "drop ∪ keep must partition the corpus")
  }

  test("the semantic stage drops at the release threshold and flows to the card") {
    val docs = Tables.t(spark, Sf, "documents")
    val emb = Tables.t(spark, Sf, "embeddings")
    val card = ReleaseOps.prepareCorpusSemantic(docs, emb)
    val r = card.agg(sum("n_neardup").cast("long"),
      sum("n_semantic").cast("long")).head
    val (nd, ns) = (r.getLong(0), r.getLong(1))
    assert(ns < nd, s"expected the stage to drop on the fixture, " +
      s"got n_neardup=$nd n_semantic=$ns")
    assert(ns > 0, "the stage must not drop everything")
    // the semantic card is the raw card plus ONE column — no other
    // stage's accounting may move upstream of the spliced stage
    val raw = ReleaseOps.prepareCorpus(docs)
    assert(card.columns.toSeq.filterNot(_ == "n_semantic") ===
      raw.columns.toSeq)
    val up = card.select("source", "n_input", "n_quality", "n_exact",
      "n_neardup").orderBy("source").collect().toSeq
    val upRaw = raw.select("source", "n_input", "n_quality", "n_exact",
      "n_neardup").orderBy("source").collect().toSeq
    assert(up === upRaw,
      "stages upstream of the semantic splice must be untouched")
  }
}
