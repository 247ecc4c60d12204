package graft

import org.apache.spark.sql.functions._
import graft.operators.ReleaseOps

/** The round-10 advice item 1 demonstration, pinned: on the planted
  * multilingual fixture (each doc paired with a U+3000/NBSP/NFC-decomposed
  * separator twin), the RAW release pipeline admits the twin through its
  * quality funnel and then keeps it — neither exact dedup (byte-distinct
  * fingerprints) nor LSH near-dup (raw 3-shingle Jaccard pushed below the
  * 0.8 threshold by the stopword-glue construction) removes it — while the
  * ROBUST pipeline (NFC + word-char-run canonicalization before stage 1)
  * collapses every pair at exact dedup. q225 hash-gates the robust report;
  * this spec gates the GAP the robust variant exists to close. */
class ReleaseRobustSpec extends SparkTestBase {

  private def stageSums(robust: Boolean): (Long, Long, Long) = {
    val docs = Tables.t(spark, Sf, "documents")
    val r = ReleaseOps.prepareCorpus(ReleaseOps.multilingualFixture(docs),
        robust = robust)
      .agg(sum("n_quality").cast("long"), sum("n_exact").cast("long"),
        sum("n_neardup").cast("long"))
      .head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("robust release collapses every separator twin at exact dedup") {
    val (q, e, _) = stageSums(robust = true)
    // canonical text is identical for v1 and its twin, so the funnel admits
    // them in pairs and exact dedup keeps exactly one of each
    assert(q > 0, "degenerate fixture: quality funnel admitted nothing")
    assert(e * 2 === q, s"expected n_exact == n_quality/2, got q=$q e=$e")
  }

  private def deltaSums(robust: Boolean): (Long, Long, Long) = {
    val (old, neu) =
      ReleaseOps.shippedTwinFixture(Tables.t(spark, Sf, "documents"))
    val r = ReleaseOps.prepareDelta(old, neu, robust = robust)
      .agg(sum("n_exact").cast("long"), sum("n_vs_old").cast("long"),
        sum("n_final").cast("long"))
      .head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("robust incremental release drops every shipped doc at carry-over") {
    val (e, vsOld, fin) = deltaSums(robust = true)
    assert(e > 0, "degenerate fixture: quality funnel admitted nothing")
    // the canonical window hashes of each clean re-crawled doc are exactly
    // its shipped original's, so the Bloom-routed carry-over drops ALL
    assert(vsOld === 0L, s"robust carry-over leaked $vsOld docs")
    assert(fin === 0L, s"robust delta shipped $fin already-shipped docs")
  }

  test("raw incremental release re-ships the content the robust delta drops") {
    val (e, vsOld, fin) = deltaSums(robust = false)
    // raw window hashes are byte-level: every shipped window contains a
    // U+3000 separator, no clean-ASCII window matches, and the re-crawled
    // content rides the whole delta pipeline back into the release
    assert(vsOld === e, s"raw carry-over unexpectedly caught docs: $vsOld < $e")
    assert(fin > 0L, "raw delta shipped nothing — fixture degenerate")
  }

  test("raw release keeps the separator twins the robust release drops") {
    val (qRaw, eRaw, nRaw) = stageSums(robust = false)
    val (_, eRob, nRob) = stageSums(robust = true)
    // raw fingerprints are byte-distinct: exact dedup keeps the twins
    // (only the corpus's own planted exact dups collapse)
    assert(eRaw > qRaw / 2, s"raw exact dedup collapsed twins: q=$qRaw e=$eRaw")
    assert(eRaw > eRob, s"raw should keep more docs than robust: $eRaw vs $eRob")
    // and the near-dup stage does not catch them either — the glued
    // shingles push raw Jaccard below the 0.8 verify threshold, so the
    // twins are still there after LSH
    assert(nRaw > nRob, s"raw near-dup unexpectedly removed the twins: $nRaw vs $nRob")
  }
}
