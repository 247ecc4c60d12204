package graft

import graft.operators.ReleaseOps
import org.apache.spark.sql.functions._

/** Gates for the q253 streaming delta-release front door: the drained
  * final state must be ARRIVAL-ORDER-INDEPENDENT and identical to the
  * batch [[ReleaseOps.prepareDelta]] report — the claim rests on every
  * per-batch stage being a per-doc predicate against static shipped
  * assets, and this spec is where that claim meets two genuinely
  * different arrival schedules (different batch boundaries AND reversed
  * order), not just the q253 gate's one staging. */
class ReleaseStreamSpec extends SparkTestBase {

  private lazy val docs = Tables.t(spark, Sf, "documents")
  private lazy val idx = substring(col("source"), 4, 8).cast("int")
  private lazy val oldDocs = docs.filter(idx < 10)
  private lazy val newDocs = docs.filter(idx >= 10)

  private def stage(splits: Seq[(Int, Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-relstream")
    dir.toFile.deleteOnExit()
    splits.zipWithIndex.foreach { case ((lo, hi), i) =>
      docs.filter(idx >= lo && idx < hi)
        .coalesce(1).write.parquet(s"$dir/b$i")
    }
    dir.toString
  }

  private def report(glob: String): Seq[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    val (_, card, release) = ReleaseOps.streamedDeltaState(spark, oldDocs,
      docs.schema, glob)
    try card.orderBy("source").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    finally release()
  }

  test("streamed final state ≡ batch prepareDelta under two different " +
    "arrival schedules") {
    val batch = ReleaseOps.prepareDelta(oldDocs, newDocs)
      .orderBy("source").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(batch.nonEmpty)
    // schedule A: three uneven batches in source order
    val a = report(s"${stage(Seq((10, 13), (13, 17), (17, 20)))}/b*")
    assert(a === batch, "schedule A diverged from the batch pipeline")
    // schedule B: four batches, REVERSED source order — if any per-batch
    // stage secretly depended on cross-batch state, the within-delta
    // exact-dedup keeper (min doc_id per fingerprint) or the carry-over
    // set would differ here
    val b = report(s"${stage(Seq((18, 20), (15, 18), (12, 15), (10, 12)))}/b*")
    assert(b === batch, "schedule B diverged from the batch pipeline")
  }

  test("idempotent ingest: a REPLAYED batch (at-least-once delivery) " +
    "changes nothing — duplicated arrival files yield the batch state") {
    import graft.operators.ReleaseOps
    val dir = java.nio.file.Files.createTempDirectory("graft-relstream-dup")
    dir.toFile.deleteOnExit()
    // stage schedule A's three batches, then REPLAY the middle one as a
    // fourth arrival file (same rows, new path — exactly what a
    // redelivered micro-batch looks like to a file stream)
    Seq((10, 13), (13, 17), (17, 20), (13, 17)).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        docs.filter(idx >= lo && idx < hi)
          .coalesce(1).write.parquet(s"$dir/b$i")
    }
    val (_, card, release) = ReleaseOps.streamedDeltaState(spark, oldDocs,
      docs.schema, s"$dir/b*")
    val streamed = card.orderBy("source").collect().toSeq
    release()
    val batch = ReleaseOps.prepareDelta(oldDocs, newDocs)
      .orderBy("source").collect().toSeq
    assert(streamed === batch,
      "a replayed batch leaked duplicate docs or double-counted n_input")
  }

  test("robust streaming front door: every arrival Bloom-hits the " +
    "shipped corpus at its own micro-batch and the final state is the " +
    "empty release, matching batch prepareDelta(robust)") {
    import graft.operators.ReleaseOps
    val (old, neu) = ReleaseOps.shippedTwinFixture(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-relstream-rb")
    dir.toFile.deleteOnExit()
    val sidx = substring(col("source"), 4, 8).cast("int")
    Seq((0, 5), (5, 10)).zipWithIndex.foreach { case ((lo, hi), i) =>
      neu.filter(sidx >= lo && sidx < hi)
        .coalesce(1).write.parquet(s"$dir/b$i")
    }
    val (kept, card, release) = ReleaseOps.streamedDeltaState(spark, old,
      neu.schema, s"$dir/b*", robust = true)
    val batch = ReleaseOps.prepareDelta(old, neu, robust = true)
      .orderBy("source").collect().toSeq
    assert(card.orderBy("source").collect().toSeq === batch)
    assert(kept.count() === 0L,
      "robust carry-over must drop every re-crawled doc")
    // the carry-over stage (not quality) did the dropping: per source,
    // quality survivors exist but none survive the vs-old stage
    val r = card.agg(sum("n_quality"), sum("n_vs_old")).head
    assert(r.getLong(0) > 0L && r.getLong(1) === 0L)
    release()
  }
}
