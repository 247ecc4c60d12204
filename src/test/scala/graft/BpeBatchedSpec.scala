package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions.lit

/** Batched-BPE scale gates (round-5 verdict item 3): the sequential
  * trainer launches one pair-count Spark job per merge — fine at the
  * 10-round gate, catastrophic at a real tokenizer's 30k merges. The
  * batched trainer must (a) cut jobs-per-merge by an order of magnitude
  * and (b) agree with sequential training whenever its batches don't
  * conflict.
  */
class BpeBatchedSpec extends SparkTestBase {

  private def docs = Tables.t(spark, Sf, "documents")

  private def jobsIn(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try body finally sc.clearJobGroup()
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  test("batched training cuts Spark jobs per merge ≥10× vs sequential") {
    // per-pass job cost is ~identical for the two trainers (one pair-count
    // aggregation + top-k collect each, measured ~2.5 jobs/pass with AQE),
    // so the reduction is driven by merges-kept-per-pass: under the
    // adjacency-conflict rule 6 passes at batchSize 16 keep ~88 merges on
    // this corpus (full 16/pass until the top-pair supply thins)
    val seqRounds = 8
    val seqJobs = jobsIn("bpe-seq") {
      Bpe.merges(docs, "text", rounds = seqRounds).collect()
    }
    var batchedMerges = 0L
    val batJobs = jobsIn("bpe-batched") {
      batchedMerges = Bpe.mergesBatched(docs, "text",
        passes = 6, batchSize = 16).count()
    }
    assert(batchedMerges > 0)
    // jobs spent per merge learned, each trainer on its own merge count
    // (conflicts can keep batches under batchSize, so normalize)
    val seqPerMerge = seqJobs.toDouble / seqRounds
    val batPerMerge = batJobs.toDouble / batchedMerges
    val reduction = seqPerMerge / batPerMerge
    info(f"sequential: $seqJobs jobs / $seqRounds merges = $seqPerMerge%.2f; " +
      f"batched: $batJobs jobs / $batchedMerges merges = $batPerMerge%.2f; " +
      f"reduction ${reduction}%.1f×")
    assert(reduction >= 10.0,
      f"jobs-per-merge reduction $reduction%.1f× < 10× " +
        s"(seq $seqJobs jobs/$seqRounds, batched $batJobs jobs/$batchedMerges)")
  }

  test("a conflict-free batch equals the same number of sequential merges") {
    // batchSize=1 is sequential BPE by construction — same selection
    // (top-1 is always kept: nothing outranks it) and same application.
    // This pins the batched code path's selection+apply machinery to the
    // sequential trainer's semantics where they must coincide.
    val seq = Bpe.merges(docs, "text", rounds = 6).orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val bat = Bpe.mergesBatched(docs, "text", passes = 6, batchSize = 1)
      .orderBy("batch").collect()
      .map(r => (r.getString(2), r.getString(3), r.getLong(4)))
    assert(bat.toSeq === seq.toSeq)
  }

  test("empty corpus: both trainers dry-stop with an empty merge list " +
    "and leak no cached frames") {
    // the first round's pair count finds nothing → dry-stop on round 1;
    // the result must be a well-formed empty frame and every per-round
    // persist (including the word-type table) must be released
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val empty = docs.filter(lit(false))
    val seq = Bpe.merges(empty, "text", rounds = 4)
    assert(seq.count() === 0)
    assert(seq.columns.toSeq === Seq("round", "lft", "rgt", "pair_freq"))
    val bat = Bpe.mergesBatched(empty, "text", passes = 4, batchSize = 4)
    assert(bat.count() === 0)
    assert(bat.columns.toSeq === Seq("batch", "j", "lft", "rgt", "pair_freq"))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"dry-round training leaked cached RDDs: $leaked")
  }

  test("merge-artifact round-trip: save→load preserves the list exactly " +
    "and the loaded artifact encodes identically to direct training") {
    val ms = Bpe.trainedMerges(docs, "text", rounds = 10, cacheKey = Sf)
    assert(ms.nonEmpty)
    val path = TempDirs.create("graft-bpe-spec").resolve("merges.txt").toString
    Bpe.saveMerges(ms, path)
    assert(Bpe.loadMerges(path) === ms)
    // overwrite-idempotent (the q191 body re-saves per invocation)
    Bpe.saveMerges(ms, path)
    assert(Bpe.loadMerges(path) === ms)
    val direct = Bpe.encoded(docs, "text", rounds = 10)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSet
    val viaArtifact = Bpe.encodedWith(docs, "text", Bpe.loadMerges(path))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSet
    assert(viaArtifact === direct)
    // a foreign/unversioned file must be refused, not mis-applied
    val bad = TempDirs.create("graft-bpe-bad").resolve("x.txt")
    java.nio.file.Files.writeString(bad, "a\tb\n")
    assertThrows[IllegalArgumentException](Bpe.loadMerges(bad.toString))
    // empty merge list round-trips (a 0-merge tokenizer is identity)
    val empty = TempDirs.create("graft-bpe-empty").resolve("m.txt").toString
    Bpe.saveMerges(Seq.empty, empty)
    assert(Bpe.loadMerges(empty).isEmpty)
  }

  test("decode round-trip: every encoded type reconstructs its word and " +
    "frequency (n_types = n_roundtrip > 0)") {
    val row = Bpe.decodeRoundTrip(docs, "text", rounds = 10).collect().head
    val (n, ok) = (row.getLong(0), row.getLong(1))
    assert(n > 0)
    assert(n === ok, s"$ok of $n types failed the decode round-trip")
  }
}
