package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._

/** Connected-components correctness and its dedup-cluster application. */
class GraphSpec extends SparkTestBase {

  import spark.implicits._

  test("connected components on a known graph") {
    // components: {1,2,3,7}, {4,5}, {6 isolated via self-loop}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 7L), (4L, 5L), (6L, 6L))
      .toDF("src", "dst")
    val cc = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L && cc(7L) === 1L)
    assert(cc(4L) === 4L && cc(5L) === 4L)
    assert(cc(6L) === 6L)
  }

  test("connected components on an EMPTY edge list is the empty fixpoint, not an NPE") {
    // round-11 regression pin: a crawl delta with zero near-dup pairs
    // (q228's shape) feeds CC an empty edge list; the convergence check's
    // label sum over the empty frame is NULL and used to NPE
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.connectedComponents(empty).count() === 0)
  }

  test("chain graph converges in O(log diameter) rounds (pointer jumping)") {
    val n = 64
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    // a diameter-63 path MUST converge within 10 rounds — pure neighbor
    // propagation would need ~32; path halving needs ~log2(63)+slack
    val cc = Graph.connectedComponents(edges, maxIter = 10)
    assert(cc.select(countDistinct("component")).head().getLong(0) === 1L)
    assert(cc.count() === n)
  }

  test("iteration storage is bounded: superseded rounds are unpersisted") {
    val n = 40 // path graph => ~n/2 label-propagation rounds
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    val cc = Graph.connectedComponents(edges, maxIter = 60)
    assert(cc.select(countDistinct("component")).head().getLong(0) === 1L)
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL round's snapshot may remain persisted — a leak here
    // grows executor storage O(iterations) on 100 TB dedup-cluster jobs
    assert(after - before <= 1,
      s"persisted RDDs grew from $before to $after — iteration leak")
  }

  test("random graphs: labels equal a reference union-find (seeded)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nV = 300
      val edges = Seq.fill(250)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      // reference: driver-side union-find with path compression
      val parent = Array.tabulate(nV)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component id = minimum member; union-find root is min because
          // unions always attach the larger root under the smaller
          find(v.toInt).toLong
        }).toMap
      val got = Graph.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial mismatch")
    }
  }

  test("giant component (1e5 edges): completes, logarithmic rounds, releasable") {
    // Balanced-binary-tree edges (i, i div 2): one component of 100,001
    // vertices, depth ~17. Near convergence every vertex labels 0, so the
    // pointer-jump join key is ONE hot key by construction — the documented
    // reliance on AQE skew-split, exercised here rather than asserted.
    val edges = spark.range(1, 100001)
      .selectExpr("id AS src", "id DIV 2 AS dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    val res = Graph.connectedComponentsResult(edges, maxIter = 12)
    assert(res.labels.count() === 100001L)
    assert(res.labels.select(countDistinct("component")).head().getLong(0) === 1L)
    assert(res.labels.agg(max("component")).head().getLong(0) === 0L)
    // path halving: a depth-17 tree must converge in O(log diameter)
    // rounds, nowhere near the ~34 of plain neighbor propagation
    assert(res.rounds <= 10, s"took ${res.rounds} rounds")
    // release() drops the final snapshot too: storage returns to baseline
    res.release()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"persisted RDDs grew from $before to $after after release()")
  }

  test("reliable checkpointing: per-round files cleaned, release() drops the last") {
    // the long-job path (checkpoint dir configured -> snapshots survive
    // executor loss): every superseded round's files are deleted during
    // the loop, and release() must delete the final round's too
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    dir.toFile.deleteOnExit()
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir.toString)
    def ckptFiles: Long = {
      val s = java.nio.file.Files.walk(dir)
      try s.filter(p => java.nio.file.Files.isRegularFile(p)).count()
      finally s.close()
    }
    try {
      val edges = (1 until 50).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
      val res = Graph.connectedComponentsResult(edges)
      assert(res.labels.count() === 50)
      assert(res.labels.select(countDistinct("component")).head().getLong(0) === 1L)
      // only the final round's snapshot may still have checkpoint files
      val before = ckptFiles
      assert(before > 0, "expected the final snapshot to be reliably checkpointed")
      res.release()
      assert(ckptFiles === 0, "release() must delete the final checkpoint files")
    } finally {
      // restore the no-checkpoint-dir default for the shared session (the
      // var is private[spark]; the generated setter is the only way back)
      sc.getClass.getMethods.find(_.getName == "checkpointDir_$eq").get
        .invoke(sc, None)
    }
  }

  test("keep-list drop-set upgrades to reliable checkpointing, release() cleans it") {
    // same policy as CC's per-round snapshots: with a checkpoint dir
    // configured, the drop-set snapshot must survive executor loss (files
    // on disk while the keep frame is in use) and release() must delete
    // them — a long-lived session calling keep-lists per-corpus must not
    // accrete checkpoint dirs
    val dir = java.nio.file.Files.createTempDirectory("graft-keeplist-ckpt")
    dir.toFile.deleteOnExit()
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir.toString)
    def ckptFiles: Long = {
      val s = java.nio.file.Files.walk(dir)
      try s.filter(p => java.nio.file.Files.isRegularFile(p)).count()
      finally s.close()
    }
    try {
      val docs = Tables.t(spark, Sf, "documents")
      val res = Dedup.nearDupKeepListResult(docs, "doc_id", "text", 3, 0.8)
      // CC's own round snapshots were already released inside the call;
      // the files still on disk are the drop-set's
      assert(ckptFiles > 0, "expected the drop-set snapshot to be reliably checkpointed")
      val kept = res.keep.count()
      assert(kept > 0 && kept < docs.count())
      res.release()
      assert(ckptFiles === 0, "release() must delete the drop-set checkpoint files")
    } finally {
      sc.getClass.getMethods.find(_.getName == "checkpointDir_$eq").get
        .invoke(sc, None)
    }
  }

  test("near-dup pairs cluster into transitive dedup groups") {
    val docs = Tables.t(spark, Sf, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = Graph.connectedComponents(pairs)
    val sizes = Graph.componentSizes(cc).collect()
    assert(sizes.nonEmpty)
    // planted pairs are pairwise: every cluster has >= 2 docs and the
    // number of clusters matches distinct components
    assert(sizes.forall(_.getAs[Long]("n_vertices") >= 2))
    val totalDocsInClusters = sizes.map(_.getAs[Long]("n_vertices")).sum
    assert(totalDocsInClusters === cc.count())
  }
}
