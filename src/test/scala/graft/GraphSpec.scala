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
