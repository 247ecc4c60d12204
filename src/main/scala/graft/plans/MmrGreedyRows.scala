package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Generator: the k greedy MMR picks over ONE query's candidate
  * set — input is the collected `array<struct<nid, d2, nsq, q>>` of a
  * single query's candidates, output is one row per pick `(nid, step)`.
  *
  * The declarative formulation (Similarity.mmrGreedySteps before round
  * 17) ran the greedy loop as k SEQUENTIAL Spark jobs — per step an
  * anti-join, a pairwise-min aggregation over a persisted candidates²
  * frame, a per-query window argmax, and a lineage-truncating snapshot
  * barrier. Correct, but each step is a full job of fixed scheduling
  * cost, and the λ sweep pays 3k of them. The candidate set is
  * query-side-bounded by construction (`candidates` ≤ a few hundred,
  * never corpus-sized), so the whole loop fits one narrow eval per
  * query: the only shuffle left in an MMR query is the per-query
  * candidate aggregation itself, and no step barrier exists at any
  * scale.
  *
  * Arithmetic is the exact integer contract the oracles unroll:
  * pairwise d2(a,b) = nsq_a + nsq_b − 2·dot(q_a, q_b) over the
  * quantized vectors (LongArrayDot's exact Long math), step 1 = min
  * (d2, nid), step t = argmax wDiv·(min pairwise d2 to selected) −
  * wRel·d2, ties to the smaller nid. Weights (1,0)/(1,1)/(0,1) are the
  * sweep's λ = 0 / ½ / 1 legs. Fewer candidates than k emits fewer
  * steps (matching the declarative form's empty later picks). */
case class MmrGreedyRows(child: Expression, k: Int, wRel: Long, wDiv: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"k=$k must be >= 1")
  require(wRel >= 0 && wDiv >= 0 && wRel + wDiv > 0,
    s"weights ($wRel, $wDiv) must be non-negative and not both zero")

  override def elementSchema: StructType = StructType(Seq(
    StructField("nid", LongType, nullable = false),
    StructField("step", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _), StructField(_, LongType, _, _),
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(LongType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "graft_mmr_greedy requires array<struct<nid:bigint, d2:bigint, " +
        s"nsq:bigint, q:array<bigint>>>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return Iterator.empty
    val n = arr.numElements()
    val nid = new Array[Long](n)
    val d2 = new Array[Long](n)
    val nsq = new Array[Long](n)
    val q = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 4)
      nid(i) = r.getLong(0); d2(i) = r.getLong(1); nsq(i) = r.getLong(2)
      q(i) = r.getArray(3)
      i += 1
    }
    def pd2(a: Int, b: Int): Long = {
      val xa = q(a); val xb = q(b)
      val d = xa.numElements()
      var s = 0L; var j = 0
      while (j < d) { s += xa.getLong(j) * xb.getLong(j); j += 1 }
      nsq(a) + nsq(b) - 2L * s
    }
    val picked = new Array[Boolean](n)
    val out = new Array[Long](math.min(k, n))
    // step 1: the most relevant candidate — min (d2, nid)
    var best = 0
    i = 1
    while (i < n) {
      if (d2(i) < d2(best) || (d2(i) == d2(best) && nid(i) < nid(best)))
        best = i
      i += 1
    }
    picked(best) = true; out(0) = nid(best)
    // msd(c) = min pairwise d2 from c to any selected, maintained
    // incrementally as picks land
    val msd = new Array[Long](n)
    i = 0
    while (i < n) {
      msd(i) = if (i == best) Long.MaxValue else pd2(i, best)
      i += 1
    }
    var t = 1
    while (t < k && t < n) {
      var sel = -1
      i = 0
      while (i < n) {
        if (!picked(i)) {
          if (sel < 0) sel = i
          else {
            val si = wDiv * msd(i) - wRel * d2(i)
            val ss = wDiv * msd(sel) - wRel * d2(sel)
            if (si > ss || (si == ss && nid(i) < nid(sel))) sel = i
          }
        }
        i += 1
      }
      picked(sel) = true; out(t) = nid(sel)
      i = 0
      while (i < n) {
        if (!picked(i)) {
          val d = pd2(i, sel)
          if (d < msd(i)) msd(i) = d
        }
        i += 1
      }
      t += 1
    }
    val m = t
    new Iterator[InternalRow] {
      private var p = 0
      override def hasNext: Boolean = p < m
      override def next(): InternalRow = {
        val r = InternalRow(out(p), p + 1); p += 1; r
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): MmrGreedyRows = copy(child = newChild)

  override def prettyName: String = "graft_mmr_greedy"
}
