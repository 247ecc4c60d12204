package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator: the DISTINCT winnowing fingerprints of a document —
  * hash every char k-gram (md5 32-bit prefix, the cross-engine hash
  * contract), take the minimum of each w-wide window of consecutive gram
  * hashes, dedupe. One row per distinct fingerprint.
  *
  * The declarative formulation (transform+posexplode grams, window-min
  * partitioned by doc, distinct) shuffles ONE ROW PER CHARACTER through a
  * per-document sort — ~n gram rows exchanged and sorted to select ~n/w
  * fingerprints. Here the whole per-document pipeline is one narrow eval:
  * the only shuffle left in a winnowing query is the per-doc aggregation
  * of the (few) fingerprints themselves. Semantics are pinned by the q93
  * oracle, which replays the declarative form in DuckDB.
  *
  * Documents with fewer than k+w-1 characters have no complete window and
  * emit nothing (matching the declarative form's empty window range). */
case class WinnowRows(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k > 0 && w > 0, "k-gram size and window width must be positive")

  override def elementSchema: StructType = StructType(Seq(
    StructField("fp", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a string column, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) return Iterator.empty
    val len = s.numChars()
    val nGrams = len - k + 1
    if (nGrams < w) return Iterator.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    // gram hashes: md5 of the codepoint slice's UTF-8 bytes, first 4 bytes
    // as an unsigned 32-bit value — identical to
    // CAST(conv(substr(md5(substring(text,i,k)),1,8),16,10) AS BIGINT)
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val d = md.digest(s.substring(i, i + k).getBytes)
      h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var p = 0
    val lastStart = nGrams - w
    while (p <= lastStart) {
      var min = h(p)
      var j = 1
      while (j < w) { if (h(p + j) < min) min = h(p + j); j += 1 }
      seen.add(min)
      p += 1
    }
    val it = seen.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow = InternalRow(it.next().longValue())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowRows =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}
