package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator: one row per DISTINCT word n-gram of a document, each
  * row carrying the document's distinct-shingle count.
  *
  * Replaces the declarative `array_distinct(transform(sequence, slice,
  * concat_ws)) + size + explode` chain, whose interpreted lambda evaluation
  * dominated the Jaccard pipeline (≈5s of an 8s query at bench scale — one
  * expression-tree walk per shingle). Here the whole per-document loop is
  * one eval: split once, build the distinct set, emit rows. Output set is
  * identical (order is irrelevant downstream: everything is join/groupBy/
  * min). Documents with fewer than n tokens emit nothing. */
case class WordShingleRows(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n > 0, "shingle size must be positive")

  override def elementSchema: StructType = StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("ns", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string column, got ${t.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Iterator.empty
    else {
      val toks = s.split(space, -1)
      val count = toks.length - n + 1
      if (count <= 0) Iterator.empty
      else {
        val out = new java.util.ArrayList[UTF8String](count)
        val seen = if (distinct) new java.util.HashSet[UTF8String](count * 2) else null
        var i = 0
        while (i < count) {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks(i + j); j += 1 }
          val sh = UTF8String.concatWs(space, parts: _*)
          if (!distinct || seen.add(sh)) out.add(sh)
          i += 1
        }
        val ns = out.size
        val it = out.iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = InternalRow(it.next(), ns)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleRows =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}
