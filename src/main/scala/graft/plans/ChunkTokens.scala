package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator: stream fixed-size token chunks of a document
  * as (chunk_idx, chunk_text) rows.
  *
  * The composed form (ChunkingOps.chunks: sequence → slice → posexplode)
  * materializes the full chunk array per row before the Generate; for
  * million-token documents that is chunk_count × chunk_size duplicated
  * bytes held at once. This Generator yields rows lazily from a single
  * token split — O(chunk) live memory regardless of document size — which
  * is the (b)-level of SURVEY.md §7.3's ladder applied where composition's
  * semantics are right but its memory shape is not.
  *
  * Generators are eval-mode (CodegenFallback); the surrounding projections
  * stay codegen'd.
  */
case class ChunkTokens(child: Expression, chunk: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(chunk > 0 && stride > 0, "chunk and stride must be positive")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_chunk requires a string column, got ${t.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Iterator.empty
    else {
      val toks = s.split(space, -1)
      val n = toks.length
      Iterator.range(0, n, stride).zipWithIndex.map { case (st, idx) =>
        val end = math.min(st + chunk, n)
        val text = UTF8String.concatWs(space, toks.slice(st, end).toIndexedSeq: _*)
        InternalRow(idx, text)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
    copy(child = newChild)

  override def prettyName: String = "graft_chunk"
}
