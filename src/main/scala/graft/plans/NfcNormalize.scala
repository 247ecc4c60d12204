package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization of a string column.
  *
  * Real corpora mix composed and decomposed encodings of the same text
  * (é as U+00E9 vs e + U+0301) — every fingerprint/dedup/shingle operator
  * sees them as DIFFERENT strings unless the pipeline normalizes first,
  * which is why tokenizer pipelines (HF normalizers, SentencePiece) put
  * NFC/NFKC at the very front. Spark ships no normalization function, so
  * this is the §7.3 preference-order answer: a custom Catalyst Expression
  * (codegen'd, streaming-safe, no UDF) calling the JDK's Normalizer.
  *
  * The q221 gate pins JDK-NFC ≡ DuckDB(utf8proc)-NFC on planted
  * decomposed text — safe to rely on cross-engine because canonical
  * composition is covered by Unicode's normalization stability policy.
  * Fast path: already-normalized input (all-ASCII in particular) returns
  * the ORIGINAL UTF8String — zero allocation on the common case. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  /** Static entry the generated code calls (Scala emits a static
    * forwarder on the companion class). */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}
