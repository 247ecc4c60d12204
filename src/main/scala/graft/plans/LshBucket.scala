package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd random-hyperplane LSH bucket over a quantized `array<bigint>`
  * vector: `planes` sign bits packed into one BIGINT. Hyperplane weight for
  * (plane p, dim d) is the deterministic integer pseudo-sequence
  * `(p*73856093 + d*19349663) % 2001 - 1000` — all-integer math, so bucket
  * assignment is bit-reproducible in any engine (see
  * VectorFunctions.lshBucketExpr, whose declarative nested-aggregate form
  * this replaces on the hot path).
  *
  * Bucketing runs once per vector but sits under EVERY ANN/near-dup
  * pipeline; at 10⁹ vectors the interpreted higher-order form costs
  * planes×dim lambda evaluations per row, this is a planes×dim
  * multiply-add loop inside whole-stage codegen. Null elements unsupported
  * (quantized vectors never contain them); a null array yields null. */
case class LshBucket(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {

  // 1L << p wraps at 64 (Java shift is mod 64): planes beyond 63 would
  // silently fold high planes onto low bits, colliding buckets instead of
  // erroring. 63 keeps the packed bucket non-negative-or-not irrelevant but
  // distinct per plane.
  require(planes > 0 && planes <= 63,
    s"planes=$planes must be in 1..63 (bucket bits pack into one BIGINT)")
  require(dim > 0, s"dim=$dim must be positive")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket requires array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    // shorter-than-dim arrays: the subscripting HOF reference errors under
    // ANSI; this expression is total instead — bucket 0, the value the
    // null-tolerant get() formulation null-poisons to
    if (q.numElements() < dim) return 0L
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0L
      var d = 0
      while (d < dim) {
        acc += q.getLong(d) * ((p.toLong * 73856093L + d.toLong * 19349663L) % 2001L - 1000L)
        d += 1
      }
      if (acc >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |if ($q.numElements() >= $dim) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    long $acc = 0L;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $q.getLong($d) *
         |        (((long) $p * 73856093L + (long) $d * 19349663L) % 2001L - 1000L);
         |    }
         |    if ($acc >= 0) $bucket |= 1L << $p;
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_bucket"
}
