package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The declarative form (`aggregate(zip_with(a, b, *), 0, +)`) allocates an
  * intermediate array and runs interpreted lambda calls per element; on the
  * all-pairs similarity path (SURVEY.md §7.4) that is the hot loop — n²·dim
  * evaluations. This expression compiles to a tight Java loop inside
  * whole-stage codegen (SURVEY.md §7.3 preference order: custom Catalyst
  * Expression before UDF). Semantics are identical to the declarative form
  * on null-free arrays: exact Long math, so results stay bit-reproducible
  * across engines (see VectorFunctions).
  *
  * Null elements inside the arrays are not supported (quantized vectors
  * never contain them); a null array input yields null, and so does a
  * length mismatch — matching the declarative form, where zip_with
  * null-pads the shorter array and the null poisons the whole fold.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // null on length mismatch, even for non-nullable inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<bigint>, array<bigint>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0L
      var i = 0
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
