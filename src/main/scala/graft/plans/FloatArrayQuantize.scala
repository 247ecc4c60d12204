package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd quantization of an `array<float>` to `array<bigint>`:
  * `floor(double(x) * scale)` per element — semantically identical to the
  * declarative `transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS
  * BIGINT))`, but a tight loop instead of an interpreted lambda per element.
  * Runs once per vector on the similarity path, which at corpus scale is
  * once per row of a 10⁸+-row table. Null elements unsupported (embedding
  * arrays never contain them). */
case class FloatArrayQuantize(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize requires array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      s"""
         |int $n = $a.numElements();
         |long[] $vals = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $vals[$i] = (long) Math.floor(((double) $a.getFloat($i)) * $scale.0);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatArrayQuantize =
    copy(child = newChild)

  override def prettyName: String = "graft_quantize"
}
