package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: squared L2 norm (Σxᵢ²) of a float array,
  * accumulated in double with full codegen. Exists as the target of the
  * [[graft.plans.RewriteSelfDot]] optimizer rule — `graft_dot(x, x)`
  * touches the array buffer twice per element; this loop reads each
  * element once and squares it, with the SAME sequential accumulation
  * (x.getFloat(i)² == x.getFloat(i)·x.getFloat(i) bit-for-bit in IEEE
  * double), so the rewrite is result-identical. Also registered directly
  * as `graft_norm2` for explicit use. */
case class Norm2Float(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_norm2 expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
        |final int $n = $x.numElements();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $v = (double) $x.getFloat($i);
        |  $acc += $v * $v;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(newChild)
}
