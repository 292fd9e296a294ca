package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `round(x, nearest)` with the reference's exact algorithm
  * (pipe_math.go round(): shift by half-nearest, drop the modulo, then
  * truncate at nearest's own decimal exponent so 7.389→"7.39" instead of
  * 7.390000000000001 — the final truncation is what kills the float
  * residue). NaN/Inf propagate through the same operations as Go. */
case class GoRoundExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_go_round needs two doubles")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    GoRound.round(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GoRound.round($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GoRoundExpr =
    copy(left = l, right = r)

  override def prettyName: String = "graft_go_round"
}

object GoRound {

  /** decimal exponent of `nearest`'s shortest decimal form
    * (decimal.FromFloat): "0.01" -> -2, "100" -> 2, "1.5" -> -1. */
  private def decimalExp(nearest: Double): Int = {
    val s0 = GoFloat.format(math.abs(nearest))
    val dot = s0.indexOf('.')
    if (dot >= 0) -(s0.length - dot - 1)
    else {
      var z = 0
      var i = s0.length - 1
      while (i > 0 && s0.charAt(i) == '0') { z += 1; i -= 1 }
      z
    }
  }

  def round(f0: Double, nearest: Double): Double = {
    if (java.lang.Double.isNaN(f0) || java.lang.Double.isNaN(nearest)) return Double.NaN
    val p10 = math.pow(10, -decimalExp(nearest))
    var f = f0
    f += 0.5 * math.copySign(nearest, f)
    f -= f % nearest // Java % on doubles == C fmod == Go math.Mod
    f = f * p10
    f = if (f < 0) math.ceil(f) else math.floor(f) // math.Modf integer part
    f / p10
  }

  def roundCol(a: Column, b: Column): Column = {
    GraftFunctions.ensure()
    call_function("graft_go_round", a, b)
  }
}
