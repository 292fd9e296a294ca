package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product: a tight
  * codegen'd loop instead of an interpreted `aggregate(zip_with(...))`
  * higher-order chain — the hot inner operation of every similarity /
  * near-dup scan (ops/Similarity, ops/Dedup), executed per candidate pair
  * at 100 TB scale. Accepts float or double element arrays on either side.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression) =
        if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  @volatile private var registered = Set.empty[SparkSession]

  /** Column API: registers the expression builder once per session and
    * calls it by name (the stable route to a custom Expression without
    * relying on private Column internals). */
  def dot(a: Column, b: Column): Column = {
    val spark = SparkSession.active
    if (!registered.contains(spark)) synchronized {
      if (!registered.contains(spark)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
        registered += spark
      }
    }
    call_function("graft_dot", a, b)
  }
}
