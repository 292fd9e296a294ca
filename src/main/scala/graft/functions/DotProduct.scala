package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product: a tight
  * codegen'd loop instead of an interpreted `aggregate(zip_with(...))`
  * higher-order chain — the hot inner operation of every similarity /
  * near-dup scan (ops/Similarity, ops/Dedup), executed per candidate pair
  * at 100 TB scale. Accepts float or double element arrays on either side.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<float|double|tinyint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    def at(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case _ => arr.getDouble(i)
    }
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += at(x, lt, i) * at(y, rt, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression) = elemType(e) match {
        case Some(FloatType) => s"(double) $arr.getFloat($i)"
        case Some(ByteType) => s"(double) $arr.getByte($i)"
        case _ => s"$arr.getDouble($i)"
      }
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

/** Fused single-pass cosine similarity: one loop accumulates the dot
  * product and both squared norms (three separate array passes otherwise —
  * per candidate pair, the dominant ANN cost at scale). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    DotProduct(left, right).checkInputDataTypes()

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    def at(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case _ => arr.getDouble(i)
    }
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = at(x, lt, i)
      val yv = at(y, rt, i)
      s += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    s / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      def get(arr: String, e: Expression) = elemType(e) match {
        case Some(FloatType) => s"(double) $arr.getFloat($i)"
        case Some(ByteType) => s"(double) $arr.getByte($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${get(a, left)};
         |  double $yv = ${get(b, right)};
         |  $s += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $s / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object DotProduct {
  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  /** Column API: registers the expression builders once per session and
    * calls them by name (the stable route to a custom Expression without
    * relying on private Column internals). */
  def dot(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("graft_dot", a, b)
  }

  def cosine(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("graft_cosine", a, b)
  }
}
