package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011).
  *
  * A d-dim vector is split into `m` subvectors; each subvector is encoded
  * as the index of its nearest centroid among `ksub` per-subspace
  * centroids, giving an m-byte code (vs 4d bytes of floats — at 100 TB the
  * ANN scan becomes bandwidth-bound, and PQ codes cut the scanned bytes by
  * ~d*4/m). Codebooks are trained driver-side on a bounded sample and
  * shipped as a flat literal `array<double>` laid out
  * `cb[((j*ksub)+c)*dsub + t]` (subspace-major), so the expressions stay
  * codegen-friendly: one constant ArrayData, index arithmetic only.
  *
  * [[PqEncodeExpr]]  vec → array<tinyint> code (codebook argmin per subspace)
  * [[PqCosineExpr]]  (queryVec, code) → asymmetric cosine: the query stays
  *   exact, the corpus side is reconstructed centroid-by-centroid inside
  *   the same loop (no materialized reconstruction).
  */
object PqKernel {
  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  def encode(vec: Column, flatCodebook: Column, m: Column): Column = {
    ensureRegistered()
    call_function("graft_pq_encode", vec, flatCodebook, m)
  }

  def cosine(queryVec: Column, code: Column, flatCodebook: Column): Column = {
    ensureRegistered()
    call_function("graft_pq_cosine", queryVec, code, flatCodebook)
  }
}

/** `graft_pq_encode(vec, cb, m)` → array<tinyint> of length m. */
case class PqEncodeExpr(vec: Expression, cb: Expression, m: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cb

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (m <= 0)
      TypeCheckResult.TypeCheckFailure(s"graft_pq_encode needs m > 0, got $m")
    else if (vecElem.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode needs array<float|double> vec, got ${vec.dataType.sql}")
    else cb.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode needs array<double> codebook, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullSafeEval(v: Any, c: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val book = c.asInstanceOf[ArrayData]
    val d = x.numElements()
    val dsub = d / m
    val ksub = if (dsub == 0) 0 else book.numElements() / (m * dsub)
    val isF = vecElem.contains(FloatType)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var cI = 0
      while (cI < ksub) {
        var dist = 0.0
        var t = 0
        val base = (j * ksub + cI) * dsub
        while (t < dsub) {
          val xv = if (isF) x.getFloat(j * dsub + t).toDouble
                   else x.getDouble(j * dsub + t)
          val diff = xv - book.getDouble(base + t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestD) { bestD = dist; best = cI }
        cI += 1
      }
      out(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, book) => {
      val getX = if (vecElem.contains(FloatType)) "getFloat" else "getDouble"
      val d = ctx.freshName("d"); val dsub = ctx.freshName("dsub")
      val ksub = ctx.freshName("ksub"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val t = ctx.freshName("t")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""
         |int $d = $x.numElements();
         |int $dsub = $d / $m;
         |int $ksub = ($dsub == 0) ? 0 : $book.numElements() / ($m * $dsub);
         |byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dist = 0.0;
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      double $diff = (double) $x.$getX($j * $dsub + $t) - $book.getDouble($base + $t);
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(vec = newLeft, cb = newRight)

  override def prettyName: String = "graft_pq_encode"
}

/** `graft_pq_cosine(queryVec, code, cb)` → asymmetric cosine similarity:
  * exact query vector against the centroid reconstruction addressed by the
  * m-byte code. One fused loop accumulates the asymmetric dot product,
  * the query norm, and the reconstruction norm. */
case class PqCosineExpr(qv: Expression, code: Expression, cb: Expression)
    extends TernaryExpression {

  override def first: Expression = qv
  override def second: Expression = code
  override def third: Expression = cb

  private def vecElem: Option[DataType] = qv.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecElem.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_cosine needs array<float|double> query vec, got ${qv.dataType.sql}")
    else (code.dataType, cb.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_cosine needs (array<tinyint> code, array<double> codebook), " +
          s"got ${c.sql} and ${b.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(q: Any, co: Any, bk: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val c = co.asInstanceOf[ArrayData]
    val book = bk.asInstanceOf[ArrayData]
    val m = c.numElements()
    val d = x.numElements()
    val dsub = if (m == 0) 0 else d / m
    val ksub = if (dsub == 0) 0 else book.numElements() / (m * dsub)
    val isF = vecElem.contains(FloatType)
    var dot = 0.0; var qn = 0.0; var rn = 0.0
    var j = 0
    while (j < m) {
      val cent = (j * ksub + (c.getByte(j) & 0xff)) * dsub
      var t = 0
      while (t < dsub) {
        val xv = if (isF) x.getFloat(j * dsub + t).toDouble
                 else x.getDouble(j * dsub + t)
        val rv = book.getDouble(cent + t)
        dot += xv * rv; qn += xv * xv; rn += rv * rv
        t += 1
      }
      j += 1
    }
    dot / (math.sqrt(qn) * math.sqrt(rn))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, c, book) => {
      val getX = if (vecElem.contains(FloatType)) "getFloat" else "getDouble"
      val m = ctx.freshName("m"); val d = ctx.freshName("d")
      val dsub = ctx.freshName("dsub"); val ksub = ctx.freshName("ksub")
      val dot = ctx.freshName("dot"); val qn = ctx.freshName("qn")
      val rn = ctx.freshName("rn"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val cent = ctx.freshName("cent")
      val xv = ctx.freshName("xv"); val rv = ctx.freshName("rv")
      s"""
         |int $m = $c.numElements();
         |int $d = $x.numElements();
         |int $dsub = ($m == 0) ? 0 : $d / $m;
         |int $ksub = ($dsub == 0) ? 0 : $book.numElements() / ($m * $dsub);
         |double $dot = 0.0; double $qn = 0.0; double $rn = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $cent = ($j * $ksub + ($c.getByte($j) & 0xff)) * $dsub;
         |  for (int $t = 0; $t < $dsub; $t++) {
         |    double $xv = (double) $x.$getX($j * $dsub + $t);
         |    double $rv = $book.getDouble($cent + $t);
         |    $dot += $xv * $rv; $qn += $xv * $xv; $rn += $rv * $rv;
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($qn) * java.lang.Math.sqrt($rn));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqCosineExpr =
    copy(qv = newFirst, code = newSecond, cb = newThird)

  override def prettyName: String = "graft_pq_cosine"
}
