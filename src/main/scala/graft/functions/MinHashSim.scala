package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature and SimHash over a token/shingle array —
  * the hot per-row kernels of the dedup ops (ops/Dedup.scala). The Column
  * formulations they replace (`transform(sequence(0,127), seed =>
  * array_min(transform(shingles, xxhash64(_, seed))))` and the 64-wide
  * zip_with bit-vote) allocate an array per higher-order step: 128×|set|
  * intermediate arrays per row for MinHash. These expressions compute the
  * same values (XxHash64Function, identical seeds) in primitive loops;
  * differential property tests pin parity with the Column spec.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig needs array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashSim.minhashSigEval(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MinHashSim.minhashSigEval($s, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

case class BandHashesExpr(child: Expression, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_band_hashes needs array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashSim.bandHashesEval(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MinHashSim.bandHashesEval($s, $bands);")

  override protected def withNewChildInternal(newChild: Expression): BandHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_band_hashes"
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 needs array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashSim.simhash64Eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MinHashSim.simhash64Eval($s);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object MinHashSim {

  /** min over tokens of xxhash64(token, seedIdx) for seedIdx = 0..n-1.
    * The SQL form chains its children — hash(seedIdx, IntegerType,
    * hash(token, StringType, 42)) — so the expensive string hash is
    * computed ONCE per token and each seed adds one cheap int mix, while
    * values stay bit-identical to the Column formulation. Empty/all-null
    * input yields null entries (array_min-over-empty parity). */
  def minhashSigEval(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h1 = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var seed = 0
        while (seed < numHashes) {
          val h = XxHash64Function.hash(seed, IntegerType, h1)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = if (any) java.lang.Long.valueOf(mins(k)) else null
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Per-bit majority vote of xxhash64(token) (seed 42, the SQL default),
    * bits with positive vote set. */
  def simhash64Eval(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Per-band LSH bucket ids from a MinHash signature: band b's id chains
    * xxhash64 over its rowsPerBand signature longs, seeded with the band
    * index — so one long IS the bucket key (no (band_idx, hash) pair, no
    * `concat_ws` string render of the slice, which allocated a string per
    * band per row and dominated the candidate pass at 500k docs). Null
    * entries (empty-token signatures) are skipped, like concat_ws did.
    * Any injective-enough id works here: bucket SEMANTICS (same bucket ⇔
    * same band values) are what the dedup result depends on. */
  def bandHashesEval(arr: ArrayData, bands: Int): GenericArrayData = {
    val n = arr.numElements()
    val rpb = n / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b, IntegerType, 42L)
      var j = b * rpb
      val end = j + rpb
      while (j < end) {
        if (!arr.isNullAt(j))
          h = XxHash64Function.hash(arr.getLong(j), LongType, h)
        j += 1
      }
      out(b) = java.lang.Long.valueOf(h)
      b += 1
    }
    new GenericArrayData(out)
  }

  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  def minhashSig(tokens: Column, numHashes: Int): Column = {
    ensureRegistered()
    call_function("graft_minhash_sig", tokens, lit(numHashes))
  }

  def bandHashes(sig: Column, bands: Int): Column = {
    ensureRegistered()
    call_function("graft_band_hashes", sig, lit(bands))
  }

  def simhash64(tokens: Column): Column = {
    ensureRegistered()
    call_function("graft_simhash64", tokens)
  }
}
