package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass duplicate-key map build — the kernel under
  * [[MapOps.entriesFirstWins]]/[[MapOps.entriesLastWins]]. The previous
  * higher-order tower (`filter(entries, (e, i) => !exists(slice(...)))`)
  * interpreted per element AND was O(k²) per row, which is quadratic
  * ingest CPU once wide client documents (hundreds of keys) appear.
  * One LinkedHashMap pass is O(k) and codegen-friendly.
  *
  * Order contract (pinned by MapOpsSpec): surviving entries keep the
  * position of their SURVIVING occurrence — first occurrence for
  * first-wins; last occurrence for last-wins (so duplicate-free input
  * keeps its order under both policies).
  *
  * Struct fields are read POSITIONALLY (0 = key, 1 = value), so entry
  * arrays built by `transform` lambdas work regardless of how
  * nested-lambda re-resolution mangles their field aliases. */
case class EntriesDedupExpr(child: Expression, lastWins: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs.forall(_.dataType == StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_entries_dedup expects array<struct<string,string>>, got $other")
  }

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    EntriesDedupKernel.eval(input.asInstanceOf[ArrayData], lastWins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.EntriesDedupKernel.eval($a, $lastWins);")

  override protected def withNewChildInternal(newChild: Expression): EntriesDedupExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_entries_dedup"
}

/** Standalone kernel object — NOT the expression's companion: Scala
  * suppresses the static forwarder for a companion method whose name
  * collides with a class member (`Expression.eval`), so generated Java
  * calling `EntriesDedupExpr.eval(ArrayData, boolean)` failed to compile
  * and every plan containing this expression fell back to interpreted
  * whole-stage-codegen-off execution. A distinct object name keeps the
  * static method visible to janino. */
object EntriesDedupKernel {
  def eval(entries: ArrayData, lastWins: Boolean): MapData = {
    val n = entries.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, UTF8String](n * 2)
    var i = 0
    while (i < n) {
      // a null entry struct can't come from map_entries but CAN come from
      // a transform lambda — skip it like the filter tower did (its
      // predicate evaluated null → dropped)
      if (!entries.isNullAt(i)) {
        val e = entries.getStruct(i, 2)
        // null keys: a legal MapData cannot hold one (the old tower's
        // map_from_entries THREW on them); dropping the entry is the
        // malformed-client-payload-never-fails-the-batch policy
        if (!e.isNullAt(0)) {
          // copy: the UTF8Strings view the scan's reused row buffer
          val k = e.getUTF8String(0).copy()
          val v = if (e.isNullAt(1)) null else e.getUTF8String(1).copy()
          if (lastWins) {
            // re-append so the key takes the LAST occurrence's position
            m.remove(k)
            m.put(k, v)
          } else if (!m.containsKey(k)) m.put(k, v)
        }
      }
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
