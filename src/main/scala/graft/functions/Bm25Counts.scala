package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token/term counters for BM25 scoring: `[dl, tf0, tf1, ...]`
  * where dl is the number of maximal `[a-z0-9]+` runs of
  * `lower(text)` and tf_i counts runs equal to `terms(i)` — exactly
  * `size(split(lower(s), pattern)) - 1` semantics (Locale.ROOT lower,
  * char classes by UTF-16 unit like Java regex), pinned by a
  * differential property test. Replaces one lower + 1+N regex split
  * passes per row (the split formulation measured ~2× DuckDB warm;
  * before that, HOF filter() lambdas measured 4.2×). */
case class Bm25CountsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bm25_counts needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private val termArr = terms.toArray

  override def nullSafeEval(input: Any): Any =
    Bm25Counts.counts(input.asInstanceOf[UTF8String].toString, termArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ts = ctx.addReferenceObj("terms", termArr, "java.lang.String[]")
      s"${ev.value} = graft.functions.Bm25Counts.counts($s.toString(), $ts);"
    })

  override protected def withNewChildInternal(newChild: Expression): Bm25CountsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bm25_counts"
}

object Bm25Counts {

  @inline private def isTok(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  def counts(s: String, terms: Array[String]): GenericArrayData = {
    val out = new Array[Long](terms.length + 1)
    val low = s.toLowerCase(java.util.Locale.ROOT)
    val n = low.length
    var i = 0
    while (i < n) {
      if (isTok(low.charAt(i))) {
        var j = i + 1
        while (j < n && isTok(low.charAt(j))) j += 1
        out(0) += 1L
        var t = 0
        while (t < terms.length) {
          val term = terms(t)
          if (term.length == j - i && low.regionMatches(i, term, 0, term.length))
            out(t + 1) += 1L
          t += 1
        }
        i = j
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** `[dl, tf...]` counts column. */
  def countsCol(text: Column, terms: Seq[String]): Column = {
    GraftFunctions.ensure()
    call_function("graft_bm25_counts", text, array(terms.map(lit(_)): _*))
  }
}
