package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All capture groups of the FIRST regex match in one pass — the extract /
  * extract_regexp pipes previously ran `regexp_extract(src, re, i)` once
  * per output field, re-executing the full regex N times per row. Returns
  * group i at array position i (0-based group 1 at index 0); no match or
  * a non-participating group yields "" (regexp_extract parity, pinned by
  * a differential property test). */
case class ExtractGroupsExpr(child: Expression, regex: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_extract_groups needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(input: Any): Any =
    ExtractGroups.eval(pattern, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val p = ctx.addReferenceObj("pattern", pattern, "java.util.regex.Pattern")
      s"${ev.value} = graft.functions.ExtractGroups.eval($p, $s);"
    })

  override protected def withNewChildInternal(newChild: Expression): ExtractGroupsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_extract_groups"
}

object ExtractGroups {

  def eval(p: java.util.regex.Pattern, s: UTF8String): GenericArrayData = {
    val m = p.matcher(s.toString)
    val n = m.groupCount()
    val out = new Array[Any](n)
    if (m.find()) {
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        out(i) = UTF8String.fromString(if (g == null) "" else g)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { out(i) = UTF8String.fromString(""); i += 1 }
    }
    new GenericArrayData(out)
  }

  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  def extractGroups(c: Column, regex: String): Column = {
    ensureRegistered()
    call_function("graft_extract_groups", c, lit(regex))
  }
}
