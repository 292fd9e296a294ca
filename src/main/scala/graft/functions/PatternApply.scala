package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's extract-pattern matcher (pattern.go apply():
  *
  *  - the FIRST prefix is searched anywhere in the input; later prefixes
  *    anchor right after the previous capture,
  *  - a capture that starts with a Go quote (`"`/backquote) consumes the
  *    quoted token atomically and UNQUOTES it — the next prefix must
  *    follow immediately; the `plain:` option disables this,
  *  - an unquoted capture runs to the next occurrence of the following
  *    prefix; the last capture takes the rest,
  *  - a mismatch midway KEEPS the captures made so far (progressive).
  *
  * steps are (prefix, option) pairs; the result array has one slot per
  * step ("" when unmatched), indexed like the steps. */
case class PatternApplyExpr(child: Expression,
                            steps: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pattern_apply needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = PatternApplyExpr.apply(s, steps)
    new GenericArrayData(out.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildInternal(c: Expression): PatternApplyExpr =
    copy(child = c)

  override def prettyName: String = "graft_pattern_apply"
}

object PatternApplyExpr {

  def apply(s0: String, steps: Seq[(String, String)]): Array[String] = {
    val matches = Array.fill(steps.size)("")
    if (steps.isEmpty) return matches
    var s = s0
    val p0 = steps.head._1
    if (p0.nonEmpty) {
      val n = s.indexOf(p0)
      if (n < 0) return matches
      s = s.substring(n + p0.length)
    }
    var i = 0
    while (i < steps.size) {
      val nextPrefix = if (i + 1 < steps.size) steps(i + 1)._1 else ""
      val q = tryUnquote(s, steps(i)._2)
      if (q != null) {
        matches(i) = q._1
        s = s.substring(q._2)
        if (!s.startsWith(nextPrefix)) return matches
        s = s.substring(nextPrefix.length)
      } else {
        if (nextPrefix.isEmpty) { matches(i) = s; return matches }
        val n = s.indexOf(nextPrefix)
        if (n < 0) return matches
        matches(i) = s.substring(0, n)
        s = s.substring(n + nextPrefix.length)
      }
      i += 1
    }
    matches
  }

  /** Go strconv.QuotedPrefix + Unquote for `"..."` and backquoted
    * strings; returns (value, consumedLen) or null. Shared with the
    * logfmt kernel (logfmt_parser.go calls the same tryUnquoteString). */
  private[functions] def tryUnquote(s: String, opt: String): (String, Int) = {
    if (opt == "plain" || s.isEmpty) return null
    s.charAt(0) match {
      case '`' =>
        val end = s.indexOf('`', 1)
        if (end < 0) null else (s.substring(1, end), end + 1)
      case '"' =>
        val sb = new java.lang.StringBuilder
        var i = 1
        while (i < s.length) {
          s.charAt(i) match {
            case '"' => return (sb.toString, i + 1)
            case '\\' if i + 1 < s.length =>
              s.charAt(i + 1) match {
                case 'n' => sb.append('\n'); i += 2
                case 't' => sb.append('\t'); i += 2
                case 'r' => sb.append('\r'); i += 2
                case '\\' => sb.append('\\'); i += 2
                case '"' => sb.append('"'); i += 2
                case '\'' => sb.append('\''); i += 2
                case 'a' => sb.append('\u0007'); i += 2
                case 'b' => sb.append('\b'); i += 2
                case 'f' => sb.append('\f'); i += 2
                case 'v' => sb.append('\u000b'); i += 2
                case 'x' if i + 3 < s.length =>
                  try { sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4 }
                  catch { case _: NumberFormatException => return null }
                case 'u' if i + 5 < s.length =>
                  try { sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
                  catch { case _: NumberFormatException => return null }
                case _ => return null // unknown escape: not a valid Go quote
              }
            case '\n' => return null // Go quoted strings are single-line
            case c => sb.append(c); i += 1
          }
        }
        null // unterminated
      case _ => null
    }
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def encodeSteps(steps: Seq[(String, String)]): String = {
    val arr = steps.flatMap(p => Seq(p._1, p._2))
    mapper.writeValueAsString(arr.toArray)
  }

  def decodeSteps(s: String): Seq[(String, String)] = {
    val arr = mapper.readValue(s, classOf[Array[String]])
    arr.grouped(2).map(a => (a(0), a(1))).toSeq
  }

  def patternApply(c: Column, steps: Seq[(String, String)]): Column = {
    GraftFunctions.ensure()
    org.apache.spark.sql.functions.call_function(
      "graft_pattern_apply", c, org.apache.spark.sql.functions.lit(encodeSteps(steps)))
  }
}
