package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass `collapse_nums` (pipe_collapse_nums.go — the reference also
  * hand-rolls this scan rather than chaining regexes). The Column form
  * chained 3 (plain) / 4 (prettify) `regexp_replace` passes, each a full
  * UTF8String→String→matcher→String→UTF8String round trip per row on the
  * hottest column (`_msg`). This expression runs ONE alternation matcher
  * with per-branch replacements; branch priority mirrors the chain's
  * pass order, and since every replacement token (`<N>`, `<uuid>`, …)
  * contains no digit/hex characters, a later pass could never match
  * inside an earlier pass's replacement — so the single left-to-right
  * scan produces the same text (pinned by a differential property test
  * against the chained form). */
case class CollapseNumsExpr(child: Expression, prettify: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_collapse_nums needs string, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CollapseNums.eval(input.asInstanceOf[UTF8String], prettify)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CollapseNums.eval($s, $prettify);")

  override protected def withNewChildInternal(newChild: Expression): CollapseNumsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_collapse_nums"
}

object CollapseNums {

  // --- the reference scan, rune for rune (appendCollapseNums,
  // pipe_collapse_nums.go:123-160): a decimal/hex run starting after a
  // non-token char (or one of the special unit/format runes) collapses
  // to <N> when it ends before a non-token char (or a special end rune)
  // and passes the hex plausibility gate.

  private def isDecimalOrHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || isHex(c)

  private def isHex(c: Char): Boolean =
    (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isTokenChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  private def isSpecialStart(c: Char): Boolean =
    c == 'T' || c == 'X' || c == 'x' || c == 'v' || c == 's' || c == 'h' || c == 'm'

  private def isSpecialEnd(c: Char): Boolean =
    c == 'T' || c == 'Z' || c == 's' || c == 'm' || c == 'h' ||
      c == 'μ' || c == 'u' || c == 'n'

  /** canBeTreatedAsNum: decimal-only runs always; runs with hex letters
    * only when >= 4 chars and even length (filters "be", "ad", "abc"). */
  private def canBeNum(s: String, from: Int, until: Int): Boolean = {
    var hasHex = false
    var i = from
    while (i < until) { if (isHex(s.charAt(i))) hasHex = true; i += 1 }
    if (!hasHex) true
    else { val n = until - from; n >= 4 && n % 2 == 0 }
  }

  private def collapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    var numStart = -1
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isDecimalOrHex(c)) {
        if (numStart < 0 &&
            (i == 0 || isSpecialStart(s.charAt(i - 1)) || !isTokenChar(s.charAt(i - 1))))
          numStart = i
      } else if (numStart >= 0) {
        sb.append(s, start, numStart)
        if ((!isSpecialEnd(c) && isTokenChar(c)) || !canBeNum(s, numStart, i))
          sb.append(s, numStart, i)
        else sb.append("<N>")
        start = i
        numStart = -1
      }
      i += 1
    }
    if (numStart >= 0 && canBeNum(s, numStart, n)) {
      sb.append(s, start, numStart)
      sb.append("<N>")
    } else sb.append(s, start, n)
    sb.toString
  }

  // --- prettify (appendPrettifyCollapsedNums, :197-207): sequential
  // literal replaces, each optionally eating a tail right after a match.

  private def replaceAll(s: String, old: String, rep: String,
                         skipTail: String => String): String = {
    var idx = s.indexOf(old)
    if (idx < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var rest = s
    while (idx >= 0) {
      sb.append(rest, 0, idx)
      sb.append(rep)
      rest = rest.substring(idx + old.length)
      if (skipTail != null) rest = skipTail(rest)
      idx = rest.indexOf(old)
    }
    sb.append(rest)
    sb.toString
  }

  private val skipSubsecs: String => String = s =>
    if (s.startsWith(".<N>") || s.startsWith(",<N>")) s.substring(4) else s

  private val skipTimezone: String => String = s =>
    if (s.startsWith("Z")) s.substring(1)
    else if (s.startsWith("-<N>:<N>") || s.startsWith("+<N>:<N>")) s.substring(8)
    else s

  private def prettifyStr(s0: String): String = {
    var s = s0
    s = replaceAll(s, "<N>-<N>-<N>-<N>-<N>", "<UUID>", null)
    s = replaceAll(s, "<N>.<N>.<N>.<N>", "<IP4>", null)
    s = replaceAll(s, "<N>:<N>:<N>", "<TIME>", skipSubsecs)
    s = replaceAll(s, "<N>-<N>-<N>", "<DATE>", null)
    s = replaceAll(s, "<N>/<N>/<N>", "<DATE>", null)
    s = replaceAll(s, "<DATE>T<TIME>", "<DATETIME>", skipTimezone)
    s = replaceAll(s, "<DATE> <TIME>", "<DATETIME>", skipTimezone)
    s
  }

  def eval(text: UTF8String, prettify: Boolean): UTF8String = {
    val s0 = text.toString
    val s1 = collapse(s0)
    val s2 = if (prettify) prettifyStr(s1) else s1
    if (s2 == s0) text else UTF8String.fromString(s2)
  }

  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  def collapseNums(text: Column, prettify: Boolean): Column = {
    ensureRegistered()
    call_function("graft_collapse_nums", text, lit(prettify))
  }
}
