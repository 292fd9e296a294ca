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

  private val uuidRe = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val hexRe = "\\b0[xX][0-9a-fA-F]+\\b|\\b[0-9a-fA-F]{16,}\\b"
  private val numRe = "\\b\\d+(?:\\.\\d+)?\\b"

  // Fewer passes than the chain, but NOT one: merging passes is only
  // sound when no later-pass match can (a) overlap an earlier-pass match
  // that starts later — a uuid at offset 8 of a 16-hex run beats the hex
  // at offset 0; an ip at "1.2.3.4" of "1234.1.2.3.4" beats the num at
  // "1234.1" — or (b) depend on a boundary the earlier REPLACEMENT
  // creates: uuid has no trailing \b, so it can end mid-word-run and its
  // "<uuid>" text manufactures the boundary the ip/num behind it needs
  // ("…-12345678901210.0.255.1"). uuid and ip therefore stay separate
  // passes. hex|num merge safely: both anchor whole word runs (overlap ⇒
  // same start, where alternation order = pass order) and end at real
  // boundaries — except num's fraction, which can cross a dot into a
  // ≥16-digit run the hex pass would have claimed; capping the fraction
  // at 15 digits makes num decline exactly those, and the hex
  // alternative claims them at their own run start.
  private val uuidPass = java.util.regex.Pattern.compile(s"($uuidRe)")
  private val ipPass = java.util.regex.Pattern.compile(s"($ipRe)")
  private val numCappedRe = "\\b\\d+(?:\\.\\d{1,15}\\b)?\\b"
  private val passB = java.util.regex.Pattern.compile(s"($hexRe)|($numCappedRe)")

  private def runPass(s: String, p: java.util.regex.Pattern,
                      rep1: String, rep2: String): String = {
    val m = p.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start)
      sb.append(if (m.start(1) >= 0) rep1 else rep2)
      last = m.end
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  def eval(text: UTF8String, prettify: Boolean): UTF8String = {
    val s0 = text.toString
    val s1 =
      if (prettify) runPass(s0, uuidPass, "<uuid>", "<uuid>")
      else runPass(s0, uuidPass, "<N>-<N>-<N>-<N>-<N>", "")
    val s2 = if (prettify) runPass(s1, ipPass, "<ip4>", "<ip4>") else s1
    val s3 =
      if (prettify) runPass(s2, passB, "<hex>", "<N>")
      else runPass(s2, passB, "<N>", "<N>")
    if (s3 eq s0) text else UTF8String.fromString(s3)
  }

  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  def collapseNums(text: Column, prettify: Boolean): Column = {
    ensureRegistered()
    call_function("graft_collapse_nums", text, lit(prettify))
  }
}
