package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass logfmt `k=v k2="quoted \" v"` → map parser — a port of the
  * reference's logfmtParser.parse (logfmt_parser.go:28-73, conformant to
  * its TestLogfmtParser goldens):
  *
  *  - a field name runs to the next `=` or space (space and `=` ONLY —
  *    tabs are ordinary name/value bytes), and is space-trimmed;
  *  - a bare word (space or end before any `=`) is a field with an empty
  *    value;
  *  - an empty trimmed name with a non-empty value is the message field
  *    (the reference keeps Name "", which IS `_msg` in its data model);
  *    empty-name empty-value pairs are dropped;
  *  - after `=`, a Go-quoted (`"…"`/backquoted) value is unquoted with
  *    full escape decoding; a non-space byte right after the closing
  *    quote STOPS the parse (logfmt_parser.go:60-63);
  *  - otherwise the value runs to the next space or end of input.
  *
  * Duplicate keys keep the last value (the reference appends duplicate
  * fields; the last write wins on the row, which a last-wins map
  * reproduces). One scan per row — the unpack_logfmt / pack_logfmt
  * hot path.
  */
case class LogfmtToMap(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_logfmt needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = MapType(StringType, StringType)

  // Go unicode.IsSpace: \t \n \v \f \r ' ' U+0085 U+00A0 + Unicode
  // space category (strings.TrimSpace trims these from both ends)
  private def goIsSpace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r') || c.toInt == 0x85 ||
      c.toInt == 0xA0 || Character.isSpaceChar(c)

  private def goTrimSpace(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && goIsSpace(s.charAt(a))) a += 1
    while (b > a && goIsSpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    // insertion-ordered, last value wins per key
    val pairs = new java.util.LinkedHashMap[String, String]()
    def add(name0: String, value: String): Unit = {
      val name = goTrimSpace(name0)
      if (!(name.isEmpty && value.isEmpty))
        pairs.put(if (name.isEmpty) "_msg" else name, value)
    }
    var i = 0
    var stop = false
    while (!stop) {
      // field name: up to the next '=' or ' ' (logfmt_parser.go:32)
      var j = i
      while (j < n && s.charAt(j) != '=' && s.charAt(j) != ' ') j += 1
      if (j == n) { add(s.substring(i), ""); stop = true }
      else {
        val name = s.substring(i, j)
        val eq = s.charAt(j) == '='
        i = j + 1
        if (!eq) add(name, "") // bare word: empty value
        else if (i == n) { add(name, ""); stop = true }
        else {
          val uq =
            if (s.charAt(i) == '"' || s.charAt(i) == '`')
              PatternApplyExpr.tryUnquote(s.substring(i), "")
            else null
          if (uq != null) {
            add(name, uq._1)
            i += uq._2
            if (i == n) stop = true
            else if (s.charAt(i) != ' ') stop = true // junk after quote
            else i += 1
          } else {
            var k = i
            while (k < n && s.charAt(k) != ' ') k += 1
            add(name, s.substring(i, k))
            if (k == n) stop = true else i = k + 1
          }
        }
      }
    }
    val keys = new Array[Any](pairs.size)
    val vals = new Array[Any](pairs.size)
    var idx = 0
    val it = pairs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(idx) = UTF8String.fromString(e.getKey)
      vals(idx) = UTF8String.fromString(e.getValue)
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): LogfmtToMap =
    copy(child = newChild)

  override def prettyName: String = "graft_logfmt"
}

object LogfmtParse {
  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  def logfmtToMap(c: Column): Column = {
    ensureRegistered()
    call_function("graft_logfmt", c)
  }
}
