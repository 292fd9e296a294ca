package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass logfmt `k=v k2="quoted \" v"` → map parser (logfmt_parser.go).
  *
  * Replaces a three-regex Column tower (extract_all + per-pair key extract
  * + per-pair unquote) with one scan per row — the unpack_logfmt /
  * pack_logfmt hot path. Semantics match the previous regex form: keys are
  * letter/digit/`_`/`.`/`-` runs immediately before `=`; values are either
  * a quoted string with backslash escapes or a run of non-whitespace; an
  * unterminated quote degrades to the bare-run reading. Duplicate keys
  * keep the last value (the regex form inherited Spark's map policy; last
  * wins is the deterministic choice).
  */
case class LogfmtToMap(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_logfmt needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = MapType(StringType, StringType)

  private def isKeyChar(c: Char): Boolean =
    Character.isLetter(c) || Character.isDigit(c) ||
      c == '_' || c == '.' || c == '-'

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000B' || c == '\f'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    // insertion-ordered, last value wins per key
    val pairs = new java.util.LinkedHashMap[String, String]()
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '=') {
        var j = i - 1
        while (j >= 0 && isKeyChar(s.charAt(j))) j -= 1
        val key = s.substring(j + 1, i)
        if (key.nonEmpty) {
          var value: String = null
          var next = i + 1
          if (next < n && s.charAt(next) == '"') {
            val sb = new java.lang.StringBuilder
            var k = next + 1
            var closed = false
            while (k < n && !closed) {
              val c = s.charAt(k)
              if (c == '\\' && k + 1 < n) { sb.append(s.charAt(k + 1)); k += 2 }
              else if (c == '"') { closed = true; k += 1 }
              else { sb.append(c); k += 1 }
            }
            if (closed) { value = sb.toString; next = k }
          }
          if (value == null) {
            var k = i + 1
            while (k < n && !isWs(s.charAt(k))) k += 1
            value = s.substring(i + 1, k)
            next = k
          }
          pairs.put(key, value)
          i = next
        } else i += 1
      } else i += 1
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
