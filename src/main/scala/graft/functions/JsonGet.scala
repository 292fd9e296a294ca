package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, coalesce, get_json_object, lit, when}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass scalar JSON field extraction — the unpack_json hot path
  * (reference pipe_unpack_json.go; its parser is a hand-rolled fastjson,
  * not an object-mapper, for the same reason). `get_json_object` routes
  * every row through a Jackson streaming parse + JsonPath walk; for the
  * dominant case — pull one scalar field out of a log line — a direct
  * scan of the bytes is several times cheaper and stays branch-predictable.
  *
  * Semantics (differentially tested against get_json_object in
  * ExprPropertySpec):
  *   - dotted path `a.b` descends nested objects, first match per level
  *   - string values unescape (\" \\ \/ \b \f \n \r \t \uXXXX); numbers
  *     and booleans return their literal token text; JSON null, a missing
  *     key, and malformed JSON return SQL NULL
  *   - an object or array value returns the NON_SCALAR marker — the
  *     Column wrapper falls back to get_json_object for those rows, so
  *     nested extraction keeps Jackson's exact rendering
  */
object JsonGetKernel {

  /** Marker for "value exists but is not a scalar": leads with U+0000,
    * which no scalar token text can contain un-escaped. A pathological
    * string value that UNESCAPES to exactly this marker just falls back
    * to get_json_object — still correct, merely slower for that row. */
  val NonScalarStr: String = "\u0000{}"
  val NonScalar: UTF8String = UTF8String.fromString(NonScalarStr)

  /** null → missing/invalid/JSON-null; NonScalar → object/array value.
    *
    * Jackson iterates every object it enters through to its CLOSING brace
    * (that is how it reaches END_OBJECT), so a malformed or truncated
    * remainder nulls the lookup even when the value was already found —
    * the walk here does the same: each descended level is validated
    * member-by-member to its `}`. Content after the root object's close
    * is never read (Jackson stops there too). */
  def get(json: UTF8String, path: Array[String]): UTF8String = {
    if (json == null) return null
    val s = json.toString
    var i = skipWs(s, 0)
    var level = 0
    val out = new Array[Int](3)
    while (level < path.length) {
      // "$." and "$.a..b" are invalid JsonPath to get_json_object → null
      if (path(level).isEmpty) return null
      if (i >= s.length) return null
      // an array where an object was expected: get_json_object's JsonPath
      // implicitly traverses arrays ($.a.b over {"a":[{"b":1}]} → [1]) —
      // semantics the scan can't reproduce, so route to the fallback
      if (s.charAt(i) == '[') return NonScalar
      if (s.charAt(i) != '{') return null
      if (!walkObject(s, i, path(level), out)) return null
      if (out(1) < 0) return null // key missing from a valid object
      // duplicate keys at an INTERMEDIATE level: Jackson descends every
      // matching branch and the first branch that yields output wins —
      // multi-branch evaluation belongs to the fallback
      if (level < path.length - 1 && out(2) > 1) return NonScalar
      i = out(1)
      level += 1
    }
    // i sits at the value of the full path; its span was validated by the
    // enclosing walk, so classification never runs off the end
    s.charAt(i) match {
      case '"' =>
        val end = scanStringStrict(s, i)
        if (end < 0) null else unescape(s, i + 1, end - 1)
      case '{' | '[' => NonScalar
      case 'n' => null // JSON null → SQL NULL
      case 't' => UTF8String.fromString("true")
      case 'f' => UTF8String.fromString("false")
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var j = i
        val n = s.length
        while (j < n && isNumChar(s.charAt(j))) j += 1
        val tok = s.substring(i, j)
        // Jackson renders numbers from their PARSED value, not the token
        // text: integers through long ("-0" -> "0"), overflows through
        // BigInteger, floats through double ("1e3" -> "1000.0")
        if (tok.indexOf('.') < 0 && tok.indexOf('e') < 0 && tok.indexOf('E') < 0)
          UTF8String.fromString(
            try String.valueOf(tok.toLong)
            catch { case _: NumberFormatException =>
              new java.math.BigInteger(tok).toString })
        else
          UTF8String.fromString(java.lang.Double.toString(
            java.lang.Double.parseDouble(tok)))
      case _ => null
    }
  }

  /** Strictly walk the object at `from` ('{'): full member syntax through
    * the closing brace, nested values validated recursively. Records the
    * FIRST member whose (unescaped) key equals `key` — out(0) = index
    * just past the '}', out(1) = that value's start or -1. Returns false
    * on any malformation or truncation, like Jackson's streaming parse. */
  private def walkObject(s: String, from: Int, key: String,
                         out: Array[Int]): Boolean = {
    val n = s.length
    var i = skipWs(s, from + 1)
    var matchPos = -1
    // Jackson's path evaluation writes nothing for a JSON-null leaf and
    // keeps scanning, so with duplicate keys the first NON-null match
    // wins ({"k":null,"k":false} → false) — a null match stays tentative
    var matchWasNull = false
    var matchCount = 0
    var first = true
    var closed = false
    while (!closed) {
      if (i >= n) return false
      if (s.charAt(i) == '}') { closed = true; i += 1 }
      else {
        if (!first) {
          if (s.charAt(i) != ',') return false
          i = skipWs(s, i + 1)
          if (i >= n) return false
        }
        first = false
        if (s.charAt(i) != '"') return false
        val keyEnd = scanStringStrict(s, i)
        if (keyEnd < 0) return false
        val keyEq = key != null && keyEquals(s, i + 1, keyEnd - 1, key)
        if (keyEq) matchCount += 1
        val isMatch = keyEq && (matchPos < 0 || matchWasNull)
        i = skipWs(s, keyEnd)
        if (i >= n || s.charAt(i) != ':') return false
        i = skipWs(s, i + 1)
        val vStart = i
        i = skipValueStrict(s, i)
        if (i < 0) return false
        if (isMatch) {
          matchPos = vStart
          matchWasNull = s.charAt(vStart) == 'n'
        }
        i = skipWs(s, i)
      }
    }
    out(0) = i; out(1) = matchPos; out(2) = matchCount
    true
  }

  /** Skip one strictly-valid JSON value; -1 on malformed/truncated. */
  private def skipValueStrict(s: String, from: Int): Int = {
    val n = s.length
    if (from >= n) return -1
    s.charAt(from) match {
      case '"' => scanStringStrict(s, from)
      case '{' =>
        val out = new Array[Int](3)
        if (walkObject(s, from, null, out)) out(0) else -1
      case '[' =>
        var i = skipWs(s, from + 1)
        if (i >= n) return -1
        if (s.charAt(i) == ']') return i + 1
        var done = false
        while (!done) {
          i = skipValueStrict(s, i)
          if (i < 0) return -1
          i = skipWs(s, i)
          if (i >= n) return -1
          if (s.charAt(i) == ']') { done = true; i += 1 }
          else if (s.charAt(i) == ',') i = skipWs(s, i + 1)
          else return -1
        }
        i
      case 'n' => if (s.startsWith("null", from)) from + 4 else -1
      case 't' => if (s.startsWith("true", from)) from + 4 else -1
      case 'f' => if (s.startsWith("false", from)) from + 5 else -1
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var j = from
        while (j < n && isNumChar(s.charAt(j))) j += 1
        if (validNumber(s, from, j)) j else -1
      case _ => -1
    }
  }

  /** `from` at the opening quote; index past the closing quote, or -1 on
    * an unterminated string or invalid escape. Raw control characters are
    * ACCEPTED — Spark's shared Jackson factory enables
    * ALLOW_UNESCAPED_CONTROL_CHARS (fuzz-verified: a literal tab inside a
    * string value extracts fine through get_json_object). */
  private def scanStringStrict(s: String, from: Int): Int = {
    var i = from + 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= n) return -1
        s.charAt(i + 1) match {
          case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 2
          case 'u' =>
            if (i + 6 > n || hex4(s, i + 2) < 0) return -1
            i += 6
          case _ => return -1
        }
      }
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** RFC 8259 number: -?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)? */
  private def validNumber(s: String, from: Int, to: Int): Boolean = {
    var i = from
    def digit(c: Char) = c >= '0' && c <= '9'
    if (i < to && s.charAt(i) == '-') i += 1
    if (i >= to || !digit(s.charAt(i))) return false
    if (s.charAt(i) == '0') i += 1
    else while (i < to && digit(s.charAt(i))) i += 1
    if (i < to && s.charAt(i) == '.') {
      i += 1
      if (i >= to || !digit(s.charAt(i))) return false
      while (i < to && digit(s.charAt(i))) i += 1
    }
    if (i < to && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < to && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      if (i >= to || !digit(s.charAt(i))) return false
      while (i < to && digit(s.charAt(i))) i += 1
    }
    i == to
  }

  private def isNumChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.' ||
      c == 'e' || c == 'E'

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
                     s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** Compare the raw (possibly escaped) key text s[from,to) to `key`. */
  private def keyEquals(s: String, from: Int, to: Int, key: String): Boolean = {
    var i = from
    var hasEsc = false
    while (i < to && !hasEsc) { if (s.charAt(i) == '\\') hasEsc = true; i += 1 }
    if (!hasEsc)
      (to - from) == key.length && s.regionMatches(from, key, 0, key.length)
    else {
      val u = unescape(s, from, to)
      u != null && u.toString == key
    }
  }

  /** Unescape a JSON string body s[from,to) (quotes excluded). */
  private def unescape(s: String, from: Int, to: Int): UTF8String = {
    var i = from
    var hasEsc = false
    while (i < to && !hasEsc) { if (s.charAt(i) == '\\') hasEsc = true; i += 1 }
    if (!hasEsc) return UTF8String.fromString(s.substring(from, to))
    val sb = new java.lang.StringBuilder(to - from)
    i = from
    while (i < to) {
      val c = s.charAt(i)
      if (c != '\\') { sb.append(c); i += 1 }
      else if (i + 1 >= to) return null // dangling backslash
      else {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"');  i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/'  => sb.append('/');  i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'u' =>
            if (i + 6 > to) return null
            val h = hex4(s, i + 2)
            if (h < 0) return null
            sb.append(h.toChar); i += 6
          case _ => return null // invalid escape: malformed JSON
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private def hex4(s: String, at: Int): Int = {
    var v = 0
    var i = at
    while (i < at + 4) {
      val d = Character.digit(s.charAt(i), 16)
      if (d < 0) return -1
      v = (v << 4) | d
      i += 1
    }
    v
  }

}

/** Codegen'd wrapper: one kernel call per row inside whole-stage codegen. */
case class JsonGetScalar(child: Expression, path: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_json_get needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private lazy val pathArr = path.toArray

  override def nullSafeEval(input: Any): Any =
    JsonGetKernel.get(input.asInstanceOf[UTF8String], pathArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val p = ctx.addReferenceObj("path", pathArr, "java.lang.String[]")
      s"""
       ${ev.value} = graft.functions.JsonGetKernel.get($s, $p);
       ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): JsonGetScalar =
    copy(child = newChild)

  override def prettyName: String = "graft_json_get"
}

object JsonGet {
  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  /** Raw kernel column (tests; returns the NonScalar marker verbatim).
    * limit -1 keeps trailing empty segments ("a." → ["a",""]) so the
    * kernel's empty-segment→null rule fires exactly where
    * get_json_object("$.a.") reports an invalid path. */
  def scalar(c: Column, dottedPath: String): Column = {
    ensureRegistered()
    val segs = dottedPath.split("\\.", -1).toSeq
    call_function("graft_json_get", c +: segs.map(lit): _*)
  }

  /** Drop-in for `get_json_object(c, "$." + path)`: the kernel serves
    * scalar values (the common case) in one codegen'd pass; object/array
    * values fall back to Jackson so nested rendering matches exactly. */
  def scalarOrJson(c: Column, dottedPath: String): Column = {
    val fast = scalar(c, dottedPath)
    when(fast === lit(JsonGetKernel.NonScalarStr),
      get_json_object(c, "$." + dottedPath)).otherwise(fast)
  }
}
