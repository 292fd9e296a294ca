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

  /** null → missing/invalid/JSON-null; NonScalar → object/array value. */
  def get(json: UTF8String, path: Array[String]): UTF8String = {
    if (json == null) return null
    val s = json.toString
    val n = s.length
    var i = skipWs(s, 0)
    var level = 0
    while (level < path.length) {
      if (i >= n || s.charAt(i) != '{') return null
      i += 1
      val key = path(level)
      var found = -1
      var done = false
      while (!done) {
        i = skipWs(s, i)
        if (i >= n) return null
        if (s.charAt(i) == '}') { done = true }
        else {
          if (s.charAt(i) == ',') { i = skipWs(s, i + 1); if (i >= n) return null }
          if (s.charAt(i) != '"') return null
          val keyEnd = scanString(s, i)
          if (keyEnd < 0) return null
          val matches = keyEquals(s, i + 1, keyEnd - 1, key)
          i = skipWs(s, keyEnd)
          if (i >= n || s.charAt(i) != ':') return null
          i = skipWs(s, i + 1)
          if (i >= n) return null
          if (matches) { found = i; done = true }
          else {
            i = skipValue(s, i)
            if (i < 0) return null
          }
        }
      }
      if (found < 0) return null
      i = found
      level += 1
    }
    // i sits at the value of the full path
    s.charAt(i) match {
      case '"' =>
        val end = scanString(s, i)
        if (end < 0) null else unescape(s, i + 1, end - 1)
      case '{' | '[' => NonScalar
      case 'n' =>
        if (s.startsWith("null", i)) null else null
      case 't' =>
        if (s.startsWith("true", i)) UTF8String.fromString("true") else null
      case 'f' =>
        if (s.startsWith("false", i)) UTF8String.fromString("false") else null
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var j = i
        while (j < n && isNumChar(s.charAt(j))) j += 1
        // strict JSON number grammar, matching Jackson's rejection of
        // truncated/overcooked tokens ("1e", "01", "-", "1.") as null; a
        // token running to end-of-input is "unexpected EOF in number" to a
        // streaming parser (no terminator proves the token complete)
        if (j == n || !validNumber(s, i, j)) null
        else {
          val tok = s.substring(i, j)
          // integer tokens keep their literal text (Jackson long/BigInteger
          // rendering); float tokens round-trip through double exactly as
          // Jackson's writeNumber(getDoubleValue) does ("1e3" -> "1000.0")
          if (tok.indexOf('.') < 0 && tok.indexOf('e') < 0 && tok.indexOf('E') < 0)
            UTF8String.fromString(tok)
          else
            UTF8String.fromString(java.lang.Double.toString(
              java.lang.Double.parseDouble(tok)))
        }
      case _ => null
    }
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

  /** `from` at the opening quote; returns index just past the closing
    * quote, or -1 when unterminated. */
  private def scanString(s: String, from: Int): Int = {
    var i = from + 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
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

  /** Skip one JSON value starting at `from`; returns the index just past
    * it, or -1 on malformed input. */
  private def skipValue(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    if (i >= n) return -1
    s.charAt(i) match {
      case '"' => scanString(s, i)
      case '{' | '[' =>
        // structural walk: strings may contain braces, so track them
        var depth = 0
        while (i < n) {
          val c = s.charAt(i)
          if (c == '"') { i = scanString(s, i); if (i < 0) return -1 }
          else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') { depth -= 1; if (depth == 0) return i + 1 }
            i += 1
          }
        }
        -1
      case 'n' => if (s.startsWith("null", i)) i + 4 else -1
      case 't' => if (s.startsWith("true", i)) i + 4 else -1
      case 'f' => if (s.startsWith("false", i)) i + 5 else -1
      case c if c == '-' || (c >= '0' && c <= '9') =>
        while (i < n && isNumChar(s.charAt(i))) i += 1
        i
      case _ => -1
    }
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
  @volatile private var registered = Set.empty[SparkSession]

  private def ensureRegistered(): Unit = {
    val spark = SparkSession.active
    if (!registered.contains(spark)) synchronized {
      if (!registered.contains(spark)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_json_get", exprs => {
            val path = exprs.tail.map(_.eval(null).toString)
            JsonGetScalar(exprs.head, path)
          }, "built-in")
        registered += spark
      }
    }
  }

  /** Raw kernel column (tests; returns the NonScalar marker verbatim). */
  def scalar(c: Column, dottedPath: String): Column = {
    ensureRegistered()
    val segs = dottedPath.split("\\.").toSeq
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
