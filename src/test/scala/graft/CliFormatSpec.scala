package graft

import org.scalatest.funsuite.AnyFunSuite

/** vlogscli output-mode conformance (app/vlogscli/json_prettifier.go,
  * lib/logstorage/rows.go marshalToLogfmt): pinned behaviors per mode. */
class CliFormatSpec extends AnyFunSuite {
  import CliFormat._

  test("singleline JSON quotes both sides, {} for no fields") {
    assert(fmtJson(Nil, multiline = false) == "{}")
    assert(fmtJson(Seq("_msg" -> "a \"b\"", "k" -> "v"), multiline = false) ==
      """{"_msg":"a \"b\"","k":"v"}""")
  }

  test("multiline JSON: two-space indent, key: value, one field per line") {
    assert(fmtJson(Seq("a" -> "1", "b" -> "2"), multiline = true) ==
      "{\n  \"a\": \"1\",\n  \"b\": \"2\"\n}")
  }

  test("logfmt: raw keys, values quote only on ctrl/quote/backslash") {
    // '=' inside a VALUE stays raw; the empty value prints bare
    // (rows.go:105-124 isLogfmtSpecialChar: c <= 0x20, '"', '\\')
    assert(fmtLogfmt(Seq("k" -> "a=b", "e" -> "", "s" -> "x y", "q" -> "a\"b",
      "w" -> "back\\slash")) ==
      """k=a=b e= s="x y" q="a\"b" w="back\\slash"""")
    // empty key renders as _msg (marshalToLogfmt, rows.go:82-85)
    assert(fmtLogfmt(Seq("" -> "hello")) == "_msg=hello")
  }

  test("reference MarshalFieldsToJSON/Logfmt goldens (rows_test.go:29-91)") {
    assert(fmtJson(Nil, multiline = false) == "{}")
    assert(fmtJson(Seq("foo" -> "bar"), multiline = false) == """{"foo":"bar"}""")
    // control chars escape as lowercase \u00xx like Go's quicktemplate
    assert(fmtJson(Seq("foo\nbar" -> "  \u001b[32m ", "  \u001b[11m " -> "АБв"),
      multiline = false) ==
      "{\"foo\\nbar\":\"  \\u001b[32m \",\"  \\u001b[11m \":\"АБв\"}")
    assert(fmtLogfmt(Nil) == "")
    assert(fmtLogfmt(Seq("foo" -> "bar")) == "foo=bar")
    assert(fmtLogfmt(Seq("foo" -> "  \u001b[32m ", "bar" -> "АБв")) ==
      "foo=\"  \\u001b[32m \" bar=АБв")
  }

  test("compact: lone value; (_time, other) as time<TAB>value; else logfmt") {
    assert(fmtCompact(Seq("_msg" -> "just text")) == "just text")
    assert(fmtCompact(Seq("_time" -> "T1", "_msg" -> "m")) == "T1\tm")
    assert(fmtCompact(Seq("_msg" -> "m", "_time" -> "T1")) == "T1\tm")
    assert(fmtCompact(Seq("a" -> "1", "b" -> "2", "c" -> "3")) ==
      "a=1 b=2 c=3")
  }
}
