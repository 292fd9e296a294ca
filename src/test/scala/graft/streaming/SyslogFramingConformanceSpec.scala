package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The reference's TestSyslogLineReader_{Success,Failure} tables
  * (app/vlinsert/syslog/syslog_test.go:12-76), transcribed verbatim:
  * RFC 6587 octet-counted frames mixed with newline-delimited ones,
  * including the quirks — a lone trailing newline stays on an EOF
  * frame, and an unframed chunk with embedded blank lines reads as ONE
  * message. */
class SyslogFramingConformanceSpec extends AnyFunSuite {

  private def readAll(data: String): Either[String, Seq[String]] = {
    val rd = new SyslogLineReader(
      new java.io.ByteArrayInputStream(
        data.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val out = Seq.newBuilder[String]
    while (rd.nextLine()) out += rd.line
    rd.error.toLeft(out.result())
  }

  test("TestSyslogLineReader_Success goldens") {
    def ok(data: String, want: Seq[String]): Unit =
      assert(readAll(data) == Right(want), s"<<$data>>")

    ok("", Nil)
    ok("\n", Nil)
    ok("\n\n\n", Nil)

    ok("foobar", Seq("foobar"))
    ok("foobar\n", Seq("foobar\n"))
    ok("\n\nfoo\n\nbar\n\n", Seq("foo\n\nbar\n\n"))

    ok("Jun  3 12:08:33 abcd systemd: Starting Update the local ESM caches...",
      Seq("Jun  3 12:08:33 abcd systemd: Starting Update the local ESM caches..."))

    ok("Jun  3 12:08:33 abcd systemd: Starting Update the local ESM caches...\n\n" +
      "48 <165>Jun  4 12:08:33 abcd systemd[345]: abc defg" +
      "<123>1 2023-06-03T17:42:12.345Z mymachine.example.com appname 12345 ID47 " +
      "[exampleSDID@32473 iut=\"3\" eventSource=\"Application 123 = ] 56\" " +
      "eventID=\"11211\"] This is a test message with structured data.\n\n",
      Seq(
        "Jun  3 12:08:33 abcd systemd: Starting Update the local ESM caches...",
        "<165>Jun  4 12:08:33 abcd systemd[345]: abc defg",
        "<123>1 2023-06-03T17:42:12.345Z mymachine.example.com appname 12345 ID47 " +
          "[exampleSDID@32473 iut=\"3\" eventSource=\"Application 123 = ] 56\" " +
          "eventID=\"11211\"] This is a test message with structured data."))
  }

  test("TestSyslogLineReader_Failure goldens") {
    def bad(data: String): Unit =
      assert(readAll(data).isLeft, s"<<$data>> got ${readAll(data)}")
    bad("12foo bar") // invalid message-size prefix
    bad("123 aa") // size larger than the remaining payload
    bad("1233423432 abc") // size above the max message limit
  }
}
