package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, current_timestamp}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Golden row-set tests per operator, in the style of the reference's
  * table-driven pipe tests (lib/logstorage/pipe_*_test.go). */
class CompilerSpec extends SparkSuite {

  private val NOW = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  lazy val logs: DataFrame = {
    val schema = StructType(Seq(
      StructField("_time", TimestampType),
      StructField("_msg", StringType),
      StructField("level", StringType),
      StructField("host", StringType),
      StructField("v", StringType),
      StructField("ip", StringType)))
    val rows = Seq(
      Row(ts("2023-12-31T10:00:01Z"), "connection error from db", "error", "h1", "10", "10.0.0.1"),
      Row(ts("2023-12-31T11:30:02Z"), "user login ok", "info", "h1", "2.5", "10.0.0.2"),
      Row(ts("2023-12-31T12:00:03Z"), "disk error: no space", "error", "h2", "7", "192.168.1.5"),
      Row(ts("2023-12-31T13:45:04Z"), "errors piling up", "warn", "h2", "n/a", "10.0.1.200"),
      Row(ts("2023-12-31T18:00:05Z"), "shutdown complete", "info", "h3", "", "8.8.8.8"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def run(q: String, df: DataFrame = logs): DataFrame =
    Compiler.run(df, q, NOW)

  private def msgs(q: String): Seq[String] =
    run(q).select("_msg").collect().map(_.getString(0)).toSeq.sorted

  // ------------------------------------------------------------- filters

  test("phrase filter matches words, not substrings") {
    assert(msgs("error") == Seq("connection error from db", "disk error: no space"))
    // "errors" is a different word than "error"
    assert(msgs("errors") == Seq("errors piling up"))
  }

  test("prefix filter matches word prefixes") {
    assert(msgs("error*") ==
      Seq("connection error from db", "disk error: no space", "errors piling up"))
  }

  test("field phrase, exact, exact-prefix") {
    assert(msgs("level:error").size == 2)
    assert(msgs("level:=info").size == 2)
    assert(msgs("level:=inf*").size == 2)
    assert(msgs("level:=inf").isEmpty)
  }

  test("any-case") {
    assert(msgs("level:i(ERROR)").size == 2)
    assert(msgs("level:i(ERR*)").size == 2)
  }

  test("in / contains_any / contains_all / seq") {
    assert(msgs("level:in(error, warn)").size == 3)
    assert(msgs("_msg:contains_any(login, shutdown)").size == 2)
    assert(msgs("_msg:contains_all(disk, space)").size == 1)
    assert(msgs("_msg:seq(connection, db)").size == 1)
    assert(msgs("_msg:seq(db, connection)").isEmpty)
  }

  test("regexp") {
    assert(msgs("""_msg:~"err.*db"""") == Seq("connection error from db"))
  }

  test("numeric range on string field") {
    assert(msgs("v:>5").toSet ==
      Set("connection error from db", "disk error: no space"))
    assert(msgs("v:range[2.5, 7]").size == 2)
    assert(msgs("v:<3").size == 1) // "n/a" and "" don't parse
  }

  test("len_range / string_range") {
    assert(msgs("v:len_range(1, 2)").size == 2) // "10", "7" (and not "", "n/a", "2.5")
    assert(msgs("level:string_range(e, f)").size == 2) // error < f
  }

  test("ipv4_range incl cidr") {
    assert(msgs("ip:ipv4_range(10.0.0.0, 10.0.0.255)").size == 2)
    assert(msgs("ip:ipv4_range(\"10.0.0.0/16\")").size == 3)
  }

  test("eq_field / lt_field numeric-aware") {
    assert(msgs("v:eq_field(v)").size == 5)
    // v < len? compare v and ip as numbers/strings: just smoke lt_field
    assert(run("v:lt_field(ip)").count() >= 0)
  }

  test("time range filter") {
    assert(msgs("_time:[2023-12-31T11:00:00, 2023-12-31T14:00:00)").size == 3)
    assert(msgs("_time:2023-12-31").size == 5)
    assert(msgs("_time:day_range[11:00, 14:00)").size == 3)
    assert(msgs("_time:week_range[Sun, Sun]").size == 5) // 2023-12-31 is a Sunday
  }

  test("boolean combinators") {
    assert(msgs("level:error host:h1") == Seq("connection error from db"))
    assert(msgs("level:error or level:warn").size == 3)
    assert(msgs("not level:error").size == 3)
    assert(msgs("!level:error").size == 3)
  }

  test("field:* matches non-empty") {
    assert(msgs("v:*").size == 4)
  }

  // --------------------------------------------------------------- pipes

  test("fields / delete / copy / rename") {
    val df = run("* | fields _msg, level")
    assert(df.columns.toSeq == Seq("_msg", "level"))
    assert(run("* | delete ip, v").columns.toSeq ==
      Seq("_time", "_msg", "level", "host"))
    val c = run("* | copy level as lvl")
    assert(c.columns.contains("lvl"))
    val r = run("* | rename level as lvl")
    assert(r.columns.contains("lvl") && !r.columns.contains("level"))
  }

  test("where pipe") {
    assert(run("* | where level:error").count() == 2)
  }

  test("limit / offset after sort") {
    val out = run("* | sort by (v) desc limit 2").select("_msg").collect().map(_.getString(0))
    // collation desc: non-numeric strings > numbers > "" (sortBlockLess
    // falls back to natural string compare for non-numeric values)
    assert(out.toSeq == Seq("errors piling up", "connection error from db"))
    assert(run("* | sort by (_time) | offset 3").count() == 2)
  }

  test("sort with rank and partition by") {
    val df = run("* | sort by (v desc) partition by (level) limit 1 rank as r")
    assert(df.filter("level = 'error'").count() == 1)
    assert(df.columns.contains("r"))
  }

  test("stats count/sum/avg with group") {
    val df = run("* | stats by (level) count() hits, sum(v) s | sort by (level)")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(rows.take(2) == Seq(
      ("error", 2L, Some(17.0)),
      ("info", 2L, Some(2.5))))
    // "n/a" doesn't parse: sum of no values is NaN (stats_sum.go), not null
    assert(rows(2)._1 == "warn" && rows(2)._2 == 1L &&
      rows(2)._3.exists(_.asInstanceOf[Double].isNaN))
  }

  test("rename removes the source field, map-resident included") {
    // reference pipe_rename: `mv a as aa` leaves a unreadable. The
    // map-resident case leaked the old entry (and a renamed column
    // un-shadowed a stale map entry) until round 8's differential fuzz
    // caught full-vs-bounded disagreement here.
    import spark.implicits._
    val df = (0 until 5).map(i => (s"""{"a":$i,"b":"y$i"}""", "info"))
      .toDF("js", "level")
    val q = """* | unpack_json from js | rename a as aa
               | stats count() c, count(a) ca, count(aa) caa"""
    val out = Compiler.run(df, q, NOW).collect().head
    assert(out.getAs[Long]("c") == 5 && out.getAs[Long]("ca") == 0 &&
      out.getAs[Long]("caa") == 5, out.toString)
    // the kill-switched full path must agree
    System.setProperty("graft.neededfields.disable", "1")
    try {
      val full = Compiler.run(df, q, NOW).collect().head
      assert(full.getAs[Long]("ca") == 0 && full.getAs[Long]("caa") == 5,
        full.toString)
    } finally System.clearProperty("graft.neededfields.disable")
  }

  test("stats time bucket") {
    val df = run("* | stats by (_time:1h) count() hits | sort by (_time)")
    assert(df.count() == 5) // all rows in distinct hours
  }

  test("stats numeric bucket") {
    val df = run("* | stats by (v:5) count() hits | sort by (v)")
    // buckets: 10→10, 2.5→0, 7→5, n/a→null, ""→null
    assert(df.count() == 4)
  }

  test("stats calendar and word time buckets (month, week→Monday)") {
    import spark.implicits._
    // 2024-01-01 was a Monday; 2024-01-07 a Sunday; 2024-02-02 next month
    val df = Seq("2024-01-01T10:00:00Z", "2024-01-07T23:00:00Z",
        "2024-02-02T00:30:00Z")
      .map(java.time.Instant.parse(_))
      .map(i => java.sql.Timestamp.from(i)).toDF("_time")
    val months = Compiler.run(df,
      "* | stats by (_time:month) count() hits | sort by (_time)", NOW)
      .collect().map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1)))
    assert(months.toSeq == Seq(("2024-01-01T00:00:00Z", 2L),
      ("2024-02-01T00:00:00Z", 1L)), months.toSeq.toString)
    // word `week` starts Monday (block_result.go:819-822): Jan 1 + Jan 7
    // share a Monday-based week; `1w` truncates from the Thursday epoch,
    // which SPLITS them (Jan 4 is a Thursday)
    val weeks = Compiler.run(df,
      "* | stats by (_time:week) count() hits | sort by (_time)", NOW)
      .collect().map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1)))
    assert(weeks.toSeq == Seq(("2024-01-01T00:00:00Z", 2L),
      ("2024-01-29T00:00:00Z", 1L)), weeks.toSeq.toString)
    val w1 = Compiler.run(df,
      "* | stats by (_time:1w) count() hits | sort by (_time)", NOW)
      .collect().map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1)))
    assert(w1.head._1 == "2023-12-28T00:00:00Z" && w1.length == 3,
      w1.toSeq.toString)
  }

  test("time buckets FLOOR below the offset fold (week near epoch)") {
    import spark.implicits._
    // 1970-01-02 is a Friday; the word-week Monday fold (+4d) puts it
    // BELOW the first post-epoch boundary — floor semantics must bucket
    // it to Monday 1969-12-29, not round it up to 1970-01-05
    // (truncateTimestamp r<0 => r+=bucket)
    val df = Seq("1970-01-02T12:00:00Z", "1970-01-06T00:00:00Z")
      .map(java.time.Instant.parse(_))
      .map(java.sql.Timestamp.from(_)).toDF("_time")
    val weeks = Compiler.run(df,
      "* | stats by (_time:week) count() hits | sort by (_time)", NOW)
      .collect().map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1)))
    assert(weeks.toSeq == Seq(("1969-12-29T00:00:00Z", 1L),
      ("1970-01-05T00:00:00Z", 1L)), weeks.toSeq.toString)
  }

  test("time bucket timezone offset, including negative") {
    import spark.implicits._
    // 01:00 UTC = 03:00 at UTC+2 (day bucket offset 2h → bucket start
    // shifts to 22:00 prior UTC day); negative offset shifts the other way
    val df = Seq("2024-01-02T01:00:00Z").map(java.time.Instant.parse(_))
      .map(java.sql.Timestamp.from(_)).toDF("_time")
    def bucket(q: String): String =
      Compiler.run(df, q, NOW).collect().head.getTimestamp(0).toInstant.toString
    assert(bucket("* | stats by (_time:1d offset 2h) count() c")
      == "2024-01-01T02:00:00Z")
    assert(bucket("* | stats by (_time:1d offset -2h) count() c")
      == "2024-01-01T22:00:00Z")
    // unparseable offsets fail loudly, not silently as zero
    intercept[Exception] {
      Compiler.run(df, "* | stats by (_time:1d offset bogus) count() c", NOW)
    }
  }

  test("stats IPv4 subnet bucket ip:/24") {
    import spark.implicits._
    val df = Seq("10.1.2.3", "10.1.2.200", "10.1.3.4", "not-an-ip")
      .toDF("ip")
    val out = Compiler.run(df,
      "* | stats by (ip:/24) count() hits | sort by (ip)", NOW)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // two /24 groups + raw passthrough for the unparseable value
    // (block_result.go:1731-1745 falls through to the raw string)
    assert(out == Seq(("10.1.2.0", 2L), ("10.1.3.0", 1L), ("not-an-ip", 1L)),
      out.toString)
    // bucket offset applies to IPv4 masks too (truncateUint32 takes the
    // offset, block_result.go:1731-1745), with floor semantics when
    // n-off wraps below the subnet base
    val shifted = Compiler.run(df,
      "* | stats by (ip:/24 offset 1) count() hits | sort by (ip)", NOW)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(shifted == Seq(("10.1.2.1", 2L), ("10.1.3.1", 1L), ("not-an-ip", 1L)),
      shifted.toString)
    // an offset ABOVE the address short-circuits to 0.0.0.0
    // (truncateUint32, block_result.go:1544-1546) — no modular wrap
    val clamped = Compiler.run(Seq("0.0.0.5").toDF("ip"),
      "* | stats by (ip:/24 offset 200) count() hits", NOW)
      .collect().map(_.getString(0)).toSeq
    assert(clamped == Seq("0.0.0.0"), clamped.toString)
    // a NEGATIVE offset canonicalizes through uint32(int32(off))
    // (block_result.go:1735) into a huge uint32, clamping nearly every
    // address to 0.0.0.0 the same way
    val negOff = Compiler.run(Seq("10.1.2.3").toDF("ip"),
      "* | stats by (ip:/24 offset -4) count() hits", NOW)
      .collect().map(_.getString(0)).toSeq
    assert(negOff == Seq("0.0.0.0"), negOff.toString)
    // a mask bucket on the timestamp field is an error, not a silent
    // string-group of rendered timestamps
    intercept[Exception] {
      Compiler.run(df.withColumn("_time", current_timestamp()),
        "* | stats by (_time:/24) count() c", NOW)
    }
  }

  test("stats if filter") {
    val df = run("* | stats count() total, count() if (level:error) errs")
    val r = df.collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 2)
  }

  test("count_uniq / count_empty / sum_len / min / max") {
    val df = run("* | stats count_uniq(level) cu, count_empty(v) ce, sum_len(level) sl")
    val r = df.collect().head
    assert(r.getLong(0) == 3)
    assert(r.getLong(1) == 1)
    assert(r.getLong(2) == 22L) // error+info+error+warn+info = 5+4+5+4+4
  }

  test("median / quantile") {
    // nearest-rank ELEMENT over the value collation (stats_quantile.go);
    // v is a string column, and empty/missing values participate for an
    // explicitly named field: ["", "10", "2.5", "7", "n/a"] sorted by
    // lessString -> ["", "2.5", "7", "10", "n/a"]; median = idx 2 = "7";
    // phi>=1 returns the max ("n/a" sorts above numbers)
    val r = run("* | stats median(v) m, quantile(1.0, v) q").collect().head
    assert(r.getString(0) == "7")
    assert(r.getString(1) == "n/a")
  }

  test("values / uniq_values") {
    val r = run("* | stats uniq_values(level) uv").collect().head
    assert(r.getSeq[String](0) == Seq("error", "info", "warn"))
  }

  test("min/max numeric-aware string collation") {
    // v: "10", "2.5", "7", "n/a", "" → empty < numbers(2.5 < 7 < 10) < other
    val r = run("* | stats min(v) mn, max(v) mx").collect().head
    assert(r.getString(0) == "")
    assert(r.getString(1) == "n/a")
    val r2 = run("""v:* -v:="n/a" | stats min(v) mn, max(v) mx""").collect().head
    assert(r2.getString(0) == "2.5" && r2.getString(1) == "10")
  }

  test("row_max") {
    // the source compares under the value collation: "n/a" (a string)
    // sorts above every number, so the warn row wins (lessString)
    val r = run("* | stats row_max(v) rm").collect().head
    assert(r.getString(0).contains("errors piling up"), r.getString(0))
    // excluding the non-numeric value, the numeric max (v=10) row wins
    val r2 = run("""-v:="n/a" | stats row_max(v) rm""").collect().head
    assert(r2.getString(0).contains("connection error"), r2.getString(0))
  }

  test("top pipe") {
    val rows = run("* | top 2 by (level)").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet == Set("error", "info"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(2, 2))
  }

  test("uniq pipe") {
    assert(run("* | uniq by (level)").count() == 3)
    assert(run("* | uniq by (level) with hits").columns.contains("hits"))
  }

  test("field_values / field_names") {
    val fv = run("* | field_values level").collect()
    assert(fv.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("error", 2L), ("info", 2L), ("warn", 1L)))
    val fn = run("* | field_names").collect()
    assert(fn.map(_.getString(0)).toSet.contains("level"))
    // v has one empty value → hits 4
    assert(fn.find(_.getString(0) == "v").get.getLong(1) == 4)
  }

  test("math pipe") {
    val df = run("level:error | math v * 2 + 1 as y | fields _msg, y")
    assert(df.collect().map(_.getDouble(1)).sorted.toSeq == Seq(15.0, 21.0))
    val d = run("* | math v default 0 as y | stats sum(y) s").collect().head
    assert(d.getDouble(0) == 19.5)
    // now() is Unix NANOseconds (pipe_math.go:1030 UnixNano), not seconds
    val n = run("* | math now() as t | limit 1").collect().head
      .getAs[Double]("t")
    assert(n == NOW.toDouble, s"now()=$n, want ctx nanos $NOW")
  }

  test("format pipe") {
    val df = run("""level:warn | format "lvl=<uc:level> host=<host>" as out""")
    assert(df.collect().head.getAs[String]("out") == "lvl=WARN host=h2")
  }

  test("extract pipe") {
    val df = run("""level:error | extract "disk <what>: no <what2>" from _msg""")
    val r = df.filter("_msg like 'disk%'").collect().head
    assert(r.getAs[String]("what") == "error")
    assert(r.getAs[String]("what2") == "space")
  }

  test("extract_regexp pipe") {
    val df = run("""* | extract_regexp "from (?P<src>\\w+)" from _msg""")
    assert(df.filter("src = 'db'").count() == 1)
  }

  test("replace / replace_regexp") {
    val df = run("""level:warn | replace ("piling", "stacking") at _msg""")
    assert(df.collect().head.getAs[String]("_msg") == "errors stacking up")
    val df2 = run("""level:warn | replace_regexp ("p\\w+g", "X") at _msg""")
    assert(df2.collect().head.getAs[String]("_msg") == "errors X up")
  }

  test("len / hash / json_array_len") {
    val df = run("level:warn | len(_msg) as l | hash(_msg) as h")
    val r = df.collect().head
    assert(r.getAs[Long]("l") == 16L)
    assert(r.getAs[Long]("h") != 0L)
  }

  test("unpack_json") {
    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("""{"a":"1","b":"x y"}"""))), schema)
    val out = Compiler.run(df, "* | unpack_json from _msg fields (a, b)", NOW)
    val r = out.collect().head
    assert(r.getAs[String]("a") == "1" && r.getAs[String]("b") == "x y")
    // map-merge path
    val out2 = Compiler.run(df, "* | unpack_json from _msg | where a:1", NOW)
    assert(out2.count() == 1)
  }

  test("unpack_logfmt") {
    val schema = StructType(Seq(StructField("kv", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("""k1=v1 k2="a b" k3="""))), schema)
    val out = Compiler.run(df, "* | unpack_logfmt from kv fields (k1, k2, k3)", NOW)
    val r = out.collect().head
    assert(r.getAs[String]("k1") == "v1")
    assert(r.getAs[String]("k2") == "a b")
    assert(r.getAs[String]("k3") == "")
  }

  test("unpack_syslog rfc3164 and rfc5424") {
    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("<34>Oct 11 22:14:15 mymachine su[123]: 'su root' failed"),
      Row("<165>1 2023-08-24T05:14:15.000003Z host.example app 1234 ID47 - An app event"))),
      schema)
    // unpacked fields land in the dynamic fields map (structured-data
    // keys make the set dynamic); field resolution reads through it
    val out = Compiler.run(df,
      """* | unpack_syslog from _msg
         | fields app_name, priority, severity, hostname, message, proc_id""",
      NOW).collect()
    val r3164 = out.find(_.getAs[String]("app_name") == "su").get
    assert(r3164.getAs[String]("priority") == "34")
    assert(r3164.getAs[String]("severity") == "2")
    assert(r3164.getAs[String]("hostname") == "mymachine")
    assert(r3164.getAs[String]("message") == "'su root' failed")
    val r5424 = out.find(_.getAs[String]("app_name") == "app").get
    assert(r5424.getAs[String]("hostname") == "host.example")
    assert(r5424.getAs[String]("proc_id") == "1234")
    assert(r5424.getAs[String]("message") == "An app event")
  }

  test("unpack_words / unroll") {
    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a b a"))), schema)
    val out = Compiler.run(df, "* | unpack_words from _msg as w", NOW)
    assert(out.collect().head.getAs[String]("w") == """["a","b","a"]""")
    val unrolled = Compiler.run(df, "* | unpack_words from _msg as w | unroll by (w)", NOW)
    assert(unrolled.count() == 3)
    // drop_duplicates keeps the first occurrence (pipe_unpack_words.go:104)
    val dd = Compiler.run(df,
      "* | unpack_words from _msg as w drop_duplicates", NOW)
    assert(dd.collect().head.getAs[String]("w") == """["a","b"]""")
  }

  test("pack_json / pack_logfmt") {
    val df = run("level:warn | fields level, host | pack_json as j")
    assert(df.collect().head.getAs[String]("j") == """{"level":"warn","host":"h2"}""")
    val df2 = run("level:warn | fields level, host | pack_logfmt as l")
    assert(df2.collect().head.getAs[String]("l") == "level=warn host=h2")
  }

  test("decolorize / collapse_nums") {
    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("\u001b[31mred\u001b[0m text"), Row("req 123 took 4.5ms from 1.2.3.4"))), schema)
    val out = Compiler.run(df, "* | decolorize", NOW).collect().map(_.getString(0))
    assert(out.contains("red text"))
    val cn = Compiler.run(df, "* | collapse_nums prettify", NOW).collect().map(_.getString(0))
    // "5ms" collapses ('m' is a special END rune, pipe_collapse_nums.go
    // isSpecialEndNumRune) and prettify tokens are uppercase (<IP4>)
    assert(cn.contains("req <N> took <N>.<N>ms from <IP4>"), cn.mkString("|"))
  }

  test("join pipe") {
    val df = run("* | join by (host) (level:error | stats by (host) count() errs)")
    val r = df.filter("host = 'h1'").collect()
    assert(r.forall(_.getAs[Long]("errs") == 1L))
    val inner = run("* | join by (host) (level:error | stats by (host) count() errs) inner")
    assert(inner.count() == 4) // h3 rows dropped
  }

  test("union pipe") {
    assert(run("level:error | union (level:warn)").count() == 3)
  }

  test("facets pipe") {
    val df = run("* | facets 2")
    assert(df.filter("field_name = 'level'").count() == 2)
  }

  test("facets drops constant fields unless keep_const_fields") {
    val schema = StructType(Seq(
      StructField("_msg", StringType), StructField("env", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", "prod"), Row("b", "prod"), Row("c", "prod")), 2), schema)
    val names = Compiler.run(df, "* | facets 5", NOW)
      .select("field_name").distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("_msg")) // env is constant → dropped
    val kept = Compiler.run(df, "* | facets 5 keep_const_fields", NOW)
      .select("field_name").distinct().collect().map(_.getString(0)).toSet
    assert(kept == Set("_msg", "env"))
  }

  test("sample pipe returns subset") {
    val n = run("* | sample 2").count()
    assert(n <= 5)
  }

  test("stats rate with time filter") {
    val r = run("_time:[2023-12-31, 2024-01-01) | stats rate() r").collect().head
    assert(math.abs(r.getDouble(0) - 5.0 / 86400) < 1e-12)
  }

  test("replace / replace_regexp honor limit N") {
    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a.b.c.d"), Row("x"))), schema)
    def one(q: String): Seq[String] =
      Compiler.run(df, q, NOW).collect().map(_.getString(0)).toSeq.sorted
    assert(one("""* | replace (".", "-") at _msg limit 2""") == Seq("a-b-c.d", "x"))
    assert(one("""* | replace (".", "-") at _msg""") == Seq("a-b-c-d", "x"))
    assert(one("""* | replace_regexp ("\\.", "-") at _msg limit 1""") == Seq("a-b.c.d", "x"))
  }

  test("exact filter coerces numerics on typed columns") {
    val schema = StructType(Seq(StructField("val", DoubleType), StructField("_msg", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(100d, "a"), Row(100.5, "b"))), schema)
    assert(Compiler.run(df, "val:=100", NOW).count() == 1)
    assert(Compiler.run(df, "val:=100.5", NOW).count() == 1)
  }

  test("eq_field is numeric-aware") {
    val schema = StructType(Seq(
      StructField("a", DoubleType), StructField("b", LongType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(100d, 100L), Row(2.5, 2L))), schema)
    assert(Compiler.run(df, "a:eq_field(b)", NOW).count() == 1)
  }

  test("count_uniq honors limit cap") {
    val r = run("* | stats count_uniq(host) limit 2 c").collect().head
    assert(r.getLong(0) == 2L) // 3 hosts capped at 2
  }

  test("sort rank without limit uses distributed zip rank") {
    val df = run("* | sort by (level, _msg) rank as r | fields level, r")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // plan must not contain a partition-less Window
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("sort rank with limit is bounded then ranked") {
    val df = run("* | sort by (_msg) limit 2 rank as r | fields _msg, r")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(rows.length == 2 && rows.head._2 == 1L)
  }

  test("sort rank followed by a rank bound fuses into bounded top-k") {
    // `sort … rank r | where r:<=k` is top-k written in two pipes — the
    // peephole must route it through the bounded path (global sort + limit,
    // no full-relation zipWithIndex); the where still filters correctly
    val df = run("* | sort by (_msg) rank as r | where r:<=2 | fields _msg, r")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(rows.length == 2 && rows.map(_._2).toSeq == Seq(1L, 2L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // offset composes: ranks 2..3 of 5 rows
    val off = run("* | sort by (_msg) offset 1 rank as r | where r:<=3 | fields r")
      .collect().map(_.getLong(0)).sorted
    assert(off.toSeq == Seq(2L, 3L))
  }

  test("histogram vmrange bucket strings match the reference format") {
    import graft.functions.VmHistogram
    assert(VmHistogram.lowerBucketRange == "0...1.000e-09")
    assert(VmHistogram.upperBucketRange == "1.000e+18...+Inf")
    assert(VmHistogram.bucketRanges(0) == "1.000e-09...1.136e-09")
    // 10^n edge values go to the bucket ENDING at 10^n
    assert(VmHistogram.bucketRanges(VmHistogram.slotOf(1.0) - 1).endsWith("...1.000e+00"))
    assert(VmHistogram.slotOf(0.0) == 0)     // lower
    assert(VmHistogram.slotOf(1e19) == 487)  // upper
    assert(VmHistogram.slotOf(-1.0) == -1)   // skipped
  }

  test("histogram aggregates per group and renders JSON") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", "1"), Row("a", "1"), Row("a", "150"), Row("b", "nope")), 2), schema)
    val out = Compiler.run(df, "* | stats by (g) histogram(v) h | sort by (g)", NOW)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val aH = out.find(_._1 == "a").get._2
    assert(aH.contains("\"hits\":2")) // two 1s in one bucket
    assert(aH.startsWith("[{\"vmrange\":\""))
    // group with no parseable values renders the reference's empty form
    assert(out.find(_._1 == "b").get._2 == "]")
  }

  test("lessNatural orders digit runs numerically") {
    import graft.functions.VmHistogram.lessNatural
    assert(lessNatural("2", "10"))
    assert(lessNatural("1.000e+00...", "9.095e-13..."))
    assert(!lessNatural("10", "9"))
    assert(lessNatural("abc", "abd"))
  }

  test("values/uniq_values with limit cap accumulation") {
    val uv = run("* | stats uniq_values(level) limit 10 u").collect().head
      .getAs[scala.collection.Seq[String]](0)
    assert(uv.toSeq == Seq("error", "info", "warn")) // sorted, under cap
    val uv2 = run("* | stats uniq_values(level) limit 2 u").collect().head
      .getAs[scala.collection.Seq[String]](0)
    assert(uv2.size == 2)
    val vs = run("* | stats values(level) limit 3 v").collect().head
      .getAs[scala.collection.Seq[String]](0)
    assert(vs.size == 3)
  }

  test("in(subquery) materializes values") {
    // hosts that have an error → h1, h2 → 4 rows total
    assert(run("host:in(level:error | fields host)").count() == 4)
    // numeric column through subquery
    assert(run("v:in(level:error | fields v)").count() == 2)
  }

  test("top-level in(subquery) is a semi-join, no driver materialization") {
    val df = run("host:in(level:error | fields host)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // composes with other conjuncts and pipes
    val both = run("level:info host:in(level:error | fields host) | stats count() c")
    assert(both.collect().head.getLong(0) == 1) // only h1's info row
    // under or/not it still takes the literal-values path (no semi-join)
    val orPlan = run("level:fatal or host:in(level:error | fields host)")
    assert(!orPlan.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(orPlan.count() == 4)
  }

  test("field_names and facets see the fields map") {
    val schema = StructType(Seq(
      StructField("_msg", StringType),
      StructField("fields", MapType(StringType, StringType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("m1", Map("app" -> "web", "lvl" -> "info")),
      Row("m2", Map("app" -> "api", "empty" -> ""))), 2), schema)
    val names = Compiler.run(df, "* | field_names", NOW)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(names("app") == 2 && names("lvl") == 1 && names("_msg") == 2)
    assert(!names.contains("empty") && !names.contains("fields"))
    val facets = Compiler.run(df, "* | facets 5", NOW)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(facets.contains(("app", "web")) && facets.contains(("lvl", "info")))
  }

  test("conditional replace / replace_regexp / collapse_nums") {
    val schema = StructType(Seq(
      StructField("lvl", StringType), StructField("m", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("admin", "x 42 y"), Row("user", "x 42 y"))), schema)
    // pipe_replace.go:88-96 / pipe_collapse_nums.go:89-97: rows failing
    // the if keep their original value
    def vals(q: String): Set[(String, String)] =
      Compiler.run(df, q, NOW).collect()
        .map(r => (r.getAs[String]("lvl"), r.getAs[String]("m"))).toSet
    assert(vals("""* | replace if (lvl:=admin) ("42", "NN") at m""")
      == Set(("admin", "x NN y"), ("user", "x 42 y")))
    assert(vals("""* | replace_regexp if (lvl:=admin) ("\\d+", "D") at m""")
      == Set(("admin", "x D y"), ("user", "x 42 y")))
    assert(vals("""* | collapse_nums if (lvl:=admin) at m""")
      == Set(("admin", "x <N> y"), ("user", "x 42 y")))
  }

  test("format ipv4/hexnum render valid values, pass raw otherwise") {
    val schema = StructType(Seq(StructField("n", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("3232235777"), Row("0"), Row("4294967296"), Row("-5"), Row("x"))), schema)
    // pipe_format.go:220-226: uint32 renders dotted quad, else raw
    val ip = Compiler.run(df, """* | format "<ipv4:n>" as d""", NOW)
      .collect().map(_.getAs[String]("d")).toSet
    assert(ip == Set("192.168.1.1", "0.0.0.0", "4294967296", "-5", "x"), ip)
    // hexnumencode: 16-char zero-padded; non-numeric raw
    val he = Compiler.run(df, """* | format "<hexnumencode:n>" as d""", NOW)
      .collect().map(_.getAs[String]("d")).toSet
    assert(he.contains("00000000C0A80101") && he.contains("x") &&
      he.contains("-5") && he.contains("0000000000000000"), he)
    // hexnumdecode: <=16 hex chars -> decimal, else raw
    val schema2 = StructType(Seq(StructField("n", StringType)))
    val df2 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("ff"), Row(""), Row("zz"), Row("11112222333344445"))), schema2)
    val hd = Compiler.run(df2, """* | format "<hexnumdecode:n>" as d""", NOW)
      .collect().map(_.getAs[String]("d")).toSet
    assert(hd == Set("255", "0", "zz", "11112222333344445"), hd)
  }

  test("format duration humanizes nanoseconds") {
    val schema = StructType(Seq(StructField("ns", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("90500000000"), Row("0"), Row("1234567"), Row("3600000000000"), Row("oops"))), schema)
    val out = Compiler.run(df, """* | format "<duration:ns>" as d""", NOW)
      .collect().map(_.getAs[String]("d")).toSeq.sorted
    assert(out.contains("1m30.5s"))
    assert(out.contains("0"))
    assert(out.contains("1ms234µs567ns"))
    assert(out.contains("1h"))
    assert(out.contains("oops"))
  }

  test("unpack_syslog offset renders RFC3164 timestamps in the fixed zone") {
    val schema = StructType(Seq(StructField("_msg", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("<13>Jan  5 10:11:12 host2 cron[123]: scheduled run"))), schema)
    val out = Compiler.run(df, "* | unpack_syslog offset 5h30m | fields timestamp", NOW)
      .collect().head.getString(0)
    val year = java.time.Year.now(java.time.ZoneOffset.UTC).getValue
    assert(out == s"$year-01-05T10:11:12.000+05:30")
    // without offset the timestamp converts in UTC (syslog_parser.go
    // GetSyslogParser default zone; millisecond ISO8601 rendering)
    val utc = Compiler.run(df, "* | unpack_syslog | fields timestamp", NOW)
      .collect().head.getString(0)
    assert(utc == s"$year-01-05T10:11:12.000Z")
  }

  test("math operands auto-parse durations, hex, byte sizes, ipv4") {
    val schema = StructType(Seq(
      StructField("dur", StringType), StructField("hexv", StringType),
      StructField("sz", StringType), StructField("addr", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("1h30m", "0xff", "2KiB", "1.2.3.4"),
      Row("5s", "0x10", "1MB", "10.0.0.1"),
      Row("nope", "zz", "x", "999.1.1.1"))), schema)
    val out = Compiler.run(df,
      "* | math dur / 1000000000 as secs, hexv + 0 as h, sz + 0 as b, addr + 0 as ip", NOW)
      .select("secs", "h", "b", "ip").collect()
      .map(r => (0 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Double])).toList)
    assert(out.contains(List[Option[Double]](Some(5400d), Some(255d), Some(2048d),
      Some((1L << 24) * 1d + (2L << 16) + (3L << 8) + 4))))
    assert(out.contains(List[Option[Double]](Some(5d), Some(16d), Some(1e6),
      Some((10L << 24) * 1d + 1))))
    // unparseable operands are NaN, never null (parseMathNumber);
    // NaN != NaN, so compare with isNaN
    assert(out.exists(row => row.forall(_.exists(_.isNaN))), out.mkString("|"))
  }

  test("ipv4 parse expression: valid quads only") {
    val schema = StructType(Seq(StructField("ip", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("0.0.0.0"), Row("255.255.255.255"), Row("1.2.3.256"), Row("1.2.3"),
      Row("01.2.3.4"), Row("1.2.3.4.5"), Row("a.b.c.d"), Row("10.20.30.40"))), schema)
    val out = df.select(graft.functions.Ipv4Parse.ipv4ToLong(col("ip")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out == Seq(Some(0L), Some(4294967295L), None, None, None, None, None,
      Some((10L << 24) + (20L << 16) + (30L << 8) + 40L)))
  }

  test("stream_context without _stream_id fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Compiler.run(logs, "error | stream_context before 1", NOW).collect()
    }
    assert(e.getMessage.contains("_stream_id"))
  }

  test("facets const-drop plan has no partition-less window") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("constant", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      (1 to 50).map(i => Row(s"v${i % 5}", "same"))), schema)
    val out = Compiler.run(df, "* | facets 3", NOW)
    // string check (typed collect can't traverse the AQE wrapper): a
    // partitioned Window prints "[funcs], [partition], [order]" — three
    // bracket groups; the old partition-less const-drop window had two
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    // every Window must be PARTITIONED by field_name (the unique-count
    // window has no ORDER BY, which is fine — the funnel smell is a
    // missing partition spec, not a missing ordering)
    assert(windowLines.nonEmpty &&
      windowLines.forall(_.contains("windowspecdefinition(field_name")), plan)
    // the constant field is dropped, the varying one kept
    val fields = out.collect().map(_.getString(0)).toSet
    assert(fields == Set("k"))
  }

  test("range comparison with string operands desugars to string_range") {
    // hosts are h1,h1,h2,h2,h3
    assert(run("host:<h2 | stats count() c").collect().head.getLong(0) == 2)
    assert(run("host:>=h2 | stats count() c").collect().head.getLong(0) == 3)
    assert(run("host:<=h1 | stats count() c").collect().head.getLong(0) == 2)
    assert(run("host:>h3 | stats count() c").collect().head.getLong(0) == 0)
    assert(run("""host:<"h2" | stats count() c""").collect().head.getLong(0) == 2)
    // numeric operands keep numeric range semantics
    assert(run("v:>=7 | stats count() c").collect().head.getLong(0) == 2)
  }

  test("contains_all / contains_any accept subqueries") {
    // subquery yields the two error-row messages; contains_any over _msg
    // matches exactly those rows
    assert(msgs("_msg:contains_any(level:error | fields _msg)") ==
      Seq("connection error from db", "disk error: no space"))
    // contains_all with a one-value subquery behaves like a phrase filter
    assert(msgs("_msg:contains_all(level:warn | fields _msg)") ==
      Seq("errors piling up"))
    // empty subquery result: any → nothing, all → everything
    assert(msgs("_msg:contains_any(level:nosuch | fields _msg)").isEmpty)
    assert(msgs("_msg:contains_all(level:nosuch | fields _msg)").size == 5)
  }

  test("contains_any large word sets use tokenized membership") {
    val vals = (1 to 70).map(i => s"w$i") :+ "error"
    val q = s"_msg:contains_any(${vals.mkString(", ")})"
    assert(msgs(q) == Seq("connection error from db", "disk error: no space"))
    val allq = s"_msg:contains_all(error, db)"
    assert(msgs(allq) == Seq("connection error from db"))
  }

  // ---- v1.24 wildcard field filters (prefixfilter; CHANGELOG v1.24.0) ----

  lazy val wildDf: DataFrame = {
    val schema = StructType(Seq(
      StructField("k", StringType),
      StructField("x_a", DoubleType),
      StructField("x_b", StringType),
      StructField("fields", MapType(StringType, StringType))))
    val rows = Seq(
      Row("a", 1.0, "2", Map("x_c" -> "3", "y" -> "9")),
      Row("b", 4.0, "bad", Map("x_d" -> "6", "x_e" -> "", "z" -> "7")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("wildcard stats: numeric funcs over matching cols and map keys") {
    val r = run("* | stats sum(x_*) as s, avg(x_*) as a, count(x_*) as c, " +
      "count_empty(x_*) as ce, sum_len(x_*) as sl, median(x_*) as md", wildDf)
      .collect().head
    assert(r.getDouble(0) == 16.0)           // 1+2+3+4+6
    assert(math.abs(r.getDouble(1) - 3.2) < 1e-9)
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 0L)
    assert(r.getLong(4) == 12L)              // bytes across all values
    assert(r.getString(5) == "4.0")          // nearest-rank element
  }

  test("wildcard sum over a group with no parseable values is NaN, not 0") {
    // group "a" has numeric x_* values, group "n" has none — its sum is
    // NaN (the reference's accumulator init, stats_sum.go), never 0
    val schema = StructType(Seq(
      StructField("k", StringType),
      StructField("x_a", StringType)))
    val rows = Seq(Row("a", "2"), Row("a", "3"), Row("n", "notnum"))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = run("* | stats by (k) sum(x_*) as s | sort by (k)", d).collect()
    assert(out(0).getDouble(1) == 5.0)
    assert(out(1).getDouble(1).isNaN)
  }

  test("wildcard stats: min/max use value collation, values/uniq_values flatten") {
    val r = run("* | stats min(x_*) as mn, max(x_*) as mx, " +
      "uniq_values(x_*) as uv", wildDf).collect().head
    // wildcards see only EXISTING values (the block model materializes
    // no empties for pattern matches), so "" cannot win min
    assert(r.getString(0) == "1.0", r.getString(0))
    assert(r.getString(1) == "bad")          // strings above numbers
    assert(r.getSeq[String](2) == Seq("1.0", "2", "3", "4.0", "6", "bad"))
  }

  test("row_any/row_max field filters limit the returned JSON") {
    val r = run("* | stats row_max(x_a, x_*) as r", wildDf).collect().head
    // row JSON omits empty values (the block model never stores them)
    assert(r.getString(0) == """{"x_a":"4.0","x_b":"bad","x_d":"6"}""")
    val ra = run("* | stats by (k) row_any(x_b, x_c) as r | sort by (k)", wildDf)
      .collect().map(_.getString(1)).toSeq
    assert(ra == Seq("""{"x_b":"2","x_c":"3"}""", """{"x_b":"bad"}"""))
  }

  test("copy/rename prefix* rewrites top-level columns and map keys") {
    val c = run("* | copy x_* as cp_*", wildDf)
    assert(c.columns.toSet.contains("cp_a") && c.columns.toSet.contains("cp_b"))
    val cm = c.filter(col("k") === "a").select("fields").collect().head
      .getMap[String, String](0)
    assert(cm("cp_c") == "3" && cm("x_c") == "3" && cm("y") == "9")
    val r = run("* | rename x_* as rn_*", wildDf)
    assert(!r.columns.exists(_.startsWith("x_")))
    val rm = r.filter(col("k") === "b").select("fields").collect().head
      .getMap[String, String](0)
    assert(rm.keySet == Set("z", "rn_d", "rn_e"))
  }

  test("copy with an overlapping dst prefix reads all sources pre-copy") {
    import org.apache.spark.sql.functions.lit
    val d = wildDf.select(col("k"), col("x_a"), lit("orig").as("x_ba"))
    val out = run("* | copy x_* as x_b*", d)
    val r = out.filter(col("k") === "a").collect().head
    // x_a → x_ba (overwrites), x_ba → x_bba (from the ORIGINAL value)
    assert(r.getAs[Any]("x_ba") == 1.0)
    assert(r.getAs[String]("x_bba") == "orig")
  }

  test("unpack_json fields (prefix*) unpacks only matching keys") {
    val out = run("""* | fields k | format '{"ma":"1","mb":"2","nb":"3"}' as j """ +
      "| unpack_json from j fields (m*)", wildDf)
      .filter(col("k") === "a").select("fields").collect().head
      .getMap[String, String](0)
    assert(out == Map("ma" -> "1", "mb" -> "2"))
  }

  test("unpack from a source that is also a plain target: wildcards see the pre-unpack row") {
    // `from j fields (j, m*)` overwrites the source column itself; the
    // wildcard merge must still parse the ORIGINAL j, not the torn frame
    val out = run("""* | fields k | format '{"j":"inner","ma":"1"}' as j """ +
      "| unpack_json from j fields (j, m*)", wildDf)
      .filter(col("k") === "a").select("j", "fields").collect().head
    assert(out.getString(0) == "inner")
    assert(out.getMap[String, String](1) == Map("ma" -> "1"))
  }

  test("unpack_json options: keep_original_fields, skip_empty_results, if") {
    import spark.implicits._
    val d = Seq(
      ("a", """{"x":"new","y":""}""", "old", "keep"),
      ("b", """{"x":"n2","y":"v2"}""", "", "keep"))
      .toDF("k", "j", "x", "y")
    // default: unpacked overwrites
    val d0 = Compiler.run(d, "* | unpack_json from j fields (x)")
    assert(d0.orderBy("k").collect().map(_.getAs[String]("x")).toSeq ==
      Seq("new", "n2"))
    // keep_original_fields: non-empty existing wins
    val d1 = Compiler.run(d, "* | unpack_json from j fields (x) keep_original_fields")
    assert(d1.orderBy("k").collect().map(_.getAs[String]("x")).toSeq ==
      Seq("old", "n2"))
    // skip_empty_results: empty unpacked value never clears an existing one
    val d2 = Compiler.run(d, "* | unpack_json from j fields (y) skip_empty_results")
    assert(d2.orderBy("k").collect().map(_.getAs[String]("y")).toSeq ==
      Seq("keep", "v2"))
    // if (...): non-matching rows pass through unchanged
    val d3 = Compiler.run(d, "* | unpack_json if (k:a) from j fields (x)")
    assert(d3.orderBy("k").collect().map(_.getAs[String]("x")).toSeq ==
      Seq("new", ""))
    // merge-into-map path honors the same options
    val d4 = Compiler.run(d.drop("x", "y"),
      "* | unpack_json from j skip_empty_results")
    val m = d4.filter(col("k") === "a").select("fields").collect().head
      .getMap[String, String](0)
    assert(m == Map("x" -> "new"))
  }

  test("options (...) clause parses and is recorded on the query") {
    val q = Parser.parse(
      "options (concurrency=4, ignore_global_time_filter=true) error | stats count() c", NOW)
    assert(q.options == Map("concurrency" -> "4",
      "ignore_global_time_filter" -> "true"))
    // the `options` keyword commits unconditionally (parseQueryOptions,
    // parser.go:1342): searching for the literal word requires quotes,
    // and a paren group after it is a malformed clause, not a filter
    intercept[ParseException](Parser.parse("options | stats count() c", NOW))
    intercept[ParseException](
      Parser.parse("options (error or warn) | stats count() c", NOW))
    assert(run("\"options\" | stats count() c").collect().head.getLong(0) == 0)
    // unknown keys in a committed options clause fail loudly
    intercept[ParseException](
      Parser.parse("options (concurrencyy=4) * | stats count() c", NOW))
  }

  test("malformed inputs are parse errors, not runtime 500s") {
    // multi-dot "numbers" with a size/duration suffix used to throw raw
    // NumberFormatException; they now fall back to the string-range filter
    // (the reference's semantics for a non-numeric `>value`)
    assert(Parser.parse("v:>1..2k | stats count() c", NOW)
      .filter.isInstanceOf[Filter.StringRange])
    assert(Parser.parse("v:>1..2h | stats count() c", NOW)
      .filter.isInstanceOf[Filter.StringRange])
    // CIDR bits > 32 used to silently match the whole IPv4 space
    intercept[ParseException](Parser.parse("ip:ipv4_range(10.0.0.0/40)", NOW))
    intercept[ParseException](Parser.parse("ip:ipv4_range(10.0.0.0/x)", NOW))
    intercept[ParseException](Parser.parse("ip:ipv4_range(1.2.3.999)", NOW))
    // empty-arg stats/filter functions used to NoSuchElementException
    // (`sum()` is now valid — it means sum(*) like the reference)
    intercept[ParseException](Parser.parse("* | stats quantile() q", NOW))
    intercept[ParseException](Parser.parse("* | stats histogram() h", NOW))
    intercept[ParseException](Parser.parse("* | stats row_min() m", NOW))
    intercept[ParseException](Parser.parse("v:value_type()", NOW))
    // zero/sub-microsecond buckets used to null-collapse every group
    intercept[ParseException](run("* | stats by (_time:500ns) count() c").collect())
    intercept[ParseException](run("* | stats by (v:0) count() c").collect())
    // day_range with a non-numeric HH:MM
    intercept[ParseException](Parser.parse("_time:day_range[aa:bb, 18:00]", NOW))
  }

  test("limits past Int range clamp instead of wrapping") {
    // 5e9.toInt wraps negative; the pipe must keep all rows instead
    assert(run("* | limit 5000000000").count() == 5)
    assert(run("* | sort by (v) rank as r | where r:<=5000000000").count() == 5)
  }

  test("_time filter offset shifts the window back") {
    // rows span 2023-12-31T10:00..18:00; NOW is 2024-01-01T00:00.
    // last-6h window offset by 12h => [2023-12-31T06:00, 12:00) → 2 rows
    assert(run("_time:6h offset 12h | stats count() c")
      .collect().head.getLong(0) == 2)
    // explicit range shifted the same way
    assert(run("_time:[2024-01-01T10:00:00Z, 2024-01-01T12:00:00Z) offset 1d | stats count() c")
      .collect().head.getLong(0) == 2)
    // offset demands a duration
    intercept[ParseException](Parser.parse("_time:5m offset banana", NOW))
  }

  test("in(subquery) and its negation stay complementary on numeric strings") {
    // v holds "10", "2.5", "7", "n/a", "": subquery yields 10.0 (double
    // rendering); canonicalization must make both paths agree
    import spark.implicits._
    val sel = run("v:in(v:10 | fields v)").count()
    val nsel = run("not v:in(v:10 | fields v)").count()
    assert(sel + nsel == 5, s"in=$sel not-in=$nsel")
    assert(sel == 1)
  }

  test("join by a fields-map key resolves like every other field access") {
    val schema = StructType(Seq(
      StructField("_msg", StringType),
      StructField("fields", MapType(StringType, StringType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("m1", Map("req" -> "a", "v" -> "1")),
      Row("m2", Map("req" -> "b", "v" -> "2"))), 2), schema)
    // subquery output carries req as a real column; left side has it only
    // in the map — used to throw AnalysisException (USING column not found)
    val out = Compiler.run(df,
      """* | join by (req) (* | fields req, v | rename v as vv) inner""", NOW)
      .collect().map(r => r.getAs[String]("req") -> r.getAs[String]("vv")).toMap
    assert(out == Map("a" -> "1", "b" -> "2"))
  }

  test("fields/delete wildcards cover fields-map entries") {
    val schema = StructType(Seq(
      StructField("_msg", StringType),
      StructField("app_x", StringType),
      StructField("fields", MapType(StringType, StringType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("m1", "top", Map("app_y" -> "mapval", "secret_k" -> "s1", "keep" -> "ok"))), 1), schema)
    // `fields app*` keeps the top-level column AND the matching map entry
    val kept = Compiler.run(df, "* | fields app*", NOW).collect().head
    assert(kept.getAs[String]("app_x") == "top")
    assert(kept.getAs[Map[String, String]]("fields") == Map("app_y" -> "mapval"))
    // `delete secret*` removes the map entry; exact map-key delete works too
    val del = Compiler.run(df, "* | delete secret*, keep", NOW).collect().head
    assert(del.getAs[Map[String, String]]("fields") == Map("app_y" -> "mapval"))
    // deleted map keys read as missing ("") afterwards
    val gone = Compiler.run(df,
      "* | delete secret* | len(secret_k) as l", NOW).collect().head
    assert(gone.getAs[Long]("l") == 0L)
  }

  test("extract_regexp counts groups past character-class parens correctly") {
    import spark.implicits._
    val d = Seq(("x", "(42) rest")).toDF("k", "_msg")
    val out = Compiler.run(d,
      """* | extract_regexp "[(](?<n>\d+)[)]" from _msg""", NOW).collect().head
    assert(out.getAs[String]("n") == "42")
    intercept[ParseException](Compiler.run(d,
      """* | extract_regexp "(?<broken" from _msg""", NOW))
  }

  test("unpack if-condition is judged once against the pre-unpack row") {
    import spark.implicits._
    val d = Seq(("a", """{"x":"new","y":"v2"}""", "old", ""))
      .toDF("k", "j", "x", "y")
    // the condition reads x, which the unpack itself overwrites: both
    // targets must still be written (no torn rows)
    val out = Compiler.run(d, "* | unpack_json if (x:old) from j fields (x, y)")
      .collect().head
    assert(out.getAs[String]("x") == "new")
    assert(out.getAs[String]("y") == "v2")
  }

  test("extract if-condition is judged once against the pre-extract row") {
    import spark.implicits._
    val d = Seq(("x=1 y=2", "x", "")).toDF("m", "x", "y")
    // the condition reads x, which the extract overwrites — both captures
    // must be written (no torn rows), same contract as the unpack pipes
    val out = Compiler.run(d, "* | extract if (x:=x) 'x=<x> y=<y>' from m")
      .collect().head
    assert(out.getAs[String]("x") == "1")
    assert(out.getAs[String]("y") == "2")
  }

  test("merge-path unpack writes through to string top-level columns") {
    import spark.implicits._
    val d = Seq(("a", """{"x":"new","z":"zz"}""", ""))
      .toDF("k", "j", "x")
    val out = Compiler.run(d, "* | unpack_json from j")
    val r = out.collect().head
    // x exists as a top-level string column: the unpacked value must be
    // visible through the column (reads prefer columns over map entries)
    assert(r.getAs[String]("x") == "new")
    assert(r.getMap[String, String](r.fieldIndex("fields")) == Map("z" -> "zz"))
  }

  test("format <time:...> auto-detects unix timestamp units, RFC3339Nano output") {
    import spark.implicits._
    val t = Seq(("1718236800", "1718236800123", "1718236800123456",
      "1718236800123456789", "1718236800.5", "junk"))
      .toDF("s", "ms", "us", "ns", "fs", "bad")
    val out = Compiler.run(t,
      "* | format '<time:s>|<time:ms>|<time:us>|<time:ns>|<time:fs>|<time:bad>' as o | fields o")
      .collect().head.getString(0)
    assert(out == "2024-06-13T00:00:00Z|2024-06-13T00:00:00.123Z|" +
      "2024-06-13T00:00:00.123456Z|2024-06-13T00:00:00.123456789Z|" +
      "2024-06-13T00:00:00.5Z|junk")
  }

  test("every SparkEntry query runs without throwing (no silent drops)") {
    // a runtime-failing query must fail THIS suite rather than silently
    // vanish from the driver's CORRECTNESS report (Verify swallows throws)
    val sf = "/root/testdata/sf0.001"
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).limit(5).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
