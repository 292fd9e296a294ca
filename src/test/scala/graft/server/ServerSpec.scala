package graft.server

import graft.SparkSuite
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** Black-box HTTP API tests (apptest-style: real server, real requests —
  * reference apptest/tests/key_concepts_test.go). */
class ServerSpec extends SparkSuite {

  private lazy val (server, port) = {
    val src = graft.Tables.eventsLog(spark, "/root/testdata/sf0.001")
    val s = new QueryServer(spark, src)
    (s, s.start())
  }

  private def get(pathAndQuery: String): (Int, String) = {
    val url = new URI(s"http://127.0.0.1:$port$pathAndQuery").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, body)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8)

  test("tenant strings canonicalize like ParseTenantID (tenant_id_test.go:126)") {
    assert(QueryServer.canonTenant("") == "0:0")
    assert(QueryServer.canonTenant("123") == "123:0")
    assert(QueryServer.canonTenant("123:456") == "123:456")
    assert(QueryServer.canonTenant("123:") == "123:0")
    assert(QueryServer.canonTenant(":456") == "0:456")
    assert(QueryServer.canonTenant("007:08") == "7:8") // numeric, not octal
  }

  test("built-in query UI is served at /select/vmui") {
    val (code, body) = get("/select/vmui")
    assert(code == 200)
    assert(body.contains("<!doctype html>") &&
      body.contains("/select/logsql/query"))
  }

  test("query endpoint streams NDJSON rows") {
    val (code, body) = get(s"/select/logsql/query?query=${enc("event_type:purchase | fields event_id, event_type")}&limit=5")
    assert(code == 200)
    val lines = body.trim.split("\n")
    assert(lines.length == 5)
    assert(lines.forall(l => l.startsWith("{") && l.contains("\"event_type\":\"purchase\"")))
  }

  test("NDJSON rows use the reference field model: all-string values, Go floats") {
    // MarshalFieldsToJSON (rows.go:144-162): every value is a JSON
    // STRING; floats render Go-style ("5" not 5.0, "+Inf"); _stream is
    // its label string, not a nested object; empty values are skipped
    val (c1, b1) = get(s"/select/logsql/query?query=${enc("* | fields event_id, value")}&limit=1")
    assert(c1 == 200)
    assert("""\"event_id\":\"\d+\"""".r.findFirstIn(b1).isDefined, b1)
    assert(""""value":"[\d.]+"""".r.findFirstIn(b1).isDefined, b1)
    val (c2, b2) = get(s"/select/logsql/query?query=${enc("* | math (0/0) default 5 as r, 1/0 as inf | fields r, inf")}&limit=1")
    assert(c2 == 200)
    assert(b2.contains(""""r":"5""""), b2) // NaN replaced by default; no ".0"
    assert(b2.contains(""""inf":"+Inf""""), b2)
    // stats values are strings too
    val (c3, b3) = get(s"/select/logsql/query?query=${enc("* | stats count() c")}")
    assert(c3 == 200 && """"c":"\d+"""".r.findFirstIn(b3).isDefined, b3)
  }

  test("extra_filters scope the query and its subqueries") {
    def count(params: String): Long = {
      val (code, body) = get(
        s"/select/logsql/query?query=${enc("* | stats count() c")}$params")
      assert(code == 200, body)
      """"c":"?(\d+)""".r.findFirstMatchIn(body).get.group(1).toLong
    }
    val all = count("")
    // raw LogsQL form
    val purch = count(s"&extra_filters=${enc("event_type:=purchase")}")
    assert(purch > 0 && purch < all)
    // JSON shorthand: {"field":"value"} → exact filter
    assert(count(s"&extra_filters=${enc("""{"event_type":"purchase"}""")}") == purch)
    // JSON array → in(); two types is strictly between one and all
    val two = count(s"&extra_filters=${enc("""{"event_type":["purchase","view"]}""")}")
    assert(two > purch && two < all)
    // stream variant compiles to label matchers over the same promoted col
    assert(count(s"&extra_stream_filters=${enc("""{"event_type":"purchase"}""")}") == purch)
    // the conjunct reaches in(subquery) sources too (parser.go:567-576):
    // with the subquery restricted to purchase rows, ids collected from
    // view rows vanish — the count equals the purchase-only intersection
    val subQ = "event_id:in(* | fields event_id) | stats count() c"
    val subAll = {
      val (c, b) = get(s"/select/logsql/query?query=${enc(subQ)}")
      assert(c == 200, b)
      """"c":"?(\d+)""".r.findFirstMatchIn(b).get.group(1).toLong
    }
    assert(subAll == all)
    val (c2, b2) = get(s"/select/logsql/query?query=${enc(subQ)}" +
      s"&extra_filters=${enc("event_type:=purchase")}")
    assert(c2 == 200, b2)
    val subPurch = """"c":"?(\d+)""".r.findFirstMatchIn(b2).get.group(1).toLong
    assert(subPurch == purch, s"subquery not scoped: $subPurch vs $purch")
  }

  test("hits fields_limit folds the tail series into an other bucket") {
    val (code, body) = get(
      s"/select/logsql/hits?query=${enc("*")}&step=1d&field=event_type&fields_limit=2")
    assert(code == 200)
    // 5 event types → 2 named series + the folded {} series
    val fieldObjs = """"fields":(\{[^}]*\})""".r.findAllMatchIn(body).map(_.group(1)).toSeq
    assert(fieldObjs.length == 3, body.take(300))
    assert(fieldObjs.count(_ == "{}") == 1)
    // grand total preserved across the fold
    val totals = """"total":(\d+)""".r.findAllMatchIn(body).map(_.group(1).toLong).toSeq
    assert(totals.sum == 1000)
  }

  test("hits endpoint returns count-by-time series") {
    val (code, body) = get(s"/select/logsql/hits?query=${enc("*")}&step=1d&field=event_type")
    assert(code == 200)
    assert(body.startsWith("""{"hits":["""))
    assert(body.contains(""""fields":{"event_type":"purchase"}"""))
    assert(body.contains(""""timestamps":["""))
    assert(body.contains(""""total":"""))
  }

  test("facets endpoint returns per-field top values") {
    val (code, body) = get(s"/select/logsql/facets?query=${enc("* | fields event_type")}&limit=3")
    assert(code == 200)
    assert(body.contains(""""field_name":"event_type""""))
    assert(body.contains(""""hits":"""))
  }

  test("stats_query returns a Prometheus vector") {
    val (code, body) = get(
      s"/select/logsql/stats_query?query=${enc("* | stats by (event_type) count() hits")}&time=2024-02-01")
    assert(code == 200)
    assert(body.contains(""""resultType":"vector""""))
    assert(body.contains(""""__name__":"hits""""))
    assert(body.contains(""""event_type":"purchase""""))
  }

  test("stats_query_range groups by time step") {
    val (code, body) = get(
      s"/select/logsql/stats_query_range?query=${enc("* | stats count() hits")}&step=7d")
    assert(code == 200)
    assert(body.contains(""""resultType":"matrix""""))
    assert(body.contains(""""values":[["""))
  }

  test("stats_query accepts trailing pipes after stats (GetStatsByFields)") {
    // sort/limit after stats pass the gate (reference parser.go:782+);
    // the optimizer fuses `sort | limit` into the sort pipe
    val (code, body) = get(
      s"/select/logsql/stats_query?query=${
        enc("* | stats by (event_type) count() hits | sort by (hits) desc | limit 2")}&time=2024-02-01")
    assert(code == 200, body)
    assert(body.contains(""""__name__":"hits""""), body)
    // mv renames the label: the series must carry the NEW label name
    val (c2, b2) = get(
      s"/select/logsql/stats_query?query=${
        enc("* | stats by (event_type) count() hits | mv event_type as et")}&time=2024-02-01")
    assert(c2 == 200, b2)
    assert(b2.contains(""""et":"purchase""""), b2)
    // a pipe that breaks chartability is a 400, not a silent wrong answer
    val (c3, b3) = get(
      s"/select/logsql/stats_query?query=${
        enc("* | stats by (event_type) count() hits | delete event_type")}")
    assert(c3 == 400, b3)
  }

  test("stats_query_range rate() divides by the step, not the whole span") {
    // events span ~30 days; with step=1d each bucket's rate must be
    // bucket_count/86400 — the whole-span divisor would be ~30x smaller
    val (code, body) = get(
      s"/select/logsql/stats_query_range?query=${enc("* | stats count() hits, rate() rps")}&step=1d")
    assert(code == 200, body)
    // parse one bucket's hits and rps and check rps == hits/86400
    val hits = """"__name__":"hits".*?"values":\[\[([0-9.E]+),"([0-9.]+)"""".r
    val rps = """"__name__":"rps".*?"values":\[\[([0-9.E]+),"([0-9.eE+-]+)"""".r
    (hits.findFirstMatchIn(body), rps.findFirstMatchIn(body)) match {
      case (Some(h), Some(r)) =>
        assert(h.group(1) == r.group(1), "same first bucket")
        val expect = h.group(2).toDouble / 86400.0
        assert(math.abs(r.group(2).toDouble - expect) < 1e-9,
          s"rps ${r.group(2)} vs hits/86400 $expect")
      case other => fail(s"series not found: $other\n$body")
    }
  }

  test("field_names and field_values endpoints") {
    val (c1, names) = get(s"/select/logsql/field_names?query=${enc("*")}")
    assert(c1 == 200)
    assert(names.contains(""""value":"event_type""""))
    val (c2, values) = get(s"/select/logsql/field_values?query=${enc("*")}&field=event_type&limit=10")
    assert(c2 == 200)
    assert(values.contains(""""value":"purchase""""))
  }

  test("tail endpoint streams and terminates at max_polls") {
    val (code, body) = get(
      s"/select/logsql/tail?query=${enc("event_type:signup")}&refresh_interval=50&max_polls=2")
    assert(code == 200)
    val lines = body.trim.split("\n").filter(_.nonEmpty)
    assert(lines.nonEmpty && lines.forall(_.contains("signup")))
  }

  test("streams metadata endpoints over a store-backed server") {
    val dir = graft.store.LogStore.ensureFromEvents(spark, "/root/testdata/sf0.001")
    val s2 = new QueryServer(spark, graft.store.LogStore.read(spark, dir))
    val p2 = s2.start()
    def get2(pq: String): String = {
      val conn = new URI(s"http://127.0.0.1:$p2$pq").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      conn.disconnect(); body
    }
    try {
      val streams = get2(s"/select/logsql/streams?query=${enc("*")}")
      assert(streams.contains("""{event_type=\"purchase\"}"""))
      val ids = get2(s"/select/logsql/stream_ids?query=${enc("*")}")
      assert(ids.contains(""""hits":"""))
      val names = get2(s"/select/logsql/stream_field_names?query=${enc("*")}")
      assert(names.contains(""""value":"event_type""""))
      val vals = get2(s"/select/logsql/stream_field_values?query=${enc("*")}&field=event_type")
      assert(vals.contains(""""value":"signup""""))
    } finally s2.stop()
  }

  test("tenant headers scope queries to their partition") {
    val dir = graft.store.LogStore.ensureFromEvents(spark, "/root/testdata/sf0.001")
    val s2 = new QueryServer(spark, graft.store.LogStore.read(spark, dir))
    val p2 = s2.start()
    def getT(pq: String, acct: Option[String]): String = {
      val conn = new URI(s"http://127.0.0.1:$p2$pq").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      acct.foreach(a => conn.setRequestProperty("AccountID", a))
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      conn.disconnect(); body
    }
    try {
      val q = s"/select/logsql/query?query=${enc("* | stats count() c")}"
      // default tenant 0:0 holds the data; a foreign tenant sees nothing
      assert(getT(q, None).contains("\"c\":\"1000\""))
      assert(getT(q, Some("5")).contains("\"c\":\"0\""))
      assert(getT(q, Some("0")).contains("\"c\":\"1000\""))
    } finally s2.stop()
  }

  test("store-backed query?limit=N returns the newest N via day descent") {
    val dir = graft.store.LogStore.ensureFromEvents(spark, "/root/testdata/sf0.001")
    val s2 = new QueryServer(spark, () => graft.store.LogStore.read(spark, dir), 0,
      storeDir = Some(dir))
    val p2 = s2.start()
    try {
      val conn = new URI(s"http://127.0.0.1:$p2/select/logsql/query?query=${enc("*")}&limit=5")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      val daysScanned = conn.getHeaderField("X-Graft-Days-Scanned").toInt
      conn.disconnect()
      val lines = body.trim.split("\n")
      assert(lines.length == 5)
      // newest-first: timestamps strictly descend across the returned rows
      val times = lines.toSeq.map(l =>
        """"_time":"([^"]+)"""".r.findFirstMatchIn(l).get.group(1))
      assert(times == times.sortBy(identity).reverse, times)
      // and the newest row of the whole store is included (not arbitrary rows)
      val dayCount = new java.io.File(s"$dir/logs/tenant=0%3A0")
        .listFiles().count(_.getName.startsWith("_day="))
      assert(daysScanned < dayCount, s"scanned $daysScanned of $dayCount days")
    } finally s2.stop()
  }

  test("tenant lists read across tenants; single and headerless unchanged") {
    import spark.implicits._
    val dir = s"/root/repo/target/server_test/multitenant-${System.nanoTime()}"
    def mk(tenant: String, n: Int): Unit = {
      val lines = (1 to n).map(i =>
        s"""{"_time":"2024-01-0${i}T10:00:00Z","_msg":"row $i","app":"web"}""")
        .toDF("value")
      // appendBatch, not LogStore.ingest: the latter is the overwrite
      // initial-load path and would replace the previous tenants' data
      graft.streaming.Ingest.appendBatch(
        graft.streaming.Ingest.parseJsonline(lines), dir, Seq("app"), tenant = tenant)
    }
    mk("0:0", 3); mk("7:0", 2); mk("9:1", 4); mk("7:1", 1)
    val s2 = new QueryServer(spark, () => graft.store.LogStore.read(spark, dir), 0,
      storeDir = Some(dir))
    val p2 = s2.start()
    def getT(hs: Seq[(String, String)]): Long = {
      val conn = new URI(
        s"http://127.0.0.1:$p2/select/logsql/query?query=${enc("* | stats count() c")}")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      hs.foreach { case (k, v) => conn.addRequestProperty(k, v) }
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      conn.disconnect()
      """"c":"?(\d+)"?""".r.findFirstMatchIn(body).get.group(1).toLong
    }
    try {
      assert(getT(Nil) == 3)                                   // headerless → 0:0
      assert(getT(Seq("AccountID" -> "7")) == 2)               // single tenant
      assert(getT(Seq("AccountID" -> "0,7")) == 5)             // comma list
      assert(getT(Seq("AccountID" -> "0:0,9:1")) == 7)         // full pairs
      assert(getT(Seq("AccountID" -> "7,9", "ProjectID" -> "0,1")) == 6) // zip
      // a lone account fans out to every listed project (7:0 + 7:1)
      assert(getT(Seq("AccountID" -> "7", "ProjectID" -> "0,1")) == 3)
      // pre-paired entries don't shift the positional pairing of bare
      // accounts: 0:0 passes through, 7 and 9 pair with 1 and 1... i.e.
      // projects pair against BARE accounts only (0:0=3, 7:1=1, 9:1=4)
      assert(getT(Seq("AccountID" -> "0:0,7,9", "ProjectID" -> "1,1")) == 8)
      // unpairable surpluses on either side are loud client errors, not
      // silent drops or guesses (except the deliberate single fan-outs)
      def code(hs: Seq[(String, String)]): Int = {
        val conn = new URI(
          s"http://127.0.0.1:$p2/select/logsql/query?query=${enc("*")}")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        hs.foreach { case (k, v) => conn.addRequestProperty(k, v) }
        val c = conn.getResponseCode
        conn.disconnect()
        c
      }
      assert(code(Seq("AccountID" -> "7,9", "ProjectID" -> "0,1,2")) == 400)
      // 3 bare accounts for 2 projects: which project covers account 9 is
      // a guess — mirror case of surplus projects, same 400
      assert(code(Seq("AccountID" -> "7,8,9", "ProjectID" -> "0,1")) == 400)
    } finally s2.stop()
  }

  test("tail rejects non-streamable pipes with 400") {
    val (code, body) = get(
      s"/select/logsql/tail?query=${enc("* | stats count() c")}&max_polls=1")
    assert(code == 400, body)
    assert(body.contains("cannot tail"), body)
    // a pure filter/transform tail keeps streaming
    val (code2, body2) = get(
      s"/select/logsql/tail?query=${enc("event_type:purchase | fields event_id")}&max_polls=1")
    assert(code2 == 200)
    assert(body2.contains("\"event_id\""))
  }

  test("tail wildcard delete keeps deleting its other matches") {
    // `delete _*` covers _time (tracking) AND _msg (payload): the rewrite
    // must preserve time tracking while still deleting _msg
    val (code, body) = get(
      s"/select/logsql/tail?query=${enc("event_type:signup | delete _*")}&max_polls=1")
    assert(code == 200, body)
    val lines = body.trim.split("\n").filter(_.nonEmpty)
    assert(lines.nonEmpty && lines.forall(_.contains("\"event_id\"")))
    assert(lines.forall(l => !l.contains("\"_msg\"") && !l.contains("\"_time\"")), lines.head)
    // `delete *` leaves no time to track — clean 400, not a mid-stream error
    val (c2, b2) = get(
      s"/select/logsql/tail?query=${enc("* | delete *")}&max_polls=1")
    assert(c2 == 400, s"$c2 $b2")
  }

  test("malformed timeout arg rejects without leaking an admission slot") {
    // 20 bad requests > the 16-slot admission cap: if any leaked its
    // slot, the good request after them would 429 instead of 200
    (1 to 20).foreach { _ =>
      val (c, _) = get(s"/select/logsql/query?query=${enc("*")}&timeout=abc")
      assert(c == 400)
    }
    val (ok, _) = get(s"/select/logsql/query?query=${enc("* | stats count() c")}")
    assert(ok == 200)
  }

  test("time arg pins the evaluation timestamp for relative filters") {
    def cnt(extra: String): Long = {
      val (code, body) = get(
        s"/select/logsql/query?query=${enc("_time:1d | stats count() c")}$extra")
      assert(code == 200, body)
      """"c":"?(\d+)""".r.findFirstMatchIn(body).get.group(1).toLong
    }
    // pinned evaluation: reproducible across calls, matches the direct
    // compile at the same instant (minus the boundary nanosecond)
    val evalNs = java.time.Instant.parse("2024-01-06T00:00:00Z")
      .toEpochMilli * 1000000L - 1
    val want = graft.logql.Compiler.run(
      graft.Tables.eventsLog(spark, "/root/testdata/sf0.001"),
      graft.logql.Parser.parse("_time:1d | stats count() c", evalNs), evalNs)
      .collect().head.getLong(0)
    val got = cnt("&time=2024-01-06T00:00:00Z")
    assert(got == want && got > 0, s"got $got want $want")
    assert(cnt("&time=2024-01-06T00:00:00Z") == got) // reproducible
    // a different pin sees a different day's rows
    assert(cnt("&time=2024-01-13T00:00:00Z") != got)
  }

  test("queries exceeding the deadline cancel with 503; fast ones pass") {
    import org.apache.spark.sql.functions.{col, udf}
    val slow = udf((s: String) => { Thread.sleep(100); s })
    val src = graft.Tables.eventsLog(spark, "/root/testdata/sf0.001")
      .withColumn("_msg", slow(col("_msg")))
    val s3 = new QueryServer(spark, () => src, 0, maxQueryDurationMs = 400)
    val p3 = s3.start()
    def get3(pq: String): (Int, String) = {
      val conn = new URI(s"http://127.0.0.1:$p3$pq").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(120000)
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = new String(is.readAllBytes(), UTF_8)
      conn.disconnect(); (code, body)
    }
    try {
      // reads _msg through the sleeping udf: blows the 400ms deadline
      val (code, body) = get3(
        s"/select/logsql/query?query=${enc("* | len(_msg) as l | stats sum(l) sl")}")
      assert(code == 503, s"$code $body")
      assert(body.contains("deadline"), body)
      // column pruning drops the udf for a count: same server, fast, 200
      val (c2, b2) = get3(
        s"/select/logsql/query?query=${enc("* | stats count() c")}")
      assert(c2 == 200, s"$c2 $b2")
    } finally s3.stop()
  }

  test("plan cache: repeats hit, ingest invalidates, results stay fresh") {
    import spark.implicits._
    val dir = s"/root/repo/target/server_test/plancache-${System.nanoTime()}"
    def add(ts: String, msg: String): Unit = {
      val lines = Seq(s"""{"_time":"$ts","_msg":"$msg","app":"web"}""").toDF("value")
      graft.streaming.Ingest.appendBatch(
        graft.streaming.Ingest.parseJsonline(lines), dir, Seq("app"))
    }
    add("2024-01-01T10:00:00Z", "row one")
    add("2024-01-02T10:00:00Z", "row two")
    val s2 = new QueryServer(spark, () => graft.store.LogStore.read(spark, dir), 0,
      storeDir = Some(dir))
    val p2 = s2.start()
    def getC(pq: String): (String, String) = {
      val conn = new URI(s"http://127.0.0.1:$p2$pq").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      val cache = conn.getHeaderField("X-Graft-Plan-Cache")
      conn.disconnect(); (body, cache)
    }
    try {
      val pq = s"/select/logsql/query?query=${enc("* | stats count() c")}"
      val (b1, c1) = getC(pq)
      assert(c1 == "miss", c1)
      assert(b1.contains("\"c\":\"2\""), b1)
      val (b2, c2) = getC(pq)
      assert(c2 == "hit", c2)
      assert(b2 == b1)
      // the lastN day-descent path caches too (the expensive serving shape)
      val lq = s"/select/logsql/query?query=${enc("*")}&limit=1"
      assert(getC(lq)._2 == "miss")
      assert(getC(lq)._2 == "hit")
      // ingest bumps the store generation: cached plans must NOT serve and
      // the fresh result must include the new row
      add("2024-01-03T10:00:00Z", "row three")
      val (b3, c3) = getC(pq)
      assert(c3 == "miss", "cache served across an ingest")
      assert(b3.contains("\"c\":\"3\""), b3)
      // wall-clock-relative queries are never cached (resolve at parse)
      val rel = s"/select/logsql/query?query=${enc("_time:5m | stats count() c")}"
      assert(getC(rel)._2 == "bypass")
      assert(getC(rel)._2 == "bypass")
      // but a pinned evaluation timestamp makes them reproducible → cached
      val pinned = rel + "&time=2024-01-03T10:01:00Z"
      assert(getC(pinned)._2 == "miss")
      assert(getC(pinned)._2 == "hit")
    } finally s2.stop()
  }

  test("tail backfill conformance: late rows into closed windows drop, new rows deliver once") {
    import spark.implicits._
    val dir = s"/root/repo/target/server_test/tailback-${System.nanoTime()}"
    def add(ts: String, msg: String): Unit = {
      val lines = Seq(s"""{"_time":"$ts","_msg":"$msg","app":"web"}""").toDF("value")
      graft.streaming.Ingest.appendBatch(
        graft.streaming.Ingest.parseJsonline(lines), dir, Seq("app"))
    }
    add("2024-01-01T10:00:00Z", "base one")
    add("2024-01-03T10:00:00Z", "base two")
    val s2 = new QueryServer(spark, () => graft.store.LogStore.read(spark, dir), 0,
      storeDir = Some(dir))
    val p2 = s2.start()
    try {
      // stream the tail on a background thread, collecting lines live
      val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val t = new Thread(() => {
        val conn = new URI(
          s"http://127.0.0.1:$p2/select/logsql/tail?query=${enc("*")}&refresh_interval=200&max_polls=20")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(conn.getInputStream, UTF_8))
        var l = br.readLine()
        while (l != null) { lines.add(l); l = br.readLine() }
        conn.disconnect()
      })
      t.start()
      Thread.sleep(800) // first polls deliver the base rows
      // in-order append: newer than everything seen → must deliver, once
      add("2024-01-04T10:00:00Z", "fresh row")
      Thread.sleep(800)
      // backfill INTO a closed poll window (older than the delivered max):
      // the poll window advances to the max seen row time, so a
      // late-written older row is DROPPED — same contract as the
      // reference's live tail, which resumes from the last seen timestamp
      // and cannot observe rows written behind it (logsql.go:497-660;
      // clients needing backfill re-query with an explicit time range)
      add("2024-01-02T10:00:00Z", "late backfill")
      t.join(20000)
      assert(!t.isAlive, "tail did not terminate")
      val all = lines.toArray(Array.empty[String]).toSeq
      assert(all.count(_.contains("base one")) == 1, all)
      assert(all.count(_.contains("base two")) == 1, all)
      assert(all.count(_.contains("fresh row")) == 1, all)
      assert(all.count(_.contains("late backfill")) == 0, all)
    } finally s2.stop()
  }

  test("serving path prunes files through the bloom sidecars; results exact") {
    import spark.implicits._
    val dir = s"/root/repo/target/server_test/bloomserve-${System.nanoTime()}"
    def add(day: String, level: String, n: Int): Unit = {
      val lines = (1 to n).map(i =>
        s"""{"_time":"${day}T10:${"%02d".format(i % 60)}:00Z","_msg":"msg $i","level":"$level","app":"web"}""")
        .toDF("value")
      graft.streaming.Ingest.appendBatch(
        graft.streaming.Ingest.parseJsonline(lines), dir, Seq("app"))
    }
    add("2024-01-01", "info", 20)
    add("2024-01-02", "error", 7)
    graft.store.MsgBloom.build(spark, dir)
    graft.store.FieldBloom.build(spark, dir)
    val s2 = new QueryServer(spark, () => graft.store.LogStore.read(spark, dir), 0,
      storeDir = Some(dir))
    val p2 = s2.start()
    def get2(pathAndQuery: String): (Int, String) = {
      val conn = new URI(s"http://127.0.0.1:$p2$pathAndQuery").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = new String(is.readAllBytes(), UTF_8)
      conn.disconnect(); (code, body)
    }
    try {
      val before = graft.store.FieldBloom.probed.get()
      // needle on a NON-_msg dynamic field: the field sidecar prunes the
      // day-1 file; the count is exact either way
      val (c1, b1) = get2(
        s"/select/logsql/query?query=${enc("level:error | stats count() c")}")
      assert(c1 == 200 && b1.contains("\"c\":\"7\""), b1)
      assert(graft.store.FieldBloom.probed.get() > before,
        "field sidecar was not consulted on the serving path")
      // absent needle: zero result, still a valid (empty) response
      val (c2, b2) = get2(
        s"/select/logsql/query?query=${enc("level:zzzmissing | stats count() c")}")
      assert(c2 == 200 && b2.contains("\"c\":\"0\""), b2)
      // rows appended AFTER the sidecar build must still be served
      add("2024-01-03", "error", 3)
      val (c3, b3) = get2(
        s"/select/logsql/query?query=${enc("level:error | stats count() c")}")
      assert(c3 == 200 && b3.contains("\"c\":\"10\""), b3)
    } finally s2.stop()
  }

  test("stats_query_range body is memoized under the plan cache") {
    val dir = graft.store.LogStore.ensureFromEvents(spark, "/root/testdata/sf0.001")
    val s2 = new QueryServer(spark, () => graft.store.LogStore.read(spark, dir), 0,
      storeDir = Some(dir))
    val p2 = s2.start()
    try {
      val path = s"/select/logsql/stats_query_range?query=${enc("* | stats count() hits")}" +
        "&start=2024-01-01T00:00:00Z&end=2024-02-01T00:00:00Z&step=1d"
      def call(): (String, String) = {
        val conn = new URI(s"http://127.0.0.1:$p2$path")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        assert(conn.getResponseCode == 200)
        val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
        val cache = conn.getHeaderField("X-Graft-Plan-Cache")
        conn.disconnect(); (body, cache)
      }
      val (body1, cache1) = call()
      val (body2, cache2) = call()
      assert(cache1 == "miss" && cache2 == "hit", s"$cache1/$cache2")
      assert(body1 == body2 && body1.contains("\"resultType\":\"matrix\""))
      // stats_query with a pinned time memoizes too; unpinned bypasses
      val sq = s"/select/logsql/stats_query?query=${enc("* | stats count() hits")}" +
        "&time=2024-02-01T00:00:00Z"
      def callSq(p: String): String = {
        val conn = new URI(s"http://127.0.0.1:$p2$p")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        assert(conn.getResponseCode == 200)
        conn.getInputStream.readAllBytes()
        val cache = conn.getHeaderField("X-Graft-Plan-Cache")
        conn.disconnect(); cache
      }
      callSq(sq)
      assert(callSq(sq) == "hit")
      val sqUnpinned = s"/select/logsql/stats_query?query=${enc("* | stats count() hits")}"
      assert(callSq(sqUnpinned) == null, "unpinned stats_query must not cache")
    } finally s2.stop()
  }

  test("bad query returns a JSON error") {
    // `| nosuchpipe` is a valid bare FILTER pipe since the pipe.go:368-380
    // shorthand landed, so the 400 check needs input failing both bare
    // grammars (stats and filter)
    val (code, body) = get(s"/select/logsql/query?query=${enc("* | :")}")
    assert(code == 400)
    assert(body.contains("error"))
  }
}
