package graft.streaming

import graft.SparkSuite
import graft.store.LogStore
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming ingest tests: lines in → queryable store, counts match
  * (reference apptest/tests/ingestprotocols_test.go shape). */
class IngestSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/ingest_test/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  test("jsonline parser: specials split from fields map, bad lines kept") {
    import spark.implicits._
    val lines = Seq(
      """{"_time":"2024-01-05T10:00:00Z","_msg":"hello","app":"web","level":"info"}""",
      """{"_msg":"no time","app":"api"}""",
      "not json at all").toDF("value")
    val out = Ingest.parseJsonline(lines).collect()
    val byMsg = out.map(r => r.getAs[String]("_msg") -> r).toMap
    assert(byMsg("hello").getAs[java.sql.Timestamp]("_time").toInstant.toString
      == "2024-01-05T10:00:00Z")
    assert(byMsg("hello").getAs[Map[String, String]]("fields") ==
      Map("app" -> "web", "level" -> "info"))
    assert(byMsg.contains("not json at all")) // raw line preserved as _msg
  }

  test("syslog parser: RFC3164 and RFC5424") {
    import spark.implicits._
    val lines = Seq(
      "<34>1 2024-01-05T10:11:12Z host1 myapp 77 ID1 - emergency happened",
      "<13>Jan  5 10:11:12 host2 cron[123]: scheduled run").toDF("value")
    val out = Ingest.parseSyslog(lines).collect()
    val m = out.map(r => r.getAs[String]("_msg") -> r.getAs[Map[String, String]]("fields")).toMap
    assert(m("emergency happened")("app_name") == "myapp")
    assert(m("emergency happened")("severity") == "2")
    assert(m("scheduled run")("hostname") == "host2")
  }

  test("file stream ingest: jsonline files → store → LogsQL query") {
    val src = tmp("src")
    val store = tmp("store")
    val ckpt = tmp("ckpt")
    val clean = (0 until 100).map { i =>
      val app = if (i % 2 == 0) "web" else "api"
      val day = 1 + (i % 3)
      f"""{"_time":"2024-01-0$day%dT10:00:${i % 60}%02dZ","_msg":"event $i%d","app":"$app"}"""
    }
    Files.write(Paths.get(s"$src/batch1.jsonl"),
      String.join("\n", clean: _*).getBytes("UTF-8"))
    val q = Ingest.fileStream(spark, src, store, "jsonline", Seq("app"), ckpt)
    q.processAllAvailable()
    q.stop()
    val logs = LogStore.read(spark, store)
    assert(logs.count() == 100)
    // day partitions exist
    // ':' is escaped in partition dir names
    assert(Files.exists(Paths.get(s"$store/logs/tenant=0%3A0/_day=2024-01-02")))
    // streams table has both streams
    assert(LogStore.streams(spark, store).select("_stream_id").distinct().count() == 2)
    // LogsQL over the ingested layout, stream filter + time prune
    val res = graft.logql.Compiler.run(logs,
      """{app="web"} _time:[2024-01-01, 2024-01-02) | stats count() hits""")
    val expect = clean.count(l => l.contains("\"web\"") && l.contains("2024-01-01"))
    assert(res.collect().head.getLong(0) == expect)
  }
}
