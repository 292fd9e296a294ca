package graft.store

import graft.SparkSuite
import graft.logql.Compiler
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** M0 log-store layout + stream_context tests: partition pruning must show
  * up in the physical plan, results must match the flat-table computation. */
class StoreSpec extends SparkSuite {

  private val SF = "/root/testdata/sf0.001"
  private lazy val storeDir = LogStore.ensureFromEvents(spark, SF)

  test("store layout: tenant/day partitions, _stream_id, streams table") {
    val logs = LogStore.read(spark, storeDir)
    assert(logs.columns.contains("_stream_id"))
    assert(logs.columns.contains("_day"))
    assert(logs.columns.contains("tenant"))
    assert(logs.count() ==
      graft.Tables.events(spark, SF).count())
    val streams = LogStore.streams(spark, storeDir)
    val tags = streams.collect().map(r =>
      r.getAs[scala.collection.Map[String, String]]("_stream"))
    assert(streams.count() == 5) // one stream per event_type
    assert(tags.forall(_.keySet == Set("event_type")))
  }

  test("_time filter prunes _day partitions; stream filter pushes down") {
    val logs = LogStore.read(spark, storeDir)
    val out = Compiler.run(logs,
      """{event_type="purchase"} _time:[2024-01-05, 2024-01-07) | stats count() hits""")
    val plan = out.queryExecution.executedPlan.toString
    // non-empty PartitionFilters over _day
    assert("PartitionFilters: \\[[^\\]]*_day".r.findFirstIn(plan).isDefined, plan)
    // stream label predicate reaches the parquet scan
    assert(plan.contains("PushedFilters") && plan.contains("event_type"), plan)
    val expect = graft.Tables.events(spark, SF)
      .filter(col("event_type") === "purchase" &&
        col("ts") >= lit("2024-01-05").cast(TimestampType) &&
        col("ts") < lit("2024-01-07").cast(TimestampType)).count()
    assert(out.collect().head.getLong(0) == expect)
  }

  test("msg bloom sidecar prunes files and preserves results") {
    MsgBloom.ensure(spark, storeDir)
    // nonsense token → zero candidate files → empty result, no scan
    assert(MsgBloom.candidateFiles(spark, storeDir, Seq("qqqmissingtoken")).get.isEmpty)
    assert(MsgBloom.query(spark, storeDir,
      "qqqmissingtoken | stats count() c").collect().head.getLong(0) == 0)
    // pick a real token from the data; pruned result == full-scan result
    val logs = LogStore.read(spark, storeDir)
    val tok = graft.functions.TextMatch.tokenizeString(
      logs.select("_msg").head().getString(0)).last
    val pruned = MsgBloom.query(spark, storeDir,
      "\"" + tok + "\" | stats count() c").collect().head.getLong(0)
    val full = Compiler.run(logs, "\"" + tok + "\" | stats count() c")
      .collect().head.getLong(0)
    assert(pruned == full && full > 0)
    // candidate list for the real token is a subset of all files
    val total = spark.read.parquet(s"$storeDir/msg_bloom").count()
    val cand = MsgBloom.candidateFiles(spark, storeDir, Seq(tok)).get.size
    assert(cand <= total)
  }

  test("lastN descends newest day partitions first") {
    val (res, daysScanned) = LogStore.lastN(spark, storeDir, "*", 5)
    val rows = res.collect()
    assert(rows.length == 5)
    // matches a full-table sort
    val logs = LogStore.read(spark, storeDir)
    val expect = logs.orderBy(col("_time").desc).limit(5)
      .select("_time").collect().map(_.getTimestamp(0)).toSeq
    assert(rows.map(_.getAs[java.sql.Timestamp]("_time")).toSeq == expect)
    // and did NOT scan the whole retention window
    assert(daysScanned < LogStore.listDays(storeDir).length)
    // rare filter widens but still terminates correctly
    val (res2, _) = LogStore.lastN(spark, storeDir, "event_type:error", 3)
    assert(res2.count() == 3)
  }

  test("lastN: full-scan queries keep their own semantics") {
    val logs = LogStore.read(spark, storeDir)
    // a sort pipe is not lastN-safe: the limit must be the SORTED prefix,
    // not a newest-by-_time reorder of it
    val q = "* | sort by (value desc, event_id desc)"
    val (res, _) = LogStore.lastN(spark, storeDir, q, 4)
    val got = res.select("event_id").collect().map(_.get(0)).toSeq
    val expect = Compiler.run(logs, q).limit(4)
      .select("event_id").collect().map(_.get(0)).toSeq
    assert(got == expect, s"got $got want $expect")
    // renaming _time away routes to the fallback instead of throwing
    val (res2, _) = LogStore.lastN(spark, storeDir, "* | mv _time as t", 3)
    assert(res2.count() == 3)
    assert(res2.columns.contains("t") && !res2.columns.contains("_time"))
    // pipes that overwrite _time IN PLACE (column still present, values
    // clobbered) must also route to the full-scan path: the descent's
    // final newest-by-_time re-sort would order by the clobbered values.
    // Routing is observable through daysScanned — the fallback reports
    // every day, the descent fewer (the descent test above pins that).
    val (_, allDays) = LogStore.lastN(spark, storeDir, "* | sort by (value)", 1)
    for (q3 <- Seq("* | pack_json as _time",
                   "* | collapse_nums at _time",
                   "* | decolorize _time")) {
      val (res3, scanned3) = LogStore.lastN(spark, storeDir, q3, 3)
      assert(scanned3 == allDays, q3)
      assert(res3.count() == 3, q3)
    }
  }

  test("stream_context returns surrounding rows per stream") {
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val schema = StructType(Seq(
      StructField("_time", TimestampType),
      StructField("_stream_id", StringType),
      StructField("_msg", StringType)))
    val rows = Seq(
      Row(t("2024-01-01T00:00:01Z"), "s1", "a"),
      Row(t("2024-01-01T00:00:02Z"), "s1", "b"),
      Row(t("2024-01-01T00:00:03Z"), "s1", "MATCH"),
      Row(t("2024-01-01T00:00:04Z"), "s1", "c"),
      Row(t("2024-01-01T00:00:05Z"), "s1", "d"),
      Row(t("2024-01-01T00:00:03Z"), "s2", "other"),
      Row(t("2024-01-01T05:00:00Z"), "s1", "far"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Compiler.run(df, "MATCH | stream_context before 1 after 1")
      .select("_msg").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("MATCH", "b", "c"))
    // no context beyond the time window
    val far = Compiler.run(df, "far | stream_context before 1 after 1")
      .select("_msg").collect().map(_.getString(0)).sorted
    assert(far.toSeq == Seq("far")) // "d" is 5h earlier, outside 1h window
  }

  test("stream_context with after reaches forward only") {
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val schema = StructType(Seq(
      StructField("_time", TimestampType),
      StructField("_stream_id", StringType),
      StructField("_msg", StringType)))
    val rows = Seq(
      Row(t("2024-01-01T00:00:01Z"), "s1", "a"),
      Row(t("2024-01-01T00:00:02Z"), "s1", "MATCH"),
      Row(t("2024-01-01T00:00:03Z"), "s1", "b"),
      Row(t("2024-01-01T00:00:04Z"), "s1", "c"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Compiler.run(df, "MATCH | stream_context after 2")
      .select("_msg").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("MATCH", "b", "c"))
  }

  test("stream_context marks rows by predicate, not by (stream,time) pair") {
    // two rows share a timestamp in one stream; only one satisfies the
    // needle. The inline fast path must mark just the matching row — the
    // old join-on-(sid,time) marking would have treated both as matches
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val schema = StructType(Seq(
      StructField("_time", TimestampType),
      StructField("_stream_id", StringType),
      StructField("_msg", StringType)))
    val rows = Seq(
      Row(t("2024-01-01T00:00:01Z"), "s1", "MATCH"),
      Row(t("2024-01-01T00:00:01Z"), "s1", "twin"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Compiler.run(df, "MATCH | stream_context before 0 after 0")
      .select("_msg").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("MATCH"))
    // and the fast path compiles to ONE join (the stream semi-join): the
    // needle subplan must not be joined back as a marker relation
    val plan = Compiler.run(df, "MATCH | stream_context before 1")
      .queryExecution.executedPlan.toString
    assert("(?i)join".r.findAllIn(plan).size >= 1 && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("LeftOuter"), plan)
  }

  test("stream_context prunes unmatched streams before the window") {
    // context can only come from streams holding a matched row — above the
    // cost gate the plan must semi-join the source down to those streams
    // so the per-stream shuffle+sort moves the needle's streams, not the
    // whole relation (gate forced to 0 here: the test store is tiny)
    val logs = LogStore.read(spark, storeDir)
    spark.conf.set("spark.graft.streamContext.pruneGateBytes", "0")
    try {
      val out = Compiler.run(logs,
        "value:>300 | stream_context before 1 after 1")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"), plan)
      val n = out.count()
      assert(n > 0)
      // below the gate the prune disappears but the result is identical —
      // the window itself drops rows of streams with no matched row
      spark.conf.set("spark.graft.streamContext.pruneGateBytes",
        (1L << 30).toString)
      val direct = Compiler.run(logs,
        "value:>300 | stream_context before 1 after 1")
      val dplan = direct.queryExecution.executedPlan.toString
      assert(!dplan.contains("LeftSemi"), dplan)
      assert(direct.count() == n)
    } finally
      spark.conf.unset("spark.graft.streamContext.pruneGateBytes")
  }
}
