package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Write-time field-name hit counts (the per-block columnsHeader
  * analogue): sidecar round-trip on both write paths, scan-free
  * field_names over pristine store scans, partition-filter scoping,
  * append invalidation + compaction re-count, and the ValueTypeMeta
  * part-coverage regression the same invalidation exposed. */
class FieldNameMetaSpec extends SparkSuite {
  import spark.implicits._

  private def mkStore(rows: Seq[(String, String, String)]): String = {
    // (_time day, _msg, app)
    val dir = s"/root/repo/target/fnmeta_spec/${System.nanoTime()}"
    val df = rows.toDF("d", "_msg", "app")
      .withColumn("_time", to_timestamp(concat(col("d"), lit(" 10:00:00"))))
      .drop("d")
    LogStore.ingest(df, dir, Seq("app"))
    dir
  }

  private def collectNames(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def countJobs[T](body: => T): (T, Long) = {
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      val bus = spark.sparkContext.getClass.getMethod("listenerBus")
        .invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
      (r, jobs.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("pristine store scan answers field_names from the sidecar, no scan jobs") {
    val dir = mkStore(
      (0 until 40).map(i => ("2024-01-05", s"m$i", "web")) ++
      (0 until 24).map(i => ("2024-01-06", s"x$i", "api")))
    assert(FieldNameMeta.load(dir).keySet ==
      Set("tenant=0:0/_day=2024-01-05", "tenant=0:0/_day=2024-01-06"))
    val logs = LogStore.read(spark, dir)
    val before = FieldNameMeta.served.get
    val (names, jobs) = countJobs {
      collectNames(graft.logql.Compiler.run(logs, "* | field_names"))
    }
    assert(FieldNameMeta.served.get == before + 1, "sidecar path did not serve")
    assert(jobs == 0, s"sidecar-served field_names ran $jobs jobs")
    assert(names == Map("_msg" -> 64L, "_time" -> 64L, "app" -> 64L,
      "_stream" -> 64L, "_stream_id" -> 64L), names)
    // differential: a non-pristine shape (projection) takes the scan path
    // and must agree exactly
    val scanned = collectNames(graft.logql.Compiler.run(
      logs.select(logs.columns.map(col).toSeq: _*), "* | field_names"))
    assert(scanned == names, s"scan path disagrees: $scanned vs $names")
  }

  test("partition filters scope the sidecar answer; value filters fall back") {
    val dir = mkStore(
      (0 until 40).map(i => ("2024-01-05", s"m$i", "web")) ++
      (0 until 24).map(i => ("2024-01-06", s"x$i", "api")))
    val logs = LogStore.read(spark, dir)
    // day-scoped: the serving layer's tenant scoping compiles to exactly
    // this partition-column-only Filter shape
    val day = collectNames(graft.logql.Compiler.run(
      logs.filter(col("_day") === lit("2024-01-06").cast("date")),
      "* | field_names"))
    assert(day("_msg") == 24L, day)
    val tenant = collectNames(graft.logql.Compiler.run(
      logs.filter(col("tenant").isin("0:0")), "* | field_names"))
    assert(tenant("_msg") == 64L, tenant)
    val none = collectNames(graft.logql.Compiler.run(
      logs.filter(col("tenant").isin("7:7")), "* | field_names"))
    assert(none.isEmpty, none)
    // a value filter references a data column → scan path, still exact
    val before = FieldNameMeta.served.get
    val web = collectNames(graft.logql.Compiler.run(logs,
      """{app="web"} | field_names"""))
    assert(FieldNameMeta.served.get == before, "value-filtered query must scan")
    assert(web("_msg") == 40L, web)
  }

  test("append invalidates counts; compaction re-counts incl. dynamic map keys") {
    val dir = s"/root/repo/target/fnmeta_spec/${System.nanoTime()}"
    val part = "tenant=0:0/_day=2024-02-01"
    def append(lines: Seq[String]): Unit =
      graft.streaming.Ingest.appendBatch(
        graft.streaming.Ingest.parseJsonline(lines.toDF("value")), dir, Seq("app"))
    append((0 until 20).map(i =>
      s"""{"_time":"2024-02-01T10:00:00Z","_msg":"m$i","app":"web","k8s_pod":"p$i"}"""))
    append((0 until 10).map(i =>
      s"""{"_time":"2024-02-01T11:00:00Z","_msg":"n$i","app":"web"}"""))
    // flushes never count (hot path): no sidecar entry yet → scan path
    assert(!FieldNameMeta.load(dir).contains(part))
    val logs = LogStore.read(spark, dir)
    val scanned = collectNames(graft.logql.Compiler.run(logs, "* | field_names"))
    assert(scanned("k8s_pod") == 20L && scanned("_msg") == 30L, scanned)
    // background compaction counts the whole part exactly — map keys too
    Compaction.optimize(spark, dir)
    assert(FieldNameMeta.load(dir).get(part).exists(_("k8s_pod").hits == 20L),
      FieldNameMeta.load(dir))
    val logs2 = LogStore.read(spark, dir)
    val before = FieldNameMeta.served.get
    val served = collectNames(graft.logql.Compiler.run(logs2, "* | field_names"))
    assert(FieldNameMeta.served.get == before + 1, "post-compaction serve missing")
    assert(served == scanned, s"sidecar $served vs scan $scanned")
    // another append drops the entry again → fallback, still exact
    append(Seq("""{"_time":"2024-02-01T12:00:00Z","_msg":"z","app":"web","extra":"1"}"""))
    assert(!FieldNameMeta.load(dir).contains(part))
    val after = collectNames(graft.logql.Compiler.run(
      LogStore.read(spark, dir), "* | field_names"))
    assert(after("extra") == 1L && after("_msg") == 31L, after)
  }

  test("REGRESSION: invalidated part must not satisfy value_type from remaining entries") {
    val dir = mkStore(
      (0 until 30).map(i => ("2024-03-01", (i % 200).toString, "web")) ++
      (0 until 30).map(i => ("2024-03-02", (i % 150).toString, "web")))
    assert(ValueTypeMeta.load(dir).values.forall(_("_msg") == "uint8"))
    // append non-numeric rows into day 1: its verdict entry is DROPPED
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline((0 until 10).map(i =>
        s"""{"_time":"2024-03-01T10:00:00Z","_msg":"alpha $i beta","app":"web"}""").toDF("value")),
      dir, Seq("app"))
    assert(!ValueTypeMeta.load(dir).contains("tenant=0:0/_day=2024-03-01"))
    // pre-fix, the remaining all-uint8 entries compiled to lit(true) and
    // admitted the appended strings as uint8; the coverage check forces
    // the scan fallback, which classifies the whole relation (string)
    val logs = LogStore.read(spark, dir)
    val u8 = graft.logql.Compiler.run(logs,
      "_msg:value_type(uint8) | stats count() c").collect().head.getLong(0)
    val str = graft.logql.Compiler.run(logs,
      "_msg:value_type(string) | stats count() c").collect().head.getLong(0)
    assert(u8 == 0L, s"uint8 matched $u8 rows — unclassified appended part leaked")
    assert(str == 70L, s"string matched $str")
  }
}
