package graft.store

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-time value-type metadata (the per-block columnHeader.valueType
  * analogue): classification parity with the encode() chain, sidecar
  * round-trip on both write paths, scan-free query compiles, and per-part
  * predicates when parts disagree. */
class ValueTypeMetaSpec extends SparkSuite {
  import spark.implicits._

  /** The pre-sidecar two-job classification (distinct sample + format
    * flags), kept verbatim as the differential oracle for
    * ValueTypeMeta.classify's one-job kernel. */
  private def legacyClassify(df: DataFrame, c: org.apache.spark.sql.Column): String = {
    import org.apache.spark.sql.types.IntegerType
    val distinct9 = df.select(c.as("v")).distinct().limit(9)
      .collect().map(_.getString(0)).toSeq
    if (distinct9.size <= 1) return "const"
    if (distinct9.size <= 8 && distinct9.map(_.length).sum <= 256) return "dict"
    val uintRe = "^(?:0|[1-9][0-9]{0,19})$"
    val intRe = "^-?(?:0|[1-9][0-9]{0,18})$"
    val floatRe = "^-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?$"
    val isoRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}\\.[0-9]{3}Z$"
    def allMatch(x: org.apache.spark.sql.Column) =
      coalesce(min(x.cast(IntegerType)), lit(0)) === 1
    val r = df.agg(
      allMatch(c.rlike(uintRe)).as("u"),
      max(when(c.rlike(uintRe), c.cast("decimal(20,0)"))).as("umax"),
      allMatch(c.rlike(intRe)).as("i"),
      allMatch(c.rlike(floatRe) && c.try_cast("double").isNotNull).as("f"),
      allMatch(graft.functions.Ipv4Parse.ipv4ToLong(c).isNotNull).as("ip"),
      allMatch(c.rlike(isoRe)).as("iso")).collect().head
    if (r.getBoolean(0)) {
      val mx = Option(r.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
      if (mx <= 255) "uint8" else if (mx <= 65535) "uint16"
      else if (mx <= BigDecimal("4294967295")) "uint32"
      else if (mx <= BigDecimal("18446744073709551615")) "uint64"
      else "string"
    }
    else if (r.getBoolean(2)) "int64"
    else if (r.getBoolean(3)) "float64"
    else if (r.getBoolean(4)) "ipv4"
    else if (r.getBoolean(5)) "iso8601"
    else "string"
  }

  test("classify matches the legacy two-job chain on generated columns") {
    val rnd = new scala.util.Random(41)
    val gens: Seq[Int => String] = Seq(
      _ => "same",                                   // const
      i => s"d${i % 5}",                             // dict
      i => (i % 200).toString,                       // uint8
      i => (i % 40000).toString,                     // uint16
      i => (i.toLong * 100000).toString,             // uint32/64
      i => (-i).toString,                            // int64
      i => s"$i.5",                                  // float64
      i => s"10.0.${i % 200}.${i % 250}",            // ipv4
      i => f"2024-01-${i % 27 + 1}%02dT10:00:00.000Z", // iso8601
      i => s"word-$i x",                             // string
      i => if (i % 7 == 0) "" else i.toString        // mixed w/ empties
    )
    gens.zipWithIndex.foreach { case (g, gi) =>
      val n = 20 + rnd.nextInt(40)
      val df = (0 until n).map(g).toDF("v")
      val got = ValueTypeMeta.classify(df, Seq("v" -> coalesce(col("v"), lit(""))))("v")
      val want = legacyClassify(df, coalesce(col("v"), lit("")))
      assert(got == want, s"gen #$gi: got $got want $want")
    }
  }

  private def mkStore(rows: Seq[(String, String, String)]): String = {
    // (_time day, _msg, app)
    val dir = s"/root/repo/target/vtmeta_spec/${System.nanoTime()}"
    val df = rows.toDF("d", "_msg", "app")
      .withColumn("_time", to_timestamp(concat(col("d"), lit(" 10:00:00"))))
      .drop("d")
    LogStore.ingest(df, dir, Seq("app"))
    dir
  }

  test("bulk ingest writes the sidecar; value_type answers without a scan job") {
    val dir = mkStore(
      (0 until 40).map(i => ("2024-01-05", s"{$i}", "web")) ++
      (0 until 40).map(i => ("2024-01-06", s"{x$i}", "web")))
    val side = ValueTypeMeta.load(dir)
    assert(side.keySet == Set("tenant=0:0/_day=2024-01-05",
                              "tenant=0:0/_day=2024-01-06"), side)
    assert(side.values.forall(_("_msg") == "string"), side)
    assert(side.values.forall(_("app") == "const"), side)
    val logs = LogStore.read(spark, dir)
    // compiling a value_type filter over the store must launch NO jobs
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val q = graft.logql.Compiler.run(logs,
        "_msg:value_type(string) app:value_type(const) | stats count() c")
      // listenerBus is private[spark] at the source level, public in
      // bytecode (same reflection the bench harness uses)
      val bus = spark.sparkContext.getClass.getMethod("listenerBus")
        .invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .foreach(_.invoke(bus))
      assert(jobs.get == 0, s"value_type compile ran ${jobs.get} classification jobs")
      assert(q.collect().head.getLong(0) == 80)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("disagreeing parts compile to a partition predicate with exact rows") {
    val dir = mkStore(
      (0 until 30).map(i => ("2024-01-05", (i % 200).toString, "web")) ++   // uint8 day
      (0 until 30).map(i => ("2024-01-06", s"msg $i payload", "web")))      // string day
    val side = ValueTypeMeta.load(dir)
    assert(side("tenant=0:0/_day=2024-01-05")("_msg") == "uint8", side)
    assert(side("tenant=0:0/_day=2024-01-06")("_msg") == "string", side)
    val logs = LogStore.read(spark, dir)
    val u8 = graft.logql.Compiler.run(logs,
      "_msg:value_type(uint8) | stats count() c").collect().head.getLong(0)
    val str = graft.logql.Compiler.run(logs,
      "_msg:value_type(string) | stats count() c").collect().head.getLong(0)
    val none = graft.logql.Compiler.run(logs,
      "_msg:value_type(float64) | stats count() c").collect().head.getLong(0)
    assert(u8 == 30 && str == 30 && none == 0, (u8, str, none))
    // the per-part predicate prunes: only the matching day's files scan
    val plan = graft.logql.Compiler.run(logs,
      "_msg:value_type(uint8) | stats count() c")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("2024-01-06"), "non-matching day should be pruned")
  }

  test("appends invalidate part verdicts; compaction re-classifies exactly") {
    val dir = s"/root/repo/target/vtmeta_spec/${System.nanoTime()}"
    val part = "tenant=0:0/_day=2024-02-01"
    def append(msgs: Seq[String]): Unit = {
      val lines = msgs.map(m =>
        s"""{"_time":"2024-02-01T10:00:00Z","_msg":"$m","app":"web"}""").toDF("value")
      graft.streaming.Ingest.appendBatch(
        graft.streaming.Ingest.parseJsonline(lines), dir, Seq("app"))
    }
    // flushes never classify (hot path); the part has no verdict yet
    // (two flushes: compaction's min-file gate skips 1-file parts)
    append((0 until 20).map(i => (i % 200).toString))
    append((20 until 40).map(i => (i % 200).toString))
    assert(!ValueTypeMeta.load(dir).contains(part))
    // background compaction classifies the whole part exactly
    Compaction.optimize(spark, dir)
    assert(ValueTypeMeta.load(dir)(part)("_msg") == "uint8",
      ValueTypeMeta.load(dir))
    // a same-day append STALES the verdict → entry dropped
    append((0 until 20).map(i => s"alpha $i beta"))
    assert(!ValueTypeMeta.load(dir).contains(part), ValueTypeMeta.load(dir))
    // fallback classifies the union (60 rows, mixed content → string)
    val logs = LogStore.read(spark, dir)
    val str = graft.logql.Compiler.run(logs,
      "_msg:value_type(string) | stats count() c").collect().head.getLong(0)
    assert(str == 60)
    // re-compaction restores an exact verdict for the merged part
    Compaction.optimize(spark, dir)
    assert(ValueTypeMeta.load(dir)(part)("_msg") == "string",
      ValueTypeMeta.load(dir))
  }
}
