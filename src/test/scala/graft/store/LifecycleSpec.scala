package graft.store

import graft.SparkSuite
import graft.logql.Compiler
import graft.streaming.Ingest
import java.nio.file.{Files, Paths}

/** Store lifecycle tests: compaction merges micro-batch files and dedups
  * streams without changing query results; retention drops whole expired
  * day partitions; a stale bloom sidecar never hides appended rows. */
class LifecycleSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/lifecycle_test/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  private def appendLines(dir: String, day: String, n: Int,
                          msg: Int => String = i => s"event number $i"): Unit = {
    import spark.implicits._
    val lines = (1 to n).map(i =>
      s"""{"_time":"${day}T10:${"%02d".format(i % 60)}:00Z","_msg":"${msg(i)}","app":"web"}""")
      .toDF("value")
    Ingest.appendBatch(Ingest.parseJsonline(lines), dir, Seq("app"))
  }

  private def dataFileCount(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$dir/logs"))
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
  }

  test("optimize merges small files and dedups streams; results unchanged") {
    val dir = tmp("compact")
    (1 to 4).foreach(_ => appendLines(dir, "2024-01-01", 20))
    (1 to 3).foreach(_ => appendLines(dir, "2024-01-02", 10))
    val q = "* | stats count() c, sum_len(_msg) sl, count_uniq(_stream_id) cs"
    val before = Compiler.run(LogStore.read(spark, dir), q).collect().head
    val filesBefore = dataFileCount(dir)
    assert(filesBefore >= 7) // one file per appendBatch per day at least
    // steady-state flushes carrying only already-registered streams skip
    // the streams-table job entirely → a single row after 7 appends
    assert(spark.read.parquet(s"$dir/streams").count() == 1)

    Compaction.optimize(spark, dir)

    val filesAfter = dataFileCount(dir)
    assert(filesAfter < filesBefore && filesAfter >= 2, s"$filesBefore -> $filesAfter")
    val after = Compiler.run(LogStore.read(spark, dir), q).collect().head
    assert(before == after)
    val streams = spark.read.parquet(s"$dir/streams").collect()
    assert(streams.length == 1) // one unique stream (app=web)
  }

  test("enforceRetention drops whole expired day partitions") {
    val dir = tmp("retention")
    appendLines(dir, "2024-01-01", 5)
    appendLines(dir, "2024-01-20", 7)
    val dropped = Compaction.enforceRetention(spark, dir, retentionDays = 30,
      today = java.time.LocalDate.parse("2024-02-05"))
    assert(dropped == Seq("2024-01-01"))
    val logs = LogStore.read(spark, dir)
    assert(logs.count() == 7)
    assert(LogStore.listDays(dir) == Seq("2024-01-20"))
    // idempotent: nothing left to drop
    assert(Compaction.enforceRetention(spark, dir, 30,
      java.time.LocalDate.parse("2024-02-05")).isEmpty)
  }

  test("a stream pruned by retention re-registers when it emits again") {
    val dir = tmp("streamprune")
    def append(day: String, app: String): Unit = {
      import spark.implicits._
      val lines = (1 to 3).map(i =>
        s"""{"_time":"${day}T10:0$i:00Z","_msg":"m $i","app":"$app"}""")
        .toDF("value")
      Ingest.appendBatch(Ingest.parseJsonline(lines), dir, Seq("app"))
    }
    append("2024-01-01", "old") // stream 'old' lives only in the expired day
    append("2024-01-20", "new")
    assert(spark.read.parquet(s"$dir/streams").count() == 2)
    Compaction.enforceRetention(spark, dir, 30,
      java.time.LocalDate.parse("2024-02-05"))
    // day gone → dead stream pruned from the streams table
    assert(spark.read.parquet(s"$dir/streams").count() == 1)
    // 'old' emits again: the ingest path's known-streams set must have
    // been reset by the prune, or this append would skip registration
    append("2024-02-04", "old")
    assert(spark.read.parquet(s"$dir/streams").count() == 2)
  }

  test("optimize maintains the bloom sidecar incrementally; queries stay correct") {
    val dir = tmp("compactbloom")
    (1 to 3).foreach(_ => appendLines(dir, "2024-01-01", 10, i => s"bloomword row $i"))
    MsgBloom.build(spark, dir)
    assert(MsgBloom.query(spark, dir, "bloomword | stats count() c")
      .collect().head.getLong(0) == 30)
    Compaction.optimize(spark, dir)
    // the sidecar SURVIVES compaction: rows for replaced files were pruned
    // and the merged output files were bloomed from their own data — never
    // a full-store rebuild
    assert(new java.io.File(s"$dir/msg_bloom/_SUCCESS").exists())
    assert(MsgBloom.query(spark, dir, "bloomword | stats count() c")
      .collect().head.getLong(0) == 30)
    // pruning power intact over the compacted layout
    assert(MsgBloom.candidateFiles(spark, dir, Seq("qqqmissing")).get.isEmpty)
    assert(MsgBloom.candidateFiles(spark, dir, Seq("bloomword")).get.nonEmpty)
  }

  test("bloom refresh blooms only delta files; stale sidecar stays scan-safe") {
    val dir = tmp("bloomrefresh")
    appendLines(dir, "2024-01-01", 10, i => s"firstword row $i")
    MsgBloom.build(spark, dir)
    val sidecarRows0 = spark.read.parquet(s"$dir/msg_bloom").count()
    // new flush file: absent from the sidecar → still scanned (correct),
    // and listed as a must-scan candidate even for unknown tokens
    appendLines(dir, "2024-01-02", 5, i => s"secondword row $i")
    assert(MsgBloom.query(spark, dir, "secondword | stats count() c")
      .collect().head.getLong(0) == 5)
    assert(MsgBloom.candidateFiles(spark, dir, Seq("qqqmissing")).get.nonEmpty)
    val (added, _) = MsgBloom.refresh(spark, dir)
    assert(added > 0)
    assert(spark.read.parquet(s"$dir/msg_bloom").count() == sidecarRows0 + added)
    // after refresh the new file is bloomed: unknown tokens prune to zero,
    // real tokens still match
    assert(MsgBloom.candidateFiles(spark, dir, Seq("qqqmissing")).get.isEmpty)
    assert(MsgBloom.query(spark, dir, "secondword | stats count() c")
      .collect().head.getLong(0) == 5)
    // second refresh is a no-op
    assert(MsgBloom.refresh(spark, dir)._1 == 0)
    // a file whose rows are all token-less gets an explicit empty bloom
    // (pruned for every token) instead of being re-bloomed every tick
    appendLines(dir, "2024-01-03", 3, _ => "...!!...")
    val (added2, _) = MsgBloom.refresh(spark, dir)
    assert(added2 > 0)
    assert(MsgBloom.refresh(spark, dir)._1 == 0)
    assert(MsgBloom.candidateFiles(spark, dir, Seq("qqqmissing")).get.isEmpty)
  }

  test("zero-row data files get a sidecar entry instead of eternal re-reads") {
    val dir = tmp("bloomzerorow")
    appendLines(dir, "2024-01-01", 4, i => s"zword row $i")
    MsgBloom.build(spark, dir)
    // plant a zero-ROW parquet file in a partition dir (an empty flush /
    // compaction artifact): input_file_name() yields no rows for it, so
    // it can never be named by reading the data — the sidecar entry must
    // derive from the missing path itself
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val one = walk(new java.io.File(s"$dir/logs"))
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
    val scratch = tmp("bloomzerorow-scratch")
    spark.read.parquet(one.getPath).limit(0).repartition(1)
      .write.mode("overwrite").parquet(s"$scratch/empty")
    val emptyPart = new java.io.File(s"$scratch/empty").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.copy(emptyPart.toPath,
      Paths.get(one.getParent, "part-zero-rows.snappy.parquet"))
    LogStore.invalidateCaches(dir) // the copy bypassed the write path
    // first refresh covers the empty file (all-zero bloom); the second is
    // a genuine no-op — before the fix the file stayed "missing" forever
    assert(MsgBloom.refresh(spark, dir)._1 == 1)
    assert(MsgBloom.refresh(spark, dir)._1 == 0)
    // pruning and querying stay correct: unknown tokens prune everything,
    // real tokens still hit, and the partition-dir %3A escaping survives
    // the stored-form round trip (candidate paths must re-read cleanly)
    assert(MsgBloom.candidateFiles(spark, dir, Seq("qqqmissing")).get.isEmpty)
    assert(MsgBloom.query(spark, dir, "zword | stats count() c")
      .collect().head.getLong(0) == 4)
  }

  test("tailStream surfaces appended rows through the LogsQL filter") {
    val dir = tmp("tailstream")
    appendLines(dir, "2024-01-01", 5)
    val q = Ingest.tailStream(spark, dir, "needle")
      .writeStream.format("memory").queryName("tailq")
      .option("checkpointLocation", s"$dir/.tail_ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("tailq").count() == 0) // no needles yet
      appendLines(dir, "2024-01-02", 3, i => s"needle row $i")
      appendLines(dir, "2024-01-02", 4) // noise the filter must drop
      q.processAllAvailable()
      assert(spark.table("tailq").count() == 3)
      assert(spark.table("tailq").select("_msg").collect()
        .forall(_.getString(0).startsWith("needle")))
    } finally q.stop()
  }

  test("stale bloom sidecar never hides appended rows") {
    val dir = tmp("bloomstale")
    appendLines(dir, "2024-01-01", 10)
    MsgBloom.build(spark, dir)
    // sidecar built; now append rows with a token the sidecar never saw
    appendLines(dir, "2024-01-02", 3, i => s"zzzneedle row $i")
    val c = MsgBloom.query(spark, dir, "zzzneedle | stats count() c")
      .collect().head.getLong(0)
    assert(c == 3) // absent-from-sidecar files are always-scan candidates
    // and pruning still works for tokens the sidecar does know
    val c2 = MsgBloom.query(spark, dir, "qqqmissing | stats count() c")
      .collect().head.getLong(0)
    assert(c2 == 0)
  }

  test("concurrent ingest and background compaction lose nothing") {
    val dir = tmp("race")
    // seed so the compactor has something to chew on immediately
    (1 to 8).foreach(_ => appendLines(dir, "2024-01-01", 5))
    val handle = Compaction.startBackground(spark, dir, intervalMs = 150L,
      minFilesToCompact = 4)
    try {
      // keep appending while ticks fire (each append = one micro-batch file)
      (1 to 12).foreach { i =>
        appendLines(dir, "2024-01-01", 5, j => s"racing row $i-$j")
        Thread.sleep(60)
      }
      Thread.sleep(600) // let a final tick land on the raced appends
    } finally handle.close()
    // verify AFTER the ticker stops: the race under test already happened
    // (appends interleaved with live compaction swaps); verifying while
    // ticks keep firing makes the read itself race every swap, and on a
    // loaded JVM a >150ms read never wins — that starvation is the
    // documented client contract (withStaleRetry), not data loss
    LogStore.invalidateCaches(dir)
    def total(): Long =
      try Compiler.run(LogStore.read(spark, dir), "* | stats count() c")
        .collect().head.getLong(0)
      catch { case _: org.apache.spark.SparkException =>
        LogStore.invalidateCaches(dir); -1L }
    var tries = 0
    while (total() != 100L && tries < 30) { Thread.sleep(200); tries += 1 }
    assert(total() == 100L) // 8*5 seed + 12*5 raced
    assert(Compiler.run(LogStore.read(spark, dir),
      "racing | stats count() c").collect().head.getLong(0) == 60L)
  }

  test("background lifecycle compacts fragmented partitions on its own") {
    val dir = tmp("background")
    (1 to 10).foreach(_ => appendLines(dir, "2024-01-01", 5))
    val filesBefore = dataFileCount(dir)
    assert(filesBefore >= 10)
    val q = "* | stats count() c, count_uniq(_stream_id) cs"
    val before = Compiler.run(LogStore.read(spark, dir), q).collect().head

    val handle = Compaction.startBackground(spark, dir, intervalMs = 250L,
      minFilesToCompact = 8)
    try {
      var tries = 0
      while (dataFileCount(dir) >= filesBefore && tries < 80) {
        Thread.sleep(250); tries += 1
      }
      assert(dataFileCount(dir) < filesBefore,
        s"background compaction never ran ($filesBefore files still)")
      // a query racing the swap can observe FILE_NOT_EXIST once and must
      // retry on a fresh relation — that's the live-compactor contract
      val after =
        try Compiler.run(LogStore.read(spark, dir), q).collect().head
        catch { case _: org.apache.spark.SparkException =>
          LogStore.invalidateCaches(dir)
          Compiler.run(LogStore.read(spark, dir), q).collect().head
        }
      assert(before == after)
      // streams consolidated too (compaction tick dedups); reads can race
      // the swap exactly like log reads, so poll with retry
      def streamsCount(): Long =
        try spark.read.parquet(s"$dir/streams").count()
        catch { case _: org.apache.spark.SparkException => -1L }
      var tries2 = 0
      while (streamsCount() != 1 && tries2 < 40) {
        Thread.sleep(250); tries2 += 1
      }
      assert(streamsCount() == 1)
    } finally handle.close()
  }

  test("hot-field promotion: pending coalesce, write-through, materialized pushdown") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, map_contains_key}
    val dir = tmp("promote")
    def append(day: String, lvls: Seq[String]): Unit = {
      val lines = lvls.zipWithIndex.map { case (l, i) =>
        s"""{"_time":"${day}T10:0${i % 6}:00Z","_msg":"m$i","app":"web","lvl":"$l"}"""
      }.toDF("value")
      Ingest.appendBatch(Ingest.parseJsonline(lines), dir, Seq("app"))
    }
    // files written BEFORE promotion carry lvl only inside the fields map
    append("2024-01-01", Seq("info", "error", "info"))
    val q = """lvl:="error" | stats count() c"""
    assert(Compiler.run(LogStore.read(spark, dir), q).collect().head.getLong(0) == 1)

    LogStore.promoteFields(dir, Seq("lvl"))
    // pending state: old files answer through the coalesce fallback
    val pending = LogStore.read(spark, dir)
    assert(pending.columns.contains("lvl"))
    assert(Compiler.run(pending, q).collect().head.getLong(0) == 1)
    // map no longer exposes the promoted key; field_names counts it once
    assert(pending.filter(map_contains_key(col("fields"), "lvl")).count() == 0)

    // writes AFTER promotion materialize the column physically
    append("2024-01-02", Seq("error", "info"))
    val mixed = LogStore.read(spark, dir)
    assert(Compiler.run(mixed, q).collect().head.getLong(0) == 2)

    // materialization rewrites the backlog: every file physical, manifest
    // done, reads are plain columns and the predicate reaches the scan
    Compaction.materializePromotion(spark, dir)
    assert(LogStore.promotedFields(dir).forall(_._2))
    val done = LogStore.read(spark, dir)
    val res = Compiler.run(done, q)
    assert(res.collect().head.getLong(0) == 2)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lvl"), plan)
    // promoted column really is physical in every parquet file now
    val rawFiles = spark.read.parquet(s"$dir/logs")
    assert(rawFiles.schema.fieldNames.contains("lvl"))
    assert(rawFiles.filter(col("lvl").isNull).count() == 0)
    // reserved names stay unpromotable
    intercept[IllegalArgumentException] {
      LogStore.promoteFields(dir, Seq("_time"))
    }
  }

  test("compaction writes row-group bloom filters for high-card string columns") {
    import spark.implicits._
    val dir = tmp("rgbloom")
    // 60k distinct trace ids in one day → FieldNameMeta nd ≥ 50k → the
    // compacted rewrite must carry a parquet column bloom for `trace`
    val df = spark.range(0, 60000, 1, 4)
      .select(
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.lit(1704067200000000L) +
          org.apache.spark.sql.functions.col("id")).as("_time"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("m"),
          org.apache.spark.sql.functions.col("id")).as("_msg"),
        org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.hex(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("id")))).as("trace"),
        // several streams, so the bulk load spreads over multiple files
        // and the partition actually qualifies for compaction
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("app"),
          org.apache.spark.sql.functions.col("id") % 8).as("app"))
    LogStore.ingest(df, dir, Seq("app"), filesPerDay = 4)
    val needle = graft.logql.Compiler.run(LogStore.read(spark, dir),
      "* | limit 1 | fields trace").collect()(0).getString(0)
    Compaction.optimize(spark, dir, minFilesToCompact = 2,
      skipAtTargetSize = false)
    // footer check: some data file carries a bloom offset for `trace`
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = Fs.list(s"$dir/logs").flatMap(t => Fs.list(t.getPath.toString))
      .flatMap(d => Fs.list(d.getPath.toString))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val hasBloom = files.exists { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
      try r.getFooter.getBlocks.asScala.exists(
        _.getColumns.asScala.exists(c =>
          c.getPath.toDotString == "trace" && c.getBloomFilterOffset > 0))
      finally r.close()
    }
    assert(hasBloom, "no row-group bloom written for trace")
    // sorted/_msg columns stay bloom-free; results stay exact
    val noMsgBloom = files.forall { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
      try r.getFooter.getBlocks.asScala.forall(
        _.getColumns.asScala.forall(c =>
          c.getPath.toDotString != "_msg" || c.getBloomFilterOffset <= 0))
      finally r.close()
    }
    assert(noMsgBloom)
    assert(graft.logql.Compiler.run(LogStore.read(spark, dir),
      s"trace:=$needle | stats count() c").collect()(0).getLong(0) == 1L)
  }
}
