package graft.streaming

import graft.SparkSuite
import java.nio.file.{Files, Paths}

/** Stateful streaming ops: watermark-bounded dedup and session-gap key
  * summaries over the store's tail stream. */
class StatefulOpsSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/stateful_test/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  private def append(store: String, rows: Seq[(String, String, String)]): Unit = {
    import spark.implicits._
    val lines = rows.map { case (ts, msg, app) =>
      s"""{"_time":"$ts","_msg":"$msg","app":"$app"}"""
    }.toDF("value")
    Ingest.appendBatch(Ingest.parseJsonline(lines), store, Seq("app"))
  }

  test("dedupStream passes first occurrence per key, drops repeats") {
    val store = tmp("dedup")
    append(store, Seq(
      ("2024-01-01T10:00:00Z", "evt a", "web"),
      ("2024-01-01T10:00:01Z", "evt a", "web"),  // dup _msg
      ("2024-01-01T10:00:02Z", "evt b", "web")))
    val q = StatefulOps.dedupStream(spark, store, "*", Seq("_msg"))
      .writeStream.format("memory").queryName("dedupq")
      .outputMode("append")
      .option("checkpointLocation", s"$store/.ckpt")
      .start()
    try {
      q.processAllAvailable()
      val msgs1 = spark.table("dedupq").collect()
        .map(_.getAs[String]("_msg")).sorted
      assert(msgs1.toSeq == Seq("evt a", "evt b"))
      // the same key in a later micro-batch (still inside the watermark
      // window) is dropped; a new key passes
      append(store, Seq(
        ("2024-01-01T10:00:03Z", "evt a", "web"),
        ("2024-01-01T10:00:04Z", "evt c", "web")))
      q.processAllAvailable()
      val msgs2 = spark.table("dedupq").collect()
        .map(_.getAs[String]("_msg")).sorted
      assert(msgs2.toSeq == Seq("evt a", "evt b", "evt c"))
    } finally q.stop()
  }

  test("nearDupCandidates finds CROSS-BATCH near-dups via bucket state") {
    import spark.implicits._
    val dir = tmp("neardup")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def write(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$dir/docs")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    write((1L, base), (2L, "totally different words nothing shared " +
      "here at all not even close to the first document text body"))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/docs")
    // ttlMs = 0 (NoTimeout): a processing-time timeout makes the engine
    // schedule continuous timeout-check batches, which never settles
    // under processAllAvailable in a test
    val q = StatefulOps.nearDupCandidates(stream, "text", "doc_id",
        maxBucketSize = 16)
      .toDF("id_a", "id_b")
      .writeStream.format("memory").queryName("neardupq")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/.ckpt")
      .start()
    try {
      q.processAllAvailable()
      // batch 2 arrives LATER: its near-dup of doc 1 must pair against
      // the bucket state, not just its own batch
      write((3L, base + " plus tail"))
      q.processAllAvailable()
      val pairs = spark.table("neardupq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 3L)), pairs.toString)
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), pairs.toString)
    } finally q.stop()
  }

  test("keySummaryStream closes sessions after the event-time gap") {
    val store = tmp("sessions")
    append(store, Seq(
      ("2024-01-01T10:00:00Z", "m1", "web"),
      ("2024-01-01T10:00:30Z", "m2", "web"),
      ("2024-01-01T10:00:10Z", "m3", "api")))
    val q = StatefulOps.keySummaryStream(spark, store, "*",
        keyCol = "app", gapMs = 60000L)
      .toDF().writeStream.format("memory").queryName("sessq")
      .outputMode("append")
      .option("checkpointLocation", s"$store/.ckpt")
      .start()
    try {
      q.processAllAvailable()
      // nothing closed yet: watermark sits at the max event time, which is
      // inside every session's gap window
      assert(spark.table("sessq").isEmpty)
      // an event far past the gap advances the watermark and closes both
      // earlier sessions; its own session stays open
      append(store, Seq(("2024-01-01T12:00:00Z", "m4", "batch")))
      q.processAllAvailable()
      q.processAllAvailable() // timeout fires in the batch AFTER the advance
      val rows = spark.table("sessq").collect()
        .map(r => r.getAs[String]("key") ->
          ((r.getAs[Long]("hits"),
            r.getAs[java.sql.Timestamp]("first_time").toInstant.toString,
            r.getAs[java.sql.Timestamp]("last_time").toInstant.toString))).toMap
      assert(rows.keySet == Set("web", "api"))
      assert(rows("web") == ((2L, "2024-01-01T10:00:00Z", "2024-01-01T10:00:30Z")))
      assert(rows("api") == ((1L, "2024-01-01T10:00:10Z", "2024-01-01T10:00:10Z")))
    } finally q.stop()
  }

  test("RocksDB state store: dedup state survives a query restart from checkpoint") {
    // the cluster-scale configuration the scaladocs point at — state
    // larger than executor heap goes to RocksDB — actually exercised:
    // same checkpoint, new query incarnation, the store must recall
    // every seen key across the restart
    val store = tmp("rocksdb")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      append(store, Seq(
        ("2024-01-01T10:00:00Z", "evt a", "web"),
        ("2024-01-01T10:00:01Z", "evt b", "web")))
      val ckpt = s"$store/.ckpt"
      val out = s"$store/.out"
      // the memory sink cannot recover from a checkpoint; the file sink
      // can, and its output doubles as the exactly-once evidence
      def run(): Unit = {
        val q = StatefulOps.dedupStream(spark, store, "*", Seq("_msg"))
          .select("_msg")
          .writeStream.format("parquet")
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .option("path", out)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      assert(spark.read.parquet(out).collect()
        .map(_.getString(0)).sorted.toSeq == Seq("evt a", "evt b"))
      // restart: a replayed key from BEFORE the restart plus a new one —
      // only the new key may pass, proving the RocksDB state reloaded
      append(store, Seq(
        ("2024-01-01T10:00:02Z", "evt a", "web"),
        ("2024-01-01T10:00:03Z", "evt c", "web")))
      run()
      assert(spark.read.parquet(out).collect()
        .map(_.getString(0)).sorted.toSeq == Seq("evt a", "evt b", "evt c"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
