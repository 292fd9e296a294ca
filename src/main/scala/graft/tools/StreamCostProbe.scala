package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: where do the q_stream_* bench entries' ~2s go?
  * Times each drive at several shuffle-partition settings (state store
  * instance count == stateful operator's shuffle partitions) and reports
  * per-phase wall for one instrumented drive. Not part of the engine. */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    // warm the store build + JVM outside any timed region; print result
    // digests so an A/B of drive-session changes can confirm identity
    def digest(name: String, rows: Array[org.apache.spark.sql.Row]): Unit =
      println(s"[result] $name n=${rows.length} " +
        s"hash=${rows.map(_.toString).sorted.mkString("|").hashCode}")
    digest("dedup", graft.streaming.StreamOracle.dedupResult(spark, d).collect())
    digest("sessions", graft.streaming.StreamOracle.sessionsResult(spark, d).collect())
    digest("neardup", graft.streaming.StreamOracle.nearDupResult(spark, d).collect())

    // phase decomposition of one dedup drive at parts=2: where does the
    // residual ~0.7s go? (start→first-batch, processAllAvailable, stop,
    // result agg)
    {
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val dir = graft.streaming.StreamOracle.ensureStore(spark, d)
      (1 to 2).foreach { _ =>
        val qn = s"probe_dedup_${System.nanoTime()}"
        val t0 = System.nanoTime()
        val src = graft.streaming.StatefulOps.dedupStream(spark, dir, "*",
          Seq("event_type", "user_id"), watermarkDelay = "36500 days")
        val t1 = System.nanoTime()
        val q = src.writeStream.format("memory").queryName(qn)
          .outputMode("append")
          .option("checkpointLocation", s"/dev/shm/graft_drive_ckpt/$qn")
          .start()
        val t2 = System.nanoTime()
        q.processAllAvailable()
        val t3 = System.nanoTime()
        q.stop()
        val t4 = System.nanoTime()
        spark.table(qn).filter(col("event_type") =!= "zzz_sentinel")
          .groupBy("event_type").agg(count(lit(1)).as("uniq_users"))
          .orderBy("event_type").collect()
        val t5 = System.nanoTime()
        def ms(a: Long, b: Long) = f"${(b - a) / 1e6}%.0f"
        println(s"[phase] build=${ms(t0,t1)} start=${ms(t1,t2)} " +
          s"drain=${ms(t2,t3)} stop=${ms(t3,t4)} agg=${ms(t4,t5)}")
        q.recentProgress.foreach { p =>
          println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
      }
    }

    for (parts <- Seq(32, 8, 2, 1)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      def time3(name: String, f: => Unit): Unit = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"parts=$parts%-3d $name%-16s ${ts.map(t => f"$t%.3f").mkString(" ")}")
      }
      time3("stream_dedup",
        graft.streaming.StreamOracle.dedupResult(spark, d).collect())
      time3("stream_sessions",
        graft.streaming.StreamOracle.sessionsResult(spark, d).collect())
      time3("stream_neardup",
        graft.streaming.StreamOracle.nearDupResult(spark, d).collect())
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
