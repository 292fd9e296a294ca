package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The parallel path's skew-proof stream_context frames (bucketed local
  * windows + edge-row resolution) must be row-identical to the single
  * per-stream window the interactive path keeps — exercised on a fixture
  * built to stress every boundary case: rows straddling 15-minute bucket
  * edges, sparse buckets (1-2 rows), frames crossing a fully-sparse
  * bucket, asymmetric before/after, same-timestamp rows, and
  * time_window cutoffs. */
class StreamContextSkewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val src = {
    // stream A: dense around two 15-min boundaries + a match sitting
    // exactly on one; stream B: sparse (one row per bucket); stream C:
    // a burst of same-timestamp rows with a match among them
    val b = 900L // seconds per bucket
    val rows: Seq[(String, Long, String)] = Seq(
      // (stream, secOffset, level)
      ("A", b - 3, "info"), ("A", b - 2, "info"), ("A", b - 1, "error"),
      ("A", b, "info"), ("A", b + 1, "info"), ("A", b + 2, "error"),
      ("A", 2 * b - 1, "info"), ("A", 2 * b, "error"), ("A", 2 * b + 1, "info"),
      // a lone far row: outside every time_window
      ("A", 10 * b, "info"),
      ("B", 1L, "info"), ("B", b + 1, "error"), ("B", 2 * b + 1, "info"),
      ("B", 5 * b + 1, "info"),
      ("C", 3 * b, "info"), ("C", 3 * b, "error"), ("C", 3 * b, "info"),
      ("C", 3 * b, "info"), ("C", 3 * b + 1, "info"))
    rows.zipWithIndex.map { case ((s, off, lvl), i) =>
      (java.sql.Timestamp.from(
         java.time.Instant.parse("2024-05-01T00:00:00Z").plusSeconds(off)),
       s"m$i $lvl", s, lvl)
    }.toDF("_time", "_msg", "app", "level")
  }

  private def store(): String = {
    val dir = s"/root/repo/target/ctxskew_spec/${System.nanoTime()}"
    graft.store.LogStore.ingest(src, dir, Seq("app"))
    dir
  }

  private def run(s: org.apache.spark.sql.SparkSession, dir: String,
                  q: String): Seq[String] =
    Compiler.run(graft.store.LogStore.read(s, dir), q)
      .select(col("_msg"), col("_time").cast("string"))
      .collect().map(_.toString).sorted.toSeq

  test("parallel bucketed frames == interactive single window") {
    val dir = store()
    val inter = graft.Sessions.interactive(spark)
    val queries = Seq(
      "level:error | stream_context before 2 after 1 time_window 30m",
      "level:error | stream_context before 3 after 3 time_window 2s",
      "level:error | stream_context before 1 after 4 time_window 1d",
      "level:error | stream_context before 0 after 2 time_window 16m",
      "level:error | stream_context before 5 after 0 time_window 1h")
    queries.foreach { q =>
      val par = run(spark, dir, q)   // plain session → parallel path
      val one = run(inter, dir, q)   // interactive → single window
      assert(par == one, s"query [$q]\nparallel=$par\ninteractive=$one")
      assert(par.nonEmpty, s"vacuous fixture for [$q]")
    }
  }
}
