package graft.server

import graft.SparkSuite
import graft.logql.Compiler
import graft.store.LogStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Direct group-commit semantics: merged flushes, and the per-entry retry
  * that keeps one poisoned payload from failing its whole group. */
class GroupCommitterSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/committer_test/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  // a builder that parses jsonline but detonates (at execution time, i.e.
  // inside the flush job) on any line containing the marker
  private def boobyTrapped(marker: String): DataFrame => DataFrame = { in =>
    graft.streaming.Ingest.parseJsonline(
      in.withColumn("value",
        when(col("value").contains(marker),
          raise_error(concat(lit("poison: "), col("value"))))
          .otherwise(col("value"))))
  }

  test("a poisoned payload in a merged group fails alone") {
    val dir = tmp("poison")
    val gc = new GroupCommitter(spark, dir)
    try {
      val good1 = GroupCommitter.Lines(Seq(
        """{"_time":"2024-01-05T10:00:00Z","_msg":"good one","app":"web"}"""))
      val bad = GroupCommitter.Lines(Seq(
        """{"_time":"2024-01-05T10:00:01Z","_msg":"BOOM here","app":"web"}"""))
      val good2 = GroupCommitter.Lines(Seq(
        """{"_time":"2024-01-05T10:00:02Z","_msg":"good two","app":"web"}"""))
      val build = boobyTrapped("BOOM")
      // same key → all three merge into one flush; block the flusher long
      // enough to let the queue fill by submitting from parallel threads
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      def submit(p: GroupCommitter.Payload) =
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] =
            try { gc.append(p, "k", build, Seq("app"), "0:0"); None }
            catch { case e: Throwable => Some(e.getMessage) }
        })
      val futs = Seq(submit(good1), submit(bad), submit(good2))
      val results = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      // exactly the poisoned entry failed, with its own error
      assert(results.count(_.isDefined) == 1)
      assert(results.flatten.head.contains("poison"))
      // both good payloads are committed and queryable
      val c = Compiler.run(LogStore.read(spark, dir), "good | stats count() c")
        .collect().head.getLong(0)
      assert(c == 2)
    } finally gc.close()
  }
}
