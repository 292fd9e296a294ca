package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Mixed bulk+protocol stores: a bulk load writes batch columns
  * physically; protocol appends carry the same field names in the
  * `fields` map. The read view must unify them (found by the 200M
  * soak: `event_type:soak` matched 0 of the appended rows). */
class MixedStoreSpec extends SparkSuite {
  import spark.implicits._

  private def mkBulk(dir: String): Unit = {
    val df = Seq(
      (Timestamp.valueOf("2024-03-01 10:00:00"), "bulk row 1", "view", 7L, 1.5),
      (Timestamp.valueOf("2024-03-01 10:00:01"), "bulk row 2", "click", 8L, 2.5))
      .toDF("_time", "_msg", "event_type", "user_id", "value")
    LogStore.ingest(df, dir, Seq("event_type"))
  }

  private def append(dir: String, lines: Seq[String]): Unit =
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline(lines.toDF("value")),
      dir, Seq("event_type"))

  private def run(dir: String, q: String) =
    graft.logql.Compiler.run(LogStore.read(spark, dir), q)

  test("appended map values are visible under bulk column names") {
    val dir = s"/root/repo/target/mixed_spec/${System.nanoTime()}"
    mkBulk(dir)
    append(dir, Seq(
      """{"_time":"2024-03-01T11:00:00Z","_msg":"appended","event_type":"soak","user_id":99,"value":3.25}""",
      """{"_time":"2024-03-01T11:00:01Z","_msg":"appended2","event_type":"soak","user_id":99,"value":1}"""))
    // the defect: this counted 0 before the fold-in view
    assert(run(dir, "event_type:soak | stats count() c")
      .collect().head.getLong(0) == 2L)
    // both populations aggregate together
    assert(run(dir, "* | stats by (event_type) count() c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("view" -> 1L, "click" -> 1L, "soak" -> 2L))
    // numeric semantics unify: bulk native doubles + appended strings
    assert(run(dir, "* | stats sum(value) s").collect().head.getDouble(0)
      == 1.5 + 2.5 + 3.25 + 1.0)
    // string rendering of the bulk double matches strF's GoFloat form
    val vals = run(dir, "* | fields value | sort by (value)")
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("1.5", "2.5", "3.25", "1"), vals)
    // field_names counts each row once (no column+map double count)
    val fn = run(dir, "* | field_names").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fn("event_type") == 4L && fn("user_id") == 4L, fn)
  }

  test("compacting a mixed partition preserves both shapes") {
    val dir = s"/root/repo/target/mixed_spec/${System.nanoTime()}"
    mkBulk(dir)
    // appends land in the SAME day partition as the bulk files
    append(dir, Seq(
      """{"_time":"2024-03-01T11:00:00Z","_msg":"appended","event_type":"soak","user_id":99,"value":3.25}"""))
    val before = run(dir, "* | stats by (event_type) count() c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Compaction.optimize(spark, dir, minFilesToCompact = 1)
    // one-footer inference here used to REWRITE the partition without the
    // other shape's columns — silent data loss
    val after = run(dir, "* | stats by (event_type) count() c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before && after == Map("view" -> 1L, "click" -> 1L,
      "soak" -> 1L), s"before=$before after=$after")
    assert(run(dir, "* | stats sum(value) s").collect().head.getDouble(0)
      == 1.5 + 2.5 + 3.25)
  }

  test("first append to a legacy store seeds the manifest by full merge") {
    val dir = s"/root/repo/target/mixed_spec/${System.nanoTime()}"
    mkBulk(dir)
    // legacy store: built before the manifest existed
    new java.io.File(s"$dir/_store_schema.json").delete()
    assert(LogStore.readSchemaManifest(dir).isEmpty)
    append(dir, Seq(
      """{"_time":"2024-03-01T11:00:00Z","_msg":"appended","event_type":"soak","user_id":99,"value":3.25}"""))
    // the seeded manifest must carry the legacy bulk columns too — a
    // manifest from the append alone would hide them from reads
    assert(run(dir, "* | stats by (event_type) count() c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("view" -> 1L, "click" -> 1L, "soak" -> 1L))
  }

  test("pure bulk store keeps native column types and plans") {
    val dir = s"/root/repo/target/mixed_spec/${System.nanoTime()}"
    mkBulk(dir)
    val df = LogStore.read(spark, dir)
    // no fields map → no fold-in: native types preserved for the oracle
    assert(!df.columns.contains("fields"))
    assert(df.schema("user_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.schema("value").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }
}
