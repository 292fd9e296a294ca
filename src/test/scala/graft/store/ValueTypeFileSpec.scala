package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** File-granularity value_type (filter_value_type.go:67 answers per
  * BLOCK; a parquet file is this store's block): compaction writes
  * per-file verdicts, and a day-part holding mixed-type files compiles
  * to a `_metadata.file_name` predicate that admits exactly the matching
  * files' rows — narrowing the former part-level deviation. */
class ValueTypeFileSpec extends SparkSuite {
  import spark.implicits._

  private def append(dir: String, day: String, app: String,
                     msgs: Seq[String]): Unit =
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline(msgs.map(m =>
        s"""{"_time":"${day}T10:00:00Z","_msg":"$m","app":"$app"}""").toDF("value")),
      dir, Seq("app"))

  test("mixed-type files in one day-part answer per file, pruning the scan") {
    val dir = s"/root/repo/target/vtfile_spec/${System.nanoTime()}"
    val day = "2024-04-01"
    val part = s"tenant=0:0/_day=$day"
    // one pure-uint8 stream file and one pure-string stream file in the
    // SAME day partition (each append holds one stream; empty shuffle
    // partitions write no files)
    append(dir, day, "numbers", (0 until 20).map(i => (i % 200).toString))
    append(dir, day, "words", (0 until 10).map(i => s"alpha $i beta"))
    val files = LogStore.listPartFiles(dir, part)
    assert(files.size == 2, s"expected 2 one-stream files, got $files")
    // the compaction write path's classification, applied to the files
    // in place (compactPartition does exactly this over its fresh tmp
    // files): whole-part verdict + per-file verdicts
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val pdir = s"$dir/logs/tenant=${escapePathName("0:0")}/_day=$day"
    val partDf = spark.read.parquet(pdir)
    val fileTypes = ValueTypeMeta.classifyFiles(partDf)
    assert(fileTypes.keySet == files, fileTypes)
    assert(fileTypes.values.map(_("_msg")).toSet == Set("uint8", "string"),
      fileTypes)
    ValueTypeMeta.recordPart(dir, part,
      ValueTypeMeta.classifyPart(partDf), fileTypes)
    // rows answer per FILE: the uint8 file's 20 rows match uint8, the
    // string file's 10 match string — a part-level verdict ("string",
    // values mixed) would have answered 0 and 30
    val logs = LogStore.read(spark, dir)
    def cnt(t: String): Long = graft.logql.Compiler.run(logs,
      s"_msg:value_type($t) | stats count() c").collect().head.getLong(0)
    assert(cnt("uint8") == 20L, "uint8 must match only the numeric file")
    assert(cnt("string") == 10L, "string must match only the word file")
    assert(cnt("float64") == 0L)
    // and the scan PRUNES: the _metadata.file_name predicate is applied
    // at file listing, so the non-matching file never enters the scan
    val q = graft.logql.Compiler.run(logs,
      "_msg:value_type(uint8) | stats count() c")
    q.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val numFiles = scans(q.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(numFiles == 1L,
      s"expected the non-matching file pruned from the scan, read $numFiles")
  }

  test("compaction records per-file verdicts; append drops part AND file entries") {
    val dir = s"/root/repo/target/vtfile_spec/${System.nanoTime()}"
    val day = "2024-04-02"
    val part = s"tenant=0:0/_day=$day"
    append(dir, day, "numbers", (0 until 20).map(i => (i % 9).toString))
    append(dir, day, "numbers", (20 until 40).map(i => (i % 9).toString))
    Compaction.optimize(spark, dir)
    val side = ValueTypeMeta.load(dir)
    val fileKeys = side.keySet.filter(_.startsWith(part + "/"))
    assert(side.contains(part), side.keySet)
    assert(fileKeys.nonEmpty, "compaction must write per-file verdicts")
    assert(fileKeys.forall(k => side(k)("_msg") == "uint8"), side)
    // the file verdicts match the files actually on disk
    assert(fileKeys.map(_.stripPrefix(part + "/")) ==
      LogStore.listPartFiles(dir, part))
    // a later append stales the WHOLE family: part entry and file entries
    append(dir, day, "numbers", Seq("not a number"))
    val after = ValueTypeMeta.load(dir)
    assert(!after.contains(part))
    assert(!after.keySet.exists(_.startsWith(part + "/")), after.keySet)
  }

  test("fused compactionStats equals the three separate passes it replaced") {
    val dir = s"/root/repo/target/vtfile_spec/${System.nanoTime()}"
    val day = "2024-04-03"
    // two streams, mixed types, map fields AND empty values in play
    append(dir, day, "numbers", (0 until 15).map(i => (i % 128).toString))
    append(dir, day, "words", (0 until 7).map(i => s"gamma $i"))
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val pdir = s"$dir/logs/tenant=${escapePathName("0:0")}/_day=$day"
    val partDf = spark.read.parquet(pdir)
    val (partTypes, fileTypes, hits) = ValueTypeMeta.compactionStats(partDf)
    assert(partTypes == ValueTypeMeta.classifyPart(partDf))
    assert(fileTypes == ValueTypeMeta.classifyFiles(partDf))
    assert(hits.view.mapValues(_.hits).toMap ==
      FieldNameMeta.countsForPart(partDf))
    assert(hits("_msg").hits == 22L, hits) // sanity: not vacuously equal
    // v2 facets-assist stats ride the same rollup: exact non-empty
    // distinct counts, max value length, and a complete dict for
    // dict-class fields
    assert(hits("_msg").nd == 22L && hits("_msg").dict.isEmpty, hits("_msg"))
    assert(hits("app").nd == 2L &&
      hits("app").dict.contains(Map("numbers" -> 15L, "words" -> 7L)),
      hits("app"))
    assert(hits("app").maxlen == "numbers".length, hits("app"))
  }
}
