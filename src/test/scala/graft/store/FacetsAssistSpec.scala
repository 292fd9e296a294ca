package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Sidecar-assisted facets (FieldNameMeta v2): dict-class fields served
  * without reading values, provably-over-cap fields skipped without
  * reading values, everything else scanned — result identical to the
  * full-scan pipe in every case. */
class FacetsAssistSpec extends SparkSuite {
  import spark.implicits._

  /** Store with three field classes: `app` (2 values — dict in every
    * part), `k8s_pod` (unique per row — over any small cap in one part),
    * `note` (a handful of values). Built through the parse path so the
    * dynamic fields live in the `fields` map (the store's top-level
    * schema contract: fixed columns + promoted fields only), then
    * compacted so the sidecar stats land. */
  private def mkStore(): String = {
    val dir = s"/root/repo/target/facets_spec/${System.nanoTime()}"
    val lines = (0 until 40).map { i =>
      s"""{"_time":"2024-03-0${1 + i % 2}T10:00:00Z","_msg":"m$i",""" +
        s""""app":"${if (i % 2 == 0) "web" else "api"}",""" +
        s""""k8s_pod":"pod-$i","note":"note${i % 12}"}"""
    }
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline(lines.toDF("value")),
      dir, Seq("app"))
    Compaction.optimize(spark, dir, minFilesToCompact = 1)
    dir
  }

  private def facets(df: org.apache.spark.sql.DataFrame,
                     q: String): Set[(String, String, Long)] =
    graft.logql.Compiler.run(df, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("assisted facets equals the full-scan pipe, and assists") {
    val dir = mkStore()
    val logs = LogStore.read(spark, dir)
    // a Project breaks the pristine-scan detection without changing data
    val fallbackSrc = logs.select(logs.columns.map(col).toSeq: _*)
    val q = "* | facets 5 max_values_per_field 10"
    val before = FieldNameMeta.facetsAssisted.get
    val assisted = facets(logs, q)
    assert(FieldNameMeta.facetsAssisted.get == before + 1,
      "sidecar assist did not run on a pristine store scan")
    val fallback = facets(fallbackSrc, q)
    assert(FieldNameMeta.facetsAssisted.get == before + 1,
      "projected source must take the full-scan path")
    assert(assisted == fallback, s"assisted=$assisted fallback=$fallback")
    // the cap provably drops k8s_pod (one part alone has 20 > 10 values)
    assert(!assisted.exists(_._1 == "k8s_pod"))
    // dict-served field present with exact counts
    assert(assisted.contains(("app", "web", 20L)) &&
           assisted.contains(("app", "api", 20L)), assisted)
  }

  test("append invalidation falls back; compaction re-enables assist") {
    val dir = mkStore()
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline(Seq(
        """{"_time":"2024-03-01T11:00:00Z","_msg":"x","app":"web","note":"fresh"}""")
        .toDF("value")), dir, Seq("app"))
    val q = "* | facets 5 max_values_per_field 10"
    val before = FieldNameMeta.facetsAssisted.get
    val scanned = facets(LogStore.read(spark, dir), q)
    assert(FieldNameMeta.facetsAssisted.get == before,
      "assist must not serve after an uncounted append")
    Compaction.optimize(spark, dir)
    val assisted = facets(LogStore.read(spark, dir), q)
    assert(FieldNameMeta.facetsAssisted.get == before + 1)
    assert(assisted == scanned, s"assisted=$assisted scanned=$scanned")
  }

  test("keep-const baseline sees dict-served and skipped fields") {
    val dir = mkStore()
    val logs = LogStore.read(spark, dir)
    val fallbackSrc = logs.select(logs.columns.map(col).toSeq: _*)
    // default keep_const=false: a field constant across every row must
    // drop even when the row-count baseline comes from a non-scanned
    // field; compare both paths on a store where `_stream` is NOT const
    // but per-field hit maxima come from dict-served fields
    val q = "* | facets 3 max_values_per_field 3"
    assert(facets(logs, q) == facets(fallbackSrc, q))
  }

  /** All-dict store with a genuinely constant field: the sidecar decides
    * the drop-constant rule exactly and the whole pipe serves from a
    * LocalRelation (no scan, no Spark-side const-detection subtree). */
  private def mkDictStore(): String = {
    val dir = s"/root/repo/target/facets_spec/${System.nanoTime()}"
    val lines = (0 until 40).map { i =>
      s"""{"_time":"2024-03-0${1 + i % 2}T10:00:00Z","_msg":"m${i % 3}",""" +
        s""""app":"${if (i % 2 == 0) "web" else "api"}",""" +
        s""""env":"prod","note":"note${i % 4}"}"""
    }
    graft.streaming.Ingest.appendBatch(
      graft.streaming.Ingest.parseJsonline(lines.toDF("value")),
      dir, Seq("app"))
    Compaction.optimize(spark, dir, minFilesToCompact = 1)
    dir
  }

  test("sidecar-exact const detection: both paths drop the const field") {
    val dir = mkDictStore()
    val logs = LogStore.read(spark, dir)
    val fallbackSrc = logs.select(logs.columns.map(col).toSeq: _*)
    val q = "* | facets 5 max_values_per_field 10"
    val assisted = facets(logs, q)
    assert(assisted == facets(fallbackSrc, q))
    // env is one value over every row → dropped by the const rule
    assert(!assisted.exists(_._1 == "env"), assisted)
    // keep_const_fields keeps it, on both paths
    val qk = "* | facets 5 max_values_per_field 10 keep_const_fields"
    val kept = facets(logs, qk)
    assert(kept == facets(fallbackSrc, qk))
    assert(kept.contains(("env", "prod", 40L)), kept)
    // fully sidecar-served: the assisted plan reads no files
    val plan = graft.logql.Compiler.run(logs, q)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), plan)
  }

  test("facets | filter field_name restriction equals filter-after") {
    val dir = mkStore()
    val logs = LogStore.read(spark, dir)
    val fallbackSrc = logs.select(logs.columns.map(col).toSeq: _*)
    val q = """* | facets 5 max_values_per_field 10
              | filter field_name:in("app", "note")"""
    val restricted = facets(logs, q)
    assert(restricted == facets(fallbackSrc, q),
      "compile-time display restriction changed results")
    assert(restricted.nonEmpty && restricted.forall(r =>
      r._1 == "app" || r._1 == "note"), restricted)
  }
}
