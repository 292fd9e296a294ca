package graft.server

import java.util.concurrent.atomic.AtomicLong

/** Process-wide engine counters, exposed in Prometheus text format at
  * `/metrics` like the reference binary (VictoriaMetrics/metrics is wired
  * into every vlinsert/vlselect handler; e.g. app/vlinsert/main.go request
  * counters, vlselect concurrency gauges). Counters are plain atomics —
  * scraping must never contend with the hot path.
  */
object Metrics {
  val rowsIngested = new AtomicLong     // rows committed through appendBatch
  val ingestRequests = new AtomicLong   // HTTP /insert/* requests accepted
  val ingestCommits = new AtomicLong    // group-commit write jobs
  val selectRequests = new AtomicLong   // HTTP /select/* requests served
  val selectRejected = new AtomicLong   // 429s from admission control
  val compactions = new AtomicLong      // partitions merged by lifecycle
  val retentionDaysDropped = new AtomicLong // _day partitions expired
  val bloomFilesRefreshed = new AtomicLong // files bloomed incrementally
  val activeForceMerges = new AtomicLong // in-flight /internal/force_merge
  val staleIndexRetries = new AtomicLong // queries re-run after a file swap
  val schemaManifestFallbacks = new AtomicLong // manifest-bearing store read fell back to inference
  val schemaManifestUpdateFailures = new AtomicLong // flush-path manifest update failed
  val schemaConformCasts = new AtomicLong // appended columns cast to the manifest's physical type
  /** live gauge suppliers registered by the servers (concurrency etc.) */
  private val gauges =
    new java.util.concurrent.ConcurrentHashMap[String, () => Long]()

  def registerGauge(name: String, value: () => Long): Unit =
    gauges.put(name, value)

  def render(): String = {
    val sb = new StringBuilder
    def c(name: String, v: Long): Unit = {
      sb.append("# TYPE ").append(name).append(" counter\n")
      sb.append(name).append(' ').append(v).append('\n')
    }
    c("graft_rows_ingested_total", rowsIngested.get)
    c("graft_ingest_requests_total", ingestRequests.get)
    c("graft_ingest_commits_total", ingestCommits.get)
    c("graft_select_requests_total", selectRequests.get)
    c("graft_select_rejected_total", selectRejected.get)
    c("graft_compacted_partitions_total", compactions.get)
    c("graft_retention_days_dropped_total", retentionDaysDropped.get)
    c("graft_bloom_files_refreshed_total", bloomFilesRefreshed.get)
    c("graft_stale_index_retries_total", staleIndexRetries.get)
    c("graft_schema_manifest_fallbacks_total", schemaManifestFallbacks.get)
    c("graft_schema_manifest_update_failures_total",
      schemaManifestUpdateFailures.get)
    c("graft_schema_conform_casts_total", schemaConformCasts.get)
    c("graft_field_names_meta_served_total", graft.store.FieldNameMeta.served.get)
    c("graft_facets_meta_assisted_total",
      graft.store.FieldNameMeta.facetsAssisted.get)
    sb.append("# TYPE graft_active_force_merges gauge\n")
    sb.append("graft_active_force_merges ").append(activeForceMerges.get).append('\n')
    gauges.forEach { (name, v) =>
      sb.append("# TYPE ").append(name).append(" gauge\n")
      sb.append(name).append(' ').append(v()).append('\n')
    }
    sb.toString
  }
}
