package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-operator kernel micro-benchmarks — the counterpart of the
  * reference's Go timing tests (lib/logstorage/filter_timing_test.go:8
  * BenchmarkMatchAnyCasePrefix, block_timing_test.go:8, …): each codegen
  * kernel in `graft.functions` is timed over an N-row cached corpus, next
  * to the Column/regex tower it replaced (the same tower ExprPropertySpec
  * uses as the semantic spec), so the codegen payoff per operator is a
  * measured number, not an assertion.
  *
  * Towers run on a 10×-smaller slice, and the HOF towers (per-element
  * interpreted lambdas, ~2k rows/s) on a 1000×-smaller one — rows/s is
  * the reported unit, so the comparison stays fair.
  *
  * Usage: runMain graft.tools.KernelBenchProbe [nRows]
  */
object KernelBenchProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-kernelbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions._

    // log-like corpus: words, an IPv4, logfmt pairs, a JSON payload,
    // digit runs — every kernel has matching structure to chew on
    val corpus = spark.range(0, n, 1, 32).select(format_string(
      "GET /api/v%d/items request from 10.%d.%d.%d took %dms " +
        "level=%s user=u%d retries=%d " +
        "payload={\"k1\":%d,\"meta\":{\"k2\":\"v%d\"}} trace 0x%x done",
      pmod(col("id"), lit(3L)), pmod(col("id"), lit(256L)),
      pmod(col("id") * 7, lit(256L)), pmod(col("id") * 13, lit(256L)),
      pmod(col("id"), lit(900L)),
      element_at(array(lit("info"), lit("warn"), lit("error")),
        pmod(col("id"), lit(3L)).cast("int") + 1),
      pmod(col("id"), lit(10000L)), pmod(col("id"), lit(4L)),
      pmod(col("id"), lit(1000L)), pmod(col("id"), lit(50L)),
      col("id")).as("s")).cache()
    corpus.count() // materialize the cache so timings are kernel-only
    val sliceDf = corpus.filter(col("id") % 10 === 0).cache()
    // HOF towers interpret per ELEMENT (CodegenFallback) — measured well
    // under 1k rows/s here — so they get a 100×-smaller slice again or
    // the probe itself takes half an hour
    val tinyDf = corpus.filter(col("id") % 1000 === 0).cache()
    val corpusN = n
    val sliceN = sliceDf.count()
    val tinyN = tinyDf.count()

    def timeMs(df: => DataFrame): Double = {
      df.collect() // warm: JIT + codegen compile
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e6
      }
      runs.sorted.apply(1) // median of 3 warm runs
    }
    def agg(c: Column): DataFrame = corpus.agg(sum(c).as("x"))

    println(f"KERNELBENCH corpus=$corpusN rows (towers on $sliceN, HOF towers on $tinyN)")
    println("KERNELBENCH op                         kernel_Mrows_s tower_Mrows_s speedup")
    def rowN(name: String, kernel: Column, tower: Column,
             towerDf: DataFrame, towerN: Long): Unit = {
      val km = timeMs(agg(kernel))
      val tm = timeMs(towerDf.agg(sum(tower).as("x")))
      val kr = corpusN / km / 1e3 // M rows/s
      val tr = towerN / tm / 1e3
      println(f"KERNELBENCH $name%-28s $kr%10.2f $tr%11.4f ${kr / tr}%9.1fx")
    }
    def row(name: String, kernel: Column, tower: Column): Unit =
      rowN(name, kernel, tower, sliceDf, sliceN)
    def rowHof(name: String, kernel: Column, tower: Column): Unit =
      rowN(name, kernel, tower, tinyDf, tinyN)

    val s = col("s")
    // any-case prefix word match (BenchmarkMatchAnyCasePrefix analog):
    // tower = the ExprPropertySpec regex spec
    row("word_match_anycase_prefix",
      when(WordMatch.wordMatch(lower(s), "err", prefixMode = true), 1L).otherwise(0L),
      when(lower(s).rlike("(^|[^a-zA-Z0-9_])err"), 1L).otherwise(0L))
    row("ipv4_parse_first",
      Ipv4Parse.ipv4ToLong(regexp_extract(s, """(\d+\.\d+\.\d+\.\d+)""", 1)),
      {
        val ip = regexp_extract(s, """(\d+\.\d+\.\d+\.\d+)""", 1)
        val p = split(ip, "\\.")
        coalesce(element_at(p, 1).cast("long") * 16777216L +
          element_at(p, 2).cast("long") * 65536L +
          element_at(p, 3).cast("long") * 256L +
          element_at(p, 4).cast("long"), lit(0L))
      })
    rowHof("logfmt_parse",
      size(map_keys(LogfmtParse.logfmtToMap(s))).cast("long"),
      size(map_keys(map_filter(map_from_entries(filter(transform(
        split(s, " "),
        t => struct(substring_index(t, "=", 1).as("k"),
          when(t.contains("="), substring_index(t, "=", -1)).as("v"))),
        e => e("v").isNotNull && length(e("k")) > 0)),
        (_, v) => v.isNotNull))).cast("long"))
    row("json_get_scalar",
      length(JsonGet.scalar(regexp_extract(s, """payload=(\{.*\})""", 1),
        "meta.k2")).cast("long"),
      length(get_json_object(regexp_extract(s, """payload=(\{.*\})""", 1),
        "$.meta.k2")).cast("long"))
    row("collapse_nums",
      length(CollapseNums.collapseNums(s, prettify = false)).cast("long"),
      // the ExprPropertySpec chained-replace spec (uuid → hex → num
      // passes) — what one pass over the chars actually replaced
      length(regexp_replace(regexp_replace(regexp_replace(s,
        "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<N>-<N>-<N>-<N>-<N>"),
        "\\b0[xX][0-9a-fA-F]+\\b|\\b[0-9a-fA-F]{16,}\\b", "<N>"),
        "\\b\\d+(?:\\.\\d+)?\\b", "<N>")).cast("long"))
    rowHof("shingles_n3",
      size(Shingles.shingles(s, 3)).cast("long"),
      {
        val toks = filter(split(s, "[^a-zA-Z0-9_]+"), t => length(t) > 0)
        size(when(size(toks) >= 3, transform(
          sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
          .otherwise(array().cast("array<string>"))).cast("long")
      })
    rowHof("token_window_hashes_k8",
      size(Shingles.tokenWindowHashes(s, 8)).cast("long"),
      {
        val toks = filter(split(s, "[^a-zA-Z0-9_]+"), t => length(t) > 0)
        size(when(size(toks) >= 8, transform(
          sequence(lit(0), size(toks) - 8),
          i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(8))))))
          .otherwise(array().cast("array<bigint>"))).cast("long")
      })
    rowHof("text_stats",
      TextStatsKernel.textStats(s).getField("n_tokens").cast("long"),
      size(filter(split(s, "[^a-zA-Z0-9_]+"), t => length(t) > 0)).cast("long"))
    row("quality_counts",
      TextStatsKernel.qualityCounts(s).getField("punct_bytes").cast("long"),
      length(regexp_replace(s, "[^\\p{Punct}]", "")).cast("long"))

    corpus.unpersist(); sliceDf.unpersist(); tinyDf.unpersist()
    spark.stop()
  }
}
