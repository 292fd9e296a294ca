package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Grammar-level fuzz of the parse → compile path: random combinations of
  * VALID filter and pipe fragments must either compile (and a sampled
  * subset execute) or raise a deliberate error type. Crash-class
  * throwables — MatchError, NPE, ClassCastException, StackOverflowError —
  * mean a query string can 500 the server, and each one found here is a
  * bug (the parser fuzz in ParserSpec caught two real ones this way). */
class CompilerFuzzSpec extends SparkSuite {

  private val NOW = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z

  private def ts(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(s))

  private lazy val logs: DataFrame = {
    val schema = StructType(Seq(
      StructField("_time", TimestampType),
      StructField("_msg", StringType),
      StructField("_stream_id", StringType),
      StructField("level", StringType),
      StructField("v", StringType),
      StructField("js", StringType),
      StructField("kv", StringType)))
    val rows = (0 until 24).map { i =>
      Row(ts(f"2023-12-31T${i % 24}%02d:00:01Z"), s"msg $i error code=$i",
        s"s${i % 3}", Seq("error", "info", "warn")(i % 3), s"${i * 1.5}",
        s"""{"a":$i,"b":{"c":"x$i"}}""", s"k=$i mode=m${i % 2}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("random valid-fragment queries compile or raise deliberate errors") {
    val filters = Seq(
      "*", "error", "level:info", "v:>3", "v:range(1, 20)", "_time:5m",
      "level:in(error, warn)", "_msg:~\"code=\\\\d+\"", "level:i(ERROR)",
      "_msg:seq(msg, error)", "v:len_range(1, 4)", "level:eq_field(level)",
      "_msg:contains_any(error, warn)", "!level:debug",
      "(error or level:info)", "_time:day_range[00:00, 23:00)",
      "seq(msg, error)", "len_range(1, 200)", "contains_any(error, warn)",
      "in(* | fields _msg)", "range(0, 1e9)",
      "level:value_type(string)", "nosuchfield:foo", "_stream_id:abc",
      "v:in(* | fields v)",
      "options (ignore_global_time_filter=true) *",
      "_time:week_range[Mon, Sun]", "v:range[1KiB, 1MiB]",
      "level:=error*", "_msg:i(MSG*)", "v:le_field(v)",
      "_msg:contains_all(* | fields level)", "\"msg 3\"",
      "v:string_range(1, 9)", "ip:ipv4_range(0.0.0.0, 255.255.255.255)")
    val pipes = Seq(
      "fields _time, _msg, level, v", "delete kv", "copy v as v2",
      "rename level as lvl", "where v:>2", "limit 7", "offset 2",
      "sample 3", "sort by (v desc) limit 5", "sort by (level) rank as r",
      "stats count() c", "stats by (level) count() c, sum(v) s",
      "stats by (_time:1h) median(v) m", "top 3 by (level)",
      "uniq by (level) with hits", "field_names as fn",
      "field_values level limit 4", "len _msg as l", "hash v as h",
      "math v * 2 as dbl", "format \"<level>:<v>\" as f",
      "extract \"code=<code>\" from _msg", "replace (error, warn) at _msg",
      "replace_regexp (\"m.g\", \"MSG\") at _msg", "unpack_json from js",
      "unpack_json from js fields (a, b) result_prefix p_",
      "unpack_logfmt from kv", "unpack_words from _msg as w limit 5",
      "unroll by (w)", "json_array_len js as jl", "pack_json as packed",
      "pack_logfmt as pkv fields (level, v)", "drop_empty_fields",
      "decolorize _msg", "collapse_nums at _msg", "facets 3",
      "block_stats", "blocks_count as bc", "field_values nosuch",
      "first 3 by (v)", "last 2 by (_time)",
      "stream_context before 1 after 1",
      "join by (level) (level:error | stats by (level) count() jc)",
      "union (level:info)", "stats count() if (level:error) ec",
      "copy l* as c*", "rename l* as r*", "delete n*",
      "stats sum(v*) sw, count_uniq_hash(level) ch",
      "stats histogram(v) h", "stats quantile(0.9, v) q90",
      "stats values(level) limit 3 vs", "stats rate() r",
      "stats by (v:10) count() cb", "stats row_max(v) rm",
      "math (v + 1h) as plus_h, (v * 1KiB) as kib",
      "format if (level:error) \"<uc:level>\" as up",
      "extract if (v:>1) \"code=<code>\" from _msg keep_original_fields",
      "unpack_json if (level:error) from js",
      "replace (\" \", \"_\") at _msg limit 2",
      "unpack_syslog from _msg", "field_values v limit 2",
      "sort by (v) partition by (level) rank as pr",
      "sort by (v desc) partition by (level) rank as pr | where pr:<=2",
      "top 2 by (level) rank as tr", "uniq by (level, v) limit 9",
      "sample 2", "drop_empty_fields", "len v as vlen",
      "stream_context after 2 time_window 1h",
      // round-7 surface: calendar/word time buckets with signed offsets,
      // IPv4 subnet buckets, drop_duplicates, prettify collapse, math
      // now(), hexnum format transforms
      "stats by (_time:month) count() mc", "stats by (_time:week) count() wc",
      "stats by (_time:1d offset -2h) count() oc",
      "stats by (v:/24) count() ipc",
      "unpack_words from _msg as w drop_duplicates",
      "collapse_nums prettify at _msg",
      "math now() as t", "format \"<hexnumencode:v>\" as he",
      "format \"<hexnumdecode:v>\" as hd",
      "replace if (level:error) (msg, MSG) at _msg",
      "replace_regexp if (v:>3) (\"\\\\d\", \"D\") at _msg",
      "collapse_nums if (level:info) at _msg",
      // round-8 surface: needed-fields-bounded bare unpacks (the stats/
      // fields tails below make the analysis produce a finite key set,
      // exercising the per-key column-write path against the same pool),
      // stream-id subquery sets, offset ip-mask buckets
      "unpack_json from js | stats by (a) count() ja",
      "unpack_json from js result_prefix u_ | stats count_uniq(u_a) ua",
      // round-9 surface: bare stats/filter pipe shorthand, docs-sweep
      // grammar (implicit by-list, bare head, fields-before-as pack,
      // bare unpack_words source, optional-paren field fns, format /
      // extract_regexp options, as-less math naming, empty json_values)
      "count() c2", "by (level) count() bc2", "level:info",
      "v:>1 | count() gt1", "head", "head 4",
      "stats (level) count() sc2", "stats json_values() limit 2 jall",
      "pack_json fields (level, v) as pj2",
      "unpack_words _msg as w2 limit 3",
      "len(_msg) l2", "json_array_len (js) jl2",
      "math v * 3", "math v / 0 as inf, v % 0 as nan",
      "format \"<level>\" as lv keep_original_fields",
      "format \"<nosuch>\" as lv2 skip_empty_results",
      "extract_regexp \"code=(?P<code2>\\\\d+)\" keep_original_fields",
      "sort by (v) partition by (nosuchpart) limit 2",
      "unpack_logfmt from kv | stats by (mode) count() mc",
      "unpack_json skip_empty_results from js | stats min(a) mn, max(a) mx",
      "stats by (v:/24 offset 1) count() oip")
    val extraFilters = Seq(
      "_stream_id:in(level:error | fields _stream_id)",
      "v:in(* | unpack_json from js | fields a)")
    locally {
      // stream-id subquery needs a _stream_id column: compile-only against
      // a view that has one (errors must still be deliberate ParseException
      // / IllegalArgument shapes, never MatchError)
      val withSid = logs.withColumn("_stream_id",
        org.apache.spark.sql.functions.lit("s1"))
      extraFilters.foreach { f =>
        try Compiler.run(withSid, s"$f | stats count() c", NOW).count()
        catch {
          case _: ParseException | _: IllegalArgumentException => ()
        }
      }
    }
    val rnd = new scala.util.Random(sys.env.getOrElse("FUZZ_SEED", "8132026").toLong)
    var compiled = 0
    var executed = 0
    for (i <- 1 to sys.env.getOrElse("FUZZ_ITERS", "800").toInt) {
      val nf = filters(rnd.nextInt(filters.length))
      val np = 1 + rnd.nextInt(3)
      val q = nf + Seq.fill(np)(pipes(rnd.nextInt(pipes.length)))
        .mkString(" | ", " | ", "")
      try {
        val df = Compiler.run(logs, q, NOW)
        compiled += 1
        // executing every query would take minutes; a deterministic 1-in-8
        // sample still runs ~100 full pipelines through Tungsten
        if (i % 8 == 0) { df.count(); executed += 1 }
      } catch {
        // deliberate rejections: parse errors, semantic rejections from
        // the compiler, and Spark analysis errors for unresolvable shapes
        case _: ParseException => ()
        case _: IllegalArgumentException => ()
        case _: UnsupportedOperationException => ()
        case _: org.apache.spark.sql.AnalysisException => ()
        case e: Throwable =>
          fail(s"query <$q> threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // the generator must mostly produce workable queries, or this tests
    // nothing — and the sampled executions must have actually run
    // (both bounds scale with FUZZ_ITERS so the knob stays usable)
    val iters = sys.env.getOrElse("FUZZ_ITERS", "800").toInt
    assert(compiled * 2 > iters, s"only $compiled/$iters compiled")
    assert(executed * 16 > iters, s"only $executed sampled executions ran")
  }
}
