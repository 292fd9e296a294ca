package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import scala.util.Random

/** Compile-level fuzz: random pipe chains over a small typed frame must
  * either build a plan (collect may still be meaningless) or throw a
  * DELIBERATE error (ParseException, UnsupportedOperation, Spark
  * AnalysisException, IllegalArgument). MatchError / NullPointer /
  * StackOverflow would be compiler bugs that surface as opaque 400s with
  * useless messages — this spec keeps them out of the tree. */
class CompilerFuzzSpec extends SparkSuite {

  private val NOW = 1704067200L * 1000000000L

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("_time", TimestampType), StructField("_msg", StringType),
      StructField("level", StringType), StructField("v", DoubleType),
      StructField("host", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 20).map(i =>
        Row(new java.sql.Timestamp(1704067200000L + i * 3600000L),
          s"""{"k": $i} msg $i""", if (i % 3 == 0) "error" else "info",
          i * 1.5, s"h${i % 4}"))),
      schema)
  }

  private val filters = Seq(
    "*", "error", "level:error", "v:>5", "_time:1d", "level:in(error, info)",
    "_msg:~\"msg\"", "level:i(ERROR)", "host:h1 OR host:h2", "-level:info",
    "_msg:contains_any(msg, k)", "v:range(1, 20]", "host:string_range(a, z)")

  private val pipes = Seq(
    "stats count() c", "stats by (level) sum(v) s", "stats by (v:5) count() c",
    "stats by (_time:1h offset -30m) count() c", "stats by (host:/24) count() c",
    "sort by (v desc) limit 3", "sort by (level) rank as r partition by (host)",
    "top 3 by (level)", "uniq by (level) with hits", "fields level, v",
    "delete host", "copy level as l2", "rename v as vv", "limit 5", "offset 2",
    "math v * 2 as y", "math now() as t", "format \"<uc:level>@<host>\" as f",
    "extract \"<a> <b>\" from _msg", "replace (\"msg\", \"MSG\") at _msg",
    "unpack_json from _msg", "unpack_words from _msg as w drop_duplicates",
    "unpack_words from _msg as w | unroll by (w)", "collapse_nums at _msg",
    "collapse_nums prettify at _msg", "decolorize _msg", "drop_empty_fields",
    "field_names as n", "field_values level", "hash(host) as h", "len(_msg) as l",
    "json_array_len(_msg) as n", "pack_json as p", "pack_logfmt as p",
    "where v:>2", "filter level:error", "sample 3", "first 2 by (v)",
    "last 2 by (v)", "facets 3", "union (error)", "blocks_count",
    "join by (host) (* | stats by (host) count() hc)",
    "stats by (level) count() if (v:>5) big, count() all")

  test("random filter+pipe chains compile without compiler-bug crashes") {
    val rnd = new Random(7042026L)
    var compiled = 0
    for (i <- 0 until 400) {
      val f = filters(rnd.nextInt(filters.length))
      val n = rnd.nextInt(4)
      val ps = Seq.fill(n)(pipes(rnd.nextInt(pipes.length)))
      val q = (f +: ps).mkString(" | ")
      try {
        val out = Compiler.run(df, q, NOW)
        out.schema // force analysis
        compiled += 1
      } catch {
        case _: ParseException => ()
        case _: UnsupportedOperationException => ()
        case _: IllegalArgumentException => ()
        case _: org.apache.spark.sql.AnalysisException => ()
        case e: Throwable =>
          fail(s"iteration $i: compiler-bug class ${e.getClass.getName}: " +
            s"${e.getMessage} for query <$q>")
      }
    }
    // the fragments are all individually valid — the vast majority of
    // random chains must actually compile, or the fuzz is testing nothing
    assert(compiled > 300, s"only $compiled/400 chains compiled")
  }
}
