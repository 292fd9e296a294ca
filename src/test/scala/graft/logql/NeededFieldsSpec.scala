package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Needed-fields back-propagation (reference updateNeededFields,
  * pipe.go:11-55): analysis unit tests + differential tests pinning the
  * bounded per-key bare-unpack path to the full-map parse it replaces. */
class NeededFieldsSpec extends SparkSuite {

  private def pipesOf(q: String): Seq[Pipe] = Parser.parse(q, 0L).pipes

  private def needBeforeFirst(q: String): Option[Set[String]] = {
    // needed set AFTER pipe 0 is what the first pipe's compile sees
    NeededFields.afterSets(pipesOf(q)).headOption.flatten match {
      case s => s
    }
  }

  test("stats projection bounds the chain; format subtracts its output") {
    val q = """* | unpack_json from _msg | format "10.1.<k>.9" as ip
               | stats by (ip:/24) count() hits | sort by (ip)"""
    val needs = NeededFields.afterSets(pipesOf(q))
    assert(needs(0) == Some(Set("k")), needs) // after unpack: format+stats
    assert(needs(1) == Some(Set("ip")), needs) // after format: stats by ip
    assert(needs(2) == None, needs) // after stats: unbounded tail
  }

  test("whole-row consumers and wildcards degrade to unbounded") {
    assert(needBeforeFirst("* | unpack_json from _msg | facets 5").isEmpty)
    assert(needBeforeFirst("* | unpack_json from _msg | field_names as f").isEmpty)
    assert(needBeforeFirst(
      "* | unpack_json from _msg | stats sum(k*) s").isEmpty)
    assert(needBeforeFirst(
      "* | unpack_json from _msg | stats row_any() r").isEmpty)
    assert(needBeforeFirst("* | unpack_json from _msg | pack_json as j").isEmpty)
    // drop_empty_fields observes map-vs-column residence (it empties the
    // map only), so it must block the bounded column rewrite
    assert(needBeforeFirst(
      "* | unpack_json from _msg | drop_empty_fields | stats by (k) count() c").isEmpty)
    // sample hashes the whole row — same story
    assert(needBeforeFirst(
      "* | unpack_json from _msg | sample 5 | stats by (k) count() c").isEmpty)
  }

  test("format with if() keeps its output needed (prior value survives)") {
    val q = """* | unpack_json from _msg
               | format if (level:error) "x<k>" as ip | stats by (ip) count() c"""
    val needs = NeededFields.afterSets(pipesOf(q))
    assert(needs(0) == Some(Set("k", "ip", "level")), needs)
  }

  test("delete narrows; copy keeps sources; where/iff fields propagate") {
    val q = "* | unpack_json from _msg | delete b | copy a as a2 " +
      "| where level:error | stats by (a2) count() c"
    val needs = NeededFields.afterSets(pipesOf(q))
    // stats needs a2; copy maps a→a2 (source a stays needed); where adds
    // level; delete b proves b is NOT needed upstream
    assert(needs(0) == Some(Set("a", "a2", "level")), needs)
  }

  // ---------------------------------------------------- differential pins

  private lazy val jsonLogs: DataFrame = {
    val schema = StructType(Seq(
      StructField("_msg", StringType), StructField("level", StringType)))
    val msgs = Seq(
      """{"k":"v1","other":"x"}""",
      """{"k":42,"pad":{"deep":1}}""",
      """{"k":-0.5}""",
      """{"k":true}""",
      """{"k":null,"o":1}""", // explicit null ≡ missing on the bounded path
      """{"k":{"nested":"obj"}}""",
      """{"k":[1,2,3]}""",
      """{"k":"a\"b\\cé"}""",
      """  {"k":"ws-prefixed"}""",
      """{"other":"no k"}""",
      """{"k":"dup1","k":"dup2"}""",
      """not json at all""",
      """{"k":"truncated""",
      """[{"k":"array-root"}]""",
      """"scalar-root"""",
      "",
      """{"k":""}""",
      """{"k":"1e3"}""",
      """{"k":1e3}""",
      """{"K":"case-differs"}""")
    val rows = msgs.zipWithIndex.map { case (m, i) =>
      Row(m, if (i % 2 == 0) "error" else "info") }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  /** The unbounded semantics, spelled out by hand: one flattened-map
    * parse (the JsonFlatten kernel IS the field-model definition, pinned
    * against the reference's own goldens in PipeExecConformanceSpec),
    * fields-map entry for k (missing key groups as SQL null, like the
    * engine's anyF group key for a map-resident field). */
  private def fullParseGroups(skipEmpty: Boolean): Map[Option[String], Long] = {
    val m = graft.functions.JsonFlattenExpr.flattenCol(col("_msg"))
    val raw = element_at(m, "k")
    val v =
      if (skipEmpty) when(raw.isNotNull && raw =!= "", raw)
      else raw
    jsonLogs.groupBy(v.as("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
  }

  private def boundedGroups(q: String): Map[Option[String], Long] =
    Compiler.run(jsonLogs, q, 0L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap

  test("bounded bare unpack_json matches the full-map parse value-for-value") {
    val got = boundedGroups("* | unpack_json from _msg | stats by (k) count() c")
    assert(got == fullParseGroups(skipEmpty = false), got)
  }

  test("bounded bare unpack_json honors skip_empty_results") {
    val got = boundedGroups(
      "* | unpack_json from _msg skip_empty_results | stats by (k) count() c")
    assert(got == fullParseGroups(skipEmpty = true), got)
  }

  test("bounded bare unpack_json honors if() and result_prefix") {
    val got = boundedGroups(
      """* | unpack_json if (level:error) from _msg result_prefix "p_"
         | stats by (p_k) count() c""")
    val m = graft.functions.JsonFlattenExpr.flattenCol(col("_msg"))
    val v = when(col("level") === "error", element_at(m, "k"))
    val want = jsonLogs.groupBy(v.as("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == want, got)
  }

  test("dotted needed keys resolve through the flattened field map") {
    // the reference flattens nested objects into dot-paths (logjson), so
    // `a.b` hits the LITERAL key when present (first-wins over the
    // flattened nested one) and the nested path otherwise — identically
    // on the bounded and full paths, which share the JsonFlatten kernel
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("""{"a.b":"literal","a":{"b":"nested"}}"""), Row("""{"a":{"b":"x"}}""")), 1),
      StructType(Seq(StructField("_msg", StringType))))
    val got = Compiler.run(df,
      "* | unpack_json from _msg | stats by (`a.b`) count() c", 0L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(Some("literal") -> 1L, Some("x") -> 1L), got)
  }

  test("differential fuzz: bounded and full unpack paths agree on whole result sets") {
    // the strongest guard on the analysis transfers: every pool query runs
    // twice — once normally (bounded column path fires when the tail
    // yields a finite key set) and once with the kill switch forcing the
    // full from_json/logfmt-map path — and the ENTIRE result sets must
    // match. A transfer that under-approximates (drops a consumed field)
    // or a column-write that breaks merge semantics diverges here.
    val heads = Seq(
      "* | unpack_json from _msg",
      "* | unpack_json from _msg skip_empty_results",
      "* | unpack_json from _msg keep_original_fields",
      """* | unpack_json if (level:error) from _msg""",
      """* | unpack_json from _msg result_prefix "p_"""",
      "level:error | unpack_json from _msg",
      // chained unpacks: the first must extract the second's SOURCE field
      // (needed-before of unpack2 includes its `from`) plus the terminal
      // keys — the transfer composition the analysis exists for
      "* | unpack_json from _msg | unpack_logfmt from other",
      "* | unpack_logfmt from _msg | unpack_json from k",
      """* | unpack_json from _msg result_prefix "p_" keep_original_fields""")
    val tails = Seq(
      "stats by (k) count() c",
      "stats count_uniq(k) uk, min(k) mn, max(k) mx",
      "stats by (p_k) count() c",
      "where k:=v1 | stats count() c",
      """format "x<k>y" as f | stats by (f) count() c""",
      // secondary sort key: ties on k alone make the limited row choice
      // legitimately nondeterministic
      "sort by (k, level) limit 4 | fields k, level",
      "top 3 by (k)",
      "uniq by (k, level)",
      "field_values k",
      "math (k * 2) as lk | stats sum(lk) s, count() c",
      "copy k as k2 | delete k | stats by (k2) count() c",
      "len(k) as kl | stats max(kl) m",
      "stats by (k, level) count() c",
      "where p_k:=v1 | stats count() c",
      "unroll by (k) | stats by (k) count() c",
      "stats by (k:10) count() c")
    // second fixture: a PRE-EXISTING nullable string column k — the
    // unpack write-through path, including NULL cells that the full
    // path's strF view coerces to "" (a divergence this matrix caught)
    val withKCol = jsonLogs.withColumn("k",
      when(col("level") === "error", lit(null).cast("string"))
        .otherwise(concat(lit("pre-"), col("level"))))
    def rows(df: org.apache.spark.sql.DataFrame, q: String): Seq[String] =
      Compiler.run(df, q, 0L).collect()
        .map(_.toSeq.map(v => String.valueOf(v)).mkString("|")).sorted.toSeq
    for (df <- Seq(jsonLogs, withKCol); h <- heads; t <- tails) {
      val q = s"$h | $t"
      val bounded = rows(df, q)
      System.setProperty("graft.neededfields.disable", "1")
      val full = try rows(df, q)
      finally System.clearProperty("graft.neededfields.disable")
      assert(bounded == full,
        s"DIVERGED on: $q\nbounded=${bounded.take(8)}\nfull=${full.take(8)}")
    }
  }

  test("bounded bare unpack_logfmt matches the full parse") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("""a=1 b="two words" c=3"""), Row("a=9 b="), Row("x=only"),
        Row(""), Row("a=dup a=dup2")), 2),
      StructType(Seq(StructField("_msg", StringType))))
    val got = Compiler.run(df,
      "* | unpack_logfmt from _msg | stats by (b) count() c", 0L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(Some("two words") -> 1L, Some("") -> 1L, None -> 3L), got)
  }

  test("bounded sets cover the reference model on the whole parser corpus") {
    // Safety differential against NeededFieldsRef (the 674-golden
    // transcription of the reference's updateNeededFields): wherever
    // this engine's analysis claims a BOUNDED needed set — the license
    // for the bounded per-key unpack path — every field the reference
    // model still requires must be inside it. An uncovered field would
    // mean the bounded unpack extracts too few keys.
    val in = getClass.getResourceAsStream("/conformance/parser_success.txt")
    require(in != null)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val queries = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#"))
      .map(l => mapper.readTree(l).asText).toList
    assert(queries.size >= 600)
    // raw corpus queries rarely bound their tail (no projection pipe), so
    // ALSO run each with a literal projection appended — every position
    // upstream of it then carries a bounded set to check
    val augmented = queries ++ queries.map(_ + " | fields f1, x, _time")
    var checked = 0
    val bad = augmented.flatMap { q =>
      scala.util.Try(Parser.parse(q, 0L)).toOption.toSeq.flatMap { parsed =>
        val pipes = parsed.pipes
        val ours = NeededFields.afterSets(pipes)
        val pf = new PrefixFilter
        pf.addAllowFilter("*")
        val errs = Seq.newBuilder[String]
        var i = pipes.length - 1
        while (i >= 0) {
          // pf now holds what the reference model needs AFTER pipe i
          ours(i).foreach { s =>
            checked += 1
            val uncovered = pf.getAllowFilters.filterNot { f =>
              if (PrefixFilter.isWildcardFilter(f))
                s.exists(PrefixFilter.matchFilter(f, _)) || {
                  // a wildcard need can't be covered by a finite set
                  // unless the engine lists at least its witnesses; the
                  // bounded path only matters for literal needs, so a
                  // wildcard claim must not be bounded at all
                  false
                }
              else s.contains(f) ||
                // the engine lists both `_time` and `ts` for time needs
                (f == "_time" && s.contains("ts"))
            }
            if (uncovered.nonEmpty)
              errs += s"<<$q>> pipe $i: bounded=$s misses $uncovered"
          }
          NeededFieldsRef.updatePipe(pipes(i), pf)
          i -= 1
        }
        errs.result()
      }
    }
    assert(checked > 50, s"differential exercised only $checked bounded sets")
    assert(bad.isEmpty, s"\n${bad.size} coverage holes:\n" +
      bad.take(20).mkString("\n"))
  }
}
