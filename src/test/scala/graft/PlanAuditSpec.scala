package graft

import graft.logql.Compiler
import graft.store.LogStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression tests: every scale claim the engine makes
  * ("one scan", "pushed filter", "broadcast, not shuffle", "top-k, not
  * global sort", "codegen'd hot path") is pinned against the EXECUTED
  * plan, so a refactor that silently de-optimizes a flagship query fails
  * here rather than in a 100 TB deployment. Complements the per-operator
  * value tests: those catch wrong answers, these catch right answers
  * computed the wrong way. */
class PlanAuditSpec extends SparkSuite {

  private val SF = "/root/testdata/sf0.001"
  private lazy val storeDir = LogStore.ensureFromEvents(spark, SF)
  private lazy val logs = LogStore.read(spark, storeDir)

  private def plan(df: DataFrame): String = {
    df.collect() // let AQE finalize so the audited plan is the real one
    val s = df.queryExecution.executedPlan.toString
    // AQE prints the final plan followed by the pre-execution initial
    // plan; occurrence counts must only see the plan that actually ran
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  private def countOf(p: String, needle: String): Int =
    needle.r.findAllIn(p).size

  test("time+stream filters reach the scan: partition prune + pushdown") {
    val p = plan(Compiler.run(logs,
      """{event_type="purchase"} _time:[2024-01-05, 2024-01-07) | stats count() hits"""))
    assert("PartitionFilters: \\[[^\\]]*_day".r.findFirstIn(p).isDefined, p)
    assert(p.contains("PushedFilters") && p.contains("event_type"), p)
  }

  test("stream_context compiles to ONE needle scan and no marker join") {
    // big-source shape (prune gate forced to 0): a single left-semi stream
    // prune; the needle subplan appears once (inside the broadcast build),
    // never as a LeftOuter marker join (the round-5 double-execution shape)
    spark.conf.set("spark.graft.streamContext.pruneGateBytes", "0")
    try {
      val p = plan(Compiler.run(logs,
        "value:>300 | stream_context before 2 after 1 time_window 4w"))
      assert(p.contains("LeftSemi"), p)
      assert(!p.contains("LeftOuter"), p)
      assert(countOf(p, "Scan parquet") <= 2, p) // needle build + source walk
    } finally
      spark.conf.unset("spark.graft.streamContext.pruneGateBytes")
    // small-source shape (default gate): ONE scan — the window drops
    // rows of streams with no matched row. The parallel path's skew-proof
    // bucketed frames are two complementary union branches over one
    // reused exchange (never a second scan, never the LeftOuter
    // marker-join double-execution shape)
    val q = plan(Compiler.run(logs,
      "value:>300 | stream_context before 2 after 1 time_window 4w"))
    assert(!q.contains("LeftOuter"), q)
    assert(countOf(q, "Scan parquet") == 1, q)
    // the interactive path keeps the joinless single-window shape
    val s2 = graft.Sessions.interactive(spark)
    val logs2 = graft.store.LogStore.read(s2, storeDir)
    val qi = plan(Compiler.run(logs2,
      "value:>300 | stream_context before 2 after 1 time_window 4w"))
    assert(!qi.contains("Join"), qi)
    assert(countOf(qi, "Scan parquet") == 1, qi)
  }

  test("facets runs ONE scan of the source relation") {
    val p = plan(Compiler.run(logs, "* | facets 3"))
    // the const-field rollup must reuse the counted exchange, not rescan
    assert(countOf(p, "Scan parquet") == 1, p)
    assert(p.contains("ReusedExchange") || countOf(p, "HashAggregate") > 0, p)
  }

  test("bounded sort+rank fuses to TakeOrderedAndProject, not a global sort") {
    val p = plan(Compiler.run(logs,
      "* | sort by (value desc) rank as r | where r:<=5"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("partitioned rank+bound compiles to WindowGroupLimit, not whole-group sort") {
    // the fused `where r:<=k` bound must surface as partial+final
    // WindowGroupLimit so map tasks forward at most k rows per group
    // across the shuffle instead of sorting entire groups after it
    val p = plan(Compiler.run(logs,
      """* | sort by (value desc) partition by (event_type) rank as r
         | where r:<=2 | fields event_type, r"""))
    assert(countOf(p, "WindowGroupLimit") >= 2, p)
  }

  test("small join sides broadcast instead of shuffling") {
    val p = plan(Compiler.run(logs,
      """* | join by (event_type) (event_type:purchase | stats by (event_type) count() pc)"""))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("in(subquery) compiles to a broadcast semi-join, not a collected list") {
    val p = plan(Compiler.run(logs,
      "event_id:in(event_type:purchase | fields event_id) | stats count() c"))
    assert(p.contains("LeftSemi"), p)
  }

  test("filter+stats pipeline stays inside whole-stage codegen") {
    val p = plan(Compiler.run(logs,
      "event_type:purchase OR event_type:signup | stats by (event_type) count() hits, sum(value) sv"))
    // `*(n)` prefixes are whole-stage-codegen span markers; the scan →
    // filter → partial-agg pipeline must sit inside one
    assert(p.contains("*(1) Filter") || p.contains("WholeStageCodegen"), p)
    assert(p.contains("graft_word_match"), p)
    // the tokenized word-match predicate is a codegen'd kernel, not a
    // regex: RLike in the plan would mean the WordMatch path regressed
    assert(!p.contains("RLike"), p)
  }

  test("similarity top-k aggregates bounded state — no window over the scored set") {
    import spark.implicits._
    val emb = (0 until 300).map { i =>
      val r = new scala.util.Random(i * 31)
      (i.toLong, Seq.fill(8)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val df = graft.ops.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding",
      "vec_id", "embedding", k = 5)
    val p = plan(df)
    // the top-k must be a partial-aggregating bounded aggregate: a Window
    // in the plan means every scored pair shuffles and sorts again
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("ngramJaccard: aggregate-only index — no window, no index self-join") {
    import spark.implicits._
    val docs = (0 until 30).map(i => (i.toLong, s"alpha beta gamma delta $i common tail words here"))
      .toDF("doc_id", "text")
    val p = plan(graft.ops.Dedup.ngramJaccard(docs, "text", "doc_id", n = 3, threshold = 0.1))
    // candidate pairs come from LOCAL combinations inside each shingle
    // bucket; the inverted index must never be re-shuffled and sorted
    // through a SortMergeJoin of itself, and no window funnels it either
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    // the only joins left are the two per-doc-count attaches (broadcast
    // here); the index build itself is ONE shuffle of the exploded corpus
    // (capped-collect fuses the doc-freq count and the id gather), so no
    // corpus-scale join exists at all
    assert(countOf(p, "BroadcastHashJoin") <= 2, p)
    // shuffle exchanges only: gAgg (the ONE corpus-scale shuffle), perDoc,
    // pair rollup — broadcast exchanges excluded (they're dim-sized)
    assert(countOf(p, "Exchange hashpartitioning") <= 3, p)
  }

  test("minhash/simhash candidates: bucket combinations, not a band-table self-join") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"common words shared prefix tail marker token$i"))
      .toDF("doc_id", "text")
    val pm = plan(graft.ops.Dedup.minhashLSH(docs, "text", "doc_id", threshold = 0.1))
    // the band table groups once (map-side partial combine) and pairs are
    // generated inside each bucket — no Window bucket-size funnel, no
    // SortMergeJoin re-shuffling the band rows against themselves
    assert(!pm.contains("Window"), pm)
    assert(!pm.contains("SortMergeJoin"), pm)
    val ps = plan(graft.ops.Dedup.simhashCandidates(docs, "text", "doc_id"))
    assert(!ps.contains("Window"), ps)
    assert(!ps.contains("SortMergeJoin"), ps)
  }

  test("contaminated: bench side joins as LeftSemi with no distinct exchange") {
    import spark.implicits._
    val docs = (0 until 20).map(i => (i.toLong, s"some words $i shared amongst documents")).toDF("doc_id", "text")
    val bench = Seq("shared amongst documents exactly").toDF("text")
    val p = plan(graft.ops.Dedup.contaminated(docs, "text", "doc_id", bench, "text", n = 2))
    assert(p.contains("LeftSemi"), p)
    // existence-match makes a bench-side dedup unnecessary: exactly two
    // aggregates total (partial+final of the per-doc count), none on the
    // bench branch
    assert(countOf(p, "HashAggregate") <= 2, p)
  }

  test("duplicateSpans: skew-robust doc-frequency join, no window over h") {
    import spark.implicits._
    val docs = (0 until 20).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta $i"))
      .toDF("doc_id", "text")
    val p = plan(graft.ops.Dedup.duplicateSpans(docs, "text", "doc_id", k = 4))
    // doc frequency must attach via aggregate + equi-join (AQE can split
    // a hot window-hash partition), NEVER a Window over h (hot windows —
    // boilerplate shared corpus-wide, the op's whole purpose — would
    // serialize into single unsplittable tasks). The price is the corpus
    // exploding once per branch (the pruned branches' exchanges don't
    // unify), each behind a map-side partial aggregate — bounded extra
    // map work, not extra shuffle skew.
    assert(!p.contains("Window"), p)
    assert(p.contains("Join"), p)
    assert(countOf(p, "Generate explode") <= 2, p)
  }

  test("paragraphDedup: skew-robust doc-frequency join and pruned freq branch") {
    import spark.implicits._
    val docs = (0 until 20).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta $i"))
      .toDF("doc_id", "text")
    val p = plan(graft.ops.Dedup.paragraphDedup(docs, "text", "doc_id", k = 2))
    // the duplicateSpans shape: doc frequency via aggregate + equi-join,
    // never a Window over the unit hash (hot units — corpus-wide
    // boilerplate, the op's target — would serialize into one task); the
    // freq branch re-explodes but is pruned to (id, hash) before its
    // exchange, so the extra cost is map-side, and unit TEXT crosses the
    // wire exactly once (the join-side exchange)
    assert(!p.contains("Window"), p)
    assert(p.contains("Join"), p)
    assert(countOf(p, "Generate explode") <= 2, p)
    // the pruned freq branch must NOT carry chunk_text through its
    // exchange: the projection under it is hash-only
    assert(!p.contains("Exchange hashpartitioning(chunk_text"), p)
  }

  test("needed-fields-bounded bare unpack_json: one flatten, no fields-map merge") {
    // `stats by (ip:/24)` back-propagates {ip} → {k} through format, so
    // the bare unpack compiles to ONE JsonFlatten per row with only the
    // needed key projected out — the fields-MAP merge (map_concat /
    // map_filter over every document key) must not reach the plan
    // (updateNeededFields, pipe.go:11-55)
    val p = plan(Compiler.run(logs,
      """* | unpack_json from _msg | format "10.1.<k>.9" as ip
         | stats by (ip:/24) count() hits | sort by (ip)"""))
    assert(p.contains("graft_json_flatten"), p)
    assert(!p.contains("map_concat") && !p.contains("map_filter"), p)
    // an unbounded tail (whole-row consumer) must keep the full merge
    val q = plan(Compiler.run(logs,
      "* | unpack_json from _msg | facets 3"))
    assert(q.contains("graft_json_flatten") || q.contains("entries"), q)
  }

  test("dead columns are pruned below wide pipes (Catalyst ColumnPruning)") {
    // the reference back-propagates needed fields into its storage reads
    // (storage_search.go:124-133); in this engine Catalyst's ColumnPruning
    // provides the same guarantee declaratively — a projection after a
    // sort narrows the SCAN, so the shuffle never carries dead columns.
    // Pinned here so a compiled-pipe refactor that breaks pruning
    // (e.g. an opaque UDF over the whole row) fails loudly.
    val p = plan(Compiler.run(logs,
      "* | sort by (value desc) limit 5 | fields _time, value"))
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("_time") && read.contains("value"), p)
    assert(!read.contains("event_id") && !read.contains("_msg"), p)
  }

  test("last-N day descent touches fewer partitions than exist") {
    val (res, daysScanned) = LogStore.lastN(spark, storeDir, "*", 5)
    assert(res.count() == 5)
    val totalDays = new java.io.File(s"$storeDir/logs/tenant=0%3A0")
      .listFiles().count(_.getName.startsWith("_day="))
    assert(daysScanned < totalDays, s"$daysScanned vs $totalDays")
  }
}
