package graft

/** The prebuilt-plan memo at the queries() entry points: repeat
  * invocations of the same (query, dir) return the SAME DataFrame handle
  * (plan construction + analysis paid once, the serving path's plan-cache
  * idea), while effectful entries (streaming runs, index persists) stay
  * fresh per call, and execution itself is never cached — a count on the
  * memoized handle still reads the data live. */
class SparkEntryMemoSpec extends SparkSuite {
  private val d = "/root/testdata/sf0.001"

  test("pure entries return one memoized handle per (name, dir)") {
    val a = SparkEntry.queries("q_dedup_ngram")(spark, d)
    val b = SparkEntry.queries("q_dedup_ngram")(spark, d)
    assert(a eq b, "same (name, dir, session) must reuse the built plan")
    // a different dir builds a different plan
    val c = SparkEntry.queries("q_dedup_ngram")(spark, "/root/testdata/sf0.01")
    assert(!(a eq c))
    // the handle still executes (memoized plan, live execution)
    assert(a.count() == b.count())
  }

  test("effectful entries (streaming, index persist) are rebuilt per call") {
    val f = SparkEntry.queries("q_sim_ivf_persist")
    val a = f(spark, d)
    val b = f(spark, d)
    assert(!(a eq b), "effectful entries must re-run their side effects")
  }

  test("memoized handles re-execute against live data, not cached results") {
    val probe = SparkEntry.queries("q_agg_stats")(spark, d)
    val r1 = probe.collect()
    val r2 = probe.collect()
    assert(r1.sameElements(r2))
  }
}
