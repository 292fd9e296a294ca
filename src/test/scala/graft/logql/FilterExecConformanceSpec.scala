package graft.logql

import graft.SparkSuite
import graft.tools.FilterExecProbe

/** Executes every filter golden test extracted from the reference's own
  * filter_*_test.go tables (1376 cases across 20 filter types,
  * src/test/resources/conformance/filter_exec.txt): reconstruct the
  * filter AST from the struct fields, render it to LogsQL (Canon), run
  * the full parse→compile path over the column table, and compare the
  * surviving row-index set. Any deliberate deviation goes in the
  * allowlist WITH a reason — currently empty.
  */
class FilterExecConformanceSpec extends SparkSuite {

  /** (src, filter-json-text) -> reason. */
  private val allowlist: Map[(String, String), String] = Map.empty

  test("every reference filter golden table matches") {
    val cases = FilterExecProbe.loadCases()
      .filterNot(c => allowlist.contains((c.src, c.filterJson.toString)))
    assert(cases.size >= 1380, s"corpus shrank: ${cases.size}")
    val bad = cases.flatMap(c => FilterExecProbe.runCase(spark, c))
    assert(bad.isEmpty,
      s"\n${bad.size}/${cases.size} filter golden mismatches:\n" +
        bad.take(40).mkString("\n"))
  }

  test("query-string and timestamp-struct filter goldens match") {
    // filter_and/or_test.go ParseQuery tables + the nanosecond
    // timestamp tables from filter_time/day_range/week_range_test.go
    val cases = FilterExecProbe.loadQueryCases()
    assert(cases.size >= 69, s"corpus shrank: ${cases.size}")
    val bad = cases.flatMap(c => FilterExecProbe.runQCase(spark, c))
    assert(bad.isEmpty,
      s"\n${bad.size}/${cases.size} filter query golden mismatches:\n" +
        bad.take(40).mkString("\n"))
  }
}
