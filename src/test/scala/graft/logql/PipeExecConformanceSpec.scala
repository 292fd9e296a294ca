package graft.logql

import graft.SparkSuite
import graft.tools.PipeExecProbe

/** Executes every golden pipe test extracted from the reference's own
  * pipe_*_test.go expectPipeResults tables (463 cases across the pipes and stats functions,
  * src/test/resources/conformance/pipe_exec.txt) against the Spark
  * compiler: build the input rows, run `* | <pipe>`, compare the
  * rendered (name, value) row multiset. Empty values are dropped on both
  * sides — the reference's field model treats missing and empty as
  * equivalent, and its tests emit per-block column sets a uniform
  * relation cannot reproduce. Any deliberate deviation goes in the
  * allowlist WITH a reason — currently empty.
  */
class PipeExecConformanceSpec extends SparkSuite {

  /** (src, pipe) -> reason. */
  private val allowlist: Map[(String, String), String] = Map.empty

  test("every reference pipe golden table matches") {
    val cases = PipeExecProbe.loadCases()
      .filterNot(c => allowlist.contains((c.src, c.pipe)))
    assert(cases.size >= 460, s"corpus shrank: ${cases.size}")
    val bad = cases.flatMap(c => PipeExecProbe.runCase(spark, c))
    assert(bad.isEmpty,
      s"\n${bad.size}/${cases.size} pipe golden mismatches:\n" + bad.mkString("\n"))
  }
}
