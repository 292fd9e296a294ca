package graft.logql

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the r14 drop_empty_fields optimization: the all-fields row
  * filter must stay ABOVE the projection that derives the fields map —
  * Catalyst's PushPredicateThroughNonJoin otherwise substitutes the
  * defining expressions and re-evaluates the unpack parse once per
  * map-sourced disjunct per row (interpreted; map lambdas are
  * CodegenFallback). The graft_opaque wrap on the rewritten map is the
  * barrier. An ADVICE.md-suggested alternative — wrap the filter
  * CONDITION and keep the projection deterministic — was tested in r15
  * and rejected: the rule's Project case only checks the PROJECT LIST's
  * determinism, so a nondeterministic condition is still substituted
  * through (this spec caught the parse inlined 3x at the relation). */
class DropEmptyPlanSpec extends SparkSuite {
  import spark.implicits._

  private def runQ(q: String) = {
    // parquet-backed, not a LocalRelation: ConvertToLocalRelation folds a
    // local pipeline at optimize time (the barrier is moot there); the
    // production shape this spec pins is a file scan under the pipeline
    val dir = s"/root/repo/target/drop_empty_spec/${getClass.getSimpleName}"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      Seq((1L, "a=x b="), (2L, "a= b="), (3L, "a=y b=z"))
        .toDF("id", "line")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    Compiler.run(spark.read.parquet(dir), q)
  }

  test("drop-empty row filter is not pushed below the unpack projection") {
    val out = runQ("* | unpack_logfmt from line | drop_empty_fields" +
      " | pack_json as j fields (a, b) | uniq by (j) | sort by (j)")
    val optimized = out.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val filters = optimized.collect { case f: Filter => f }
    // the logfmt parse must not appear inside any filter condition — it
    // lives once in the projection the filter reads
    val dupFilters = filters.filter(_.condition.exists(
      _.isInstanceOf[graft.functions.LogfmtToMap]))
    assert(dupFilters.isEmpty,
      s"drop-empty filter was pushed below its defining projection:\n" +
        dupFilters.mkString("\n"))
    // and the barrier itself is present (somewhere in the whole tree)
    assert(optimized.collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[graft.functions.OpaqueExpr])))
  }

  test("graft_opaque is a value-identity (results unchanged)") {
    val rows = runQ("* | unpack_logfmt from line | drop_empty_fields" +
      " | pack_json as j fields (a, b) | uniq by (j) | sort by (j)")
      .select("j").as[String].collect().toSeq
    // row 2's unpacked fields are all empty but its id/line are not, so
    // the ROW survives and packs as {}
    assert(rows == Seq("""{"a":"x"}""", """{"a":"y","b":"z"}""", "{}"))
  }

  test("rows with every field empty are still dropped") {
    // only the unpacked map + line survive after deleting id; an all-empty
    // unpack (a=, b=) with an empty line must drop the row entirely
    val df = Seq(("a= b=", ""), ("a=q b=", "keep")).toDF("kv", "extra")
    val out = Compiler.run(df,
      "* | unpack_logfmt from kv | delete kv, extra | drop_empty_fields" +
        " | pack_json as j | uniq by (j)")
    val got = out.select("j").as[String].collect().toSeq
    assert(got == Seq("""{"a":"q"}"""))
  }
}
