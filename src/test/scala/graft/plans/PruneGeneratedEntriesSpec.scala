package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The literal-struct-field partial-evaluation rule (the facets /
  * field_values unpivot shape): filter conjuncts decidable per array
  * element at plan time must drop the dead elements — and with them the
  * source columns they pinned — while never changing results. */
class PruneGeneratedEntriesSpec extends SparkSuite {

  private def unpivot(df: DataFrame): DataFrame =
    df.select(explode(array(
        struct(lit("a").as("field_name"), col("a").as("field_value")),
        struct(lit("b").as("field_name"), col("b").as("field_value")),
        struct(lit("c").as("field_name"), col("c").as("field_value"))))
      .as("e"))
      .select(col("e.field_name").as("field_name"),
              col("e.field_value").as("field_value"))

  private lazy val src = {
    graft.functions.GraftFunctions.register(spark) // installs the rule
    import spark.implicits._
    Seq(("a1", "b1", "c1"), ("a2", "b2", "c2")).toDF("a", "b", "c")
  }

  private def generateArity(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator.children.head match {
          case arr: org.apache.spark.sql.catalyst.expressions.CreateArray =>
            arr.children.length
        }
    }

  test("IN on the literal field prunes dead elements and their columns") {
    val q = unpivot(src).filter(col("field_name").isin("a", "c"))
    assert(generateArity(q) == Seq(2), q.queryExecution.optimizedPlan)
    // the pruned element's source column is gone from the plan entirely
    assert(!q.queryExecution.optimizedPlan.toString.contains("'b'") &&
           !q.queryExecution.executedPlan.toString.contains("b1"))
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).sorted
      .toSeq == Seq(("a", "a1"), ("a", "a2"), ("c", "c1"), ("c", "c2")))
  }

  test("filter excluding every element becomes an empty local relation") {
    val q = unpivot(src).filter(col("field_name") === "zzz")
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.isEmpty, opt)
    assert(opt.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]), opt)
    assert(q.count() == 0)
  }

  test("value conjuncts are kept and still filter rows") {
    val q = unpivot(src).filter(
      col("field_name") === "b" && col("field_value") === "b2")
    assert(generateArity(q) == Seq(1))
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("b", "b2")))
  }

  test("results identical with the rule pruning vs a no-op predicate") {
    // same filter routed so the rule CANNOT decide it (references the
    // value field) — both shapes must agree row-for-row
    val pruned = unpivot(src).filter(col("field_name").isin("a", "b"))
    val unpruned = unpivot(src).filter(
      col("field_name").isin("a", "b") || col("field_value") === "__never__")
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      unpruned.collect().map(_.toString).sorted.toSeq)
  }

  test("explode_outer is never rewritten") {
    val q = src.select(explode_outer(array(
        struct(lit("a").as("field_name"), col("a").as("field_value"))))
      .as("e"))
      .filter(col("e.field_name") === "zzz" || col("e").isNull)
    // rule must leave the outer generate alone (isnull(e) semantics)
    assert(q.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.nonEmpty)
    assert(q.count() == 0)
  }
}
