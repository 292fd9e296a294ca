package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark plug-in entry point: `spark.sql.extensions=graft.GraftExtensions`
  * registers the engine's codegen'd expressions as SQL functions in every
  * session of the cluster — the idiomatic way to ship custom Catalyst
  * expressions with a library (the in-code Column APIs self-register per
  * session and keep working without it; this makes the functions reachable
  * from plain `spark.sql(...)` and JDBC/Thrift clients too). The function
  * table itself lives in [[functions.GraftFunctions]], shared with the
  * lazy per-session registration, so the two routes can never drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
    // inside the operator-optimization fixpoint, where ColumnPruning
    // immediately realizes the scan-schema shrink the pruning enables
    ext.injectOptimizerRule(_ => plans.PruneGeneratedEntries)
  }
}
