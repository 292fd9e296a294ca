package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark plug-in entry point: `spark.sql.extensions=graft.GraftExtensions`
  * registers the engine's codegen'd expressions as SQL functions in every
  * session of the cluster — the idiomatic way to ship custom Catalyst
  * expressions with a library (the in-code Column APIs self-register per
  * session and keep working without it; this makes the functions reachable
  * from plain `spark.sql(...)` and JDBC/Thrift clients too). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), b))
    fn("graft_dot",
      "graft_dot(a, b) - dot product of two float/double/tinyint arrays") {
      es => functions.DotProduct(es(0), es(1))
    }
    fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float/double/tinyint arrays") {
      es => functions.CosineSim(es(0), es(1))
    }
    fn("graft_ipv4",
      "graft_ipv4(s) - IPv4 dotted-quad string to uint32 (null when invalid)") {
      es => functions.Ipv4ToLong(es.head)
    }
    fn("graft_logfmt",
      "graft_logfmt(s) - parse a logfmt line into a map<string,string>") {
      es => functions.LogfmtToMap(es.head)
    }
  }
}
