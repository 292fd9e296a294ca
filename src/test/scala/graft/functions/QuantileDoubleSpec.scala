package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** QuantileDoubleAgg (the single-native-numeric fast path) must agree
  * with QuantileValueAgg over the GoFloat-rendered strings — the path it
  * replaces (whose result the compiler cast back to double anyway) —
  * including NaN placement (the collation's natural order puts "NaN"
  * after every number, like Double.compare), sub-sample groups, and
  * groups past the 10k sample cap. */
class QuantileDoubleSpec extends SparkSuite {
  import spark.implicits._

  private def compare(vals: Seq[Double], phis: Seq[Double]): Unit = {
    GraftFunctions.ensure()
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % 7, v) }.toDF("g", "v")
      .repartition(4, col("g"))
    phis.foreach { phi =>
      val rows = df.groupBy("g").agg(
        call_function("graft_quantile_double", col("v"), lit(phi)).as("fast"),
        call_function("graft_quantile_value",
          array(GoFloat.render(col("v"))), lit(phi))
          .try_cast("double").as("slow"))
        .collect()
      rows.foreach { r =>
        val (f, s) = (r.getAs[Any]("fast"), r.getAs[Any]("slow"))
        val ok = (f, s) match {
          case (a: Double, b: Double) =>
            (a.isNaN && b.isNaN) || a == b
          case (a, b) => a == b
        }
        assert(ok, s"phi=$phi g=${r.get(0)}: fast=$f slow=$s")
      }
    }
  }

  test("agrees with the string collation path on random doubles") {
    val rnd = new scala.util.Random(17)
    val vals = Seq.fill(3000)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(6)))
    compare(vals, Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
  }

  test("agrees on integers, repeats and NaN") {
    val rnd = new scala.util.Random(23)
    val vals = Seq.fill(2000)(rnd.nextInt(50).toDouble) ++
      Seq.fill(30)(Double.NaN) ++ Seq(0.0, -1.5, 1e18, -1e18)
    compare(vals, Seq(0.1, 0.5, 0.95, 1.0))
  }

  test("agrees past the 10k sample cap (same first-arrival sample set)") {
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(80000)(rnd.nextDouble() * 1000)
    compare(vals, Seq(0.5, 0.99))
  }

  test("RowMinMaxDoubleAgg agrees with the string-key row agg") {
    GraftFunctions.ensure()
    val rnd = new scala.util.Random(41)
    // repeats force ties (first wins in both paths), NaN keys sort last
    val df = Seq.fill(4000)((rnd.nextInt(5), rnd.nextInt(200).toDouble,
        rnd.nextInt(1000)))
      .map { case (g, v, p) => (g, if (p == 0) Double.NaN else v, s"p$p") }
      .toDF("g", "v", "payload")
      .repartition(4, col("g"))
    val rowJson = to_json(map(lit("payload"), col("payload"),
      lit("v"), GoFloat.render(col("v"))))
    for (isMin <- Seq(true, false)) {
      val (fast, slow) =
        if (isMin) ("graft_row_min_d", "graft_row_min")
        else ("graft_row_max_d", "graft_row_max")
      val rows = df.groupBy("g").agg(
        call_function(fast, col("v"), rowJson).as("f"),
        call_function(slow, GoFloat.render(col("v")), rowJson).as("s"))
        .collect()
      rows.foreach { r =>
        // key ties keep the first arrival in both; only the chosen V must
        // agree (payload of equal-keyed rows is arrival-determined the
        // same way in both paths over the same partitioning)
        assert(r.getAs[String]("f") == r.getAs[String]("s"),
          s"isMin=$isMin g=${r.get(0)}: ${r.getAs[String]("f")} vs ${r.getAs[String]("s")}")
      }
    }
  }
}
