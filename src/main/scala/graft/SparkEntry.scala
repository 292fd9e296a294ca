package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] demonstrates one operator from SURVEY.md §2
  * (or a training-data pipeline op); [[oracleSql]] holds the equivalent
  * DuckDB SQL over the same parquet tables. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing). Float aggregates are computed through DecimalType so the
  * result is independent of Spark's partial-aggregation order and matches
  * DuckDB bit-for-bit after the final cast to double.
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_stats")(spark, "/root/testdata/sf0.001")

  // Deterministic double sum: round each term to a decimal, sum exactly,
  // cast back. Matches DuckDB's sum over the same decimal cast.
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- stats pipe: groupBy + count/sum/avg (SURVEY §2.2 #32, §2.3) ----
    "q_agg_stats" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("revenue"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // ---- range filter (§2.1 #12) ----
    "q_filter_range" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
        .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
    }),
    // ---- sort + limit → TakeOrderedAndProject (§2.2 #31) ----
    "q_sort_topk" -> ((s, d) => {
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    }),
    // ---- broadcast equi-join (§2.2 #18) ----
    "q_join_broadcast" -> ((s, d) => {
      orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),
    // ---- top N most frequent values (§2.2 #34) ----
    "q_top" -> ((s, d) => {
      events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("hits"))
        .orderBy(col("hits").desc, col("event_type").asc)
        .limit(5)
    }),
    // ---- uniq (§2.2 #36) ----
    "q_uniq" -> ((s, d) =>
      events(s, d).select(col("event_type")).distinct().orderBy(col("event_type"))),
    // ---- stats by (_time:1h) time bucketing (§2.3 grouping extras) ----
    "q_time_bucket" -> ((s, d) => {
      events(s, d)
        .withColumn("hr", expr("(ts_ns div 1000000000 div 3600) * 3600"))
        .groupBy(col("hr"))
        .agg(count(lit(1)).as("hits"))
        .orderBy(col("hr"))
    }),
    // ---- exact dedup over documents (training-data ops) ----
    "q_dedup_exact" -> ((s, d) => {
      documents(s, d)
        .agg(countDistinct(col("text")).as("uniq_docs"), count(lit(1)).as("total_docs"))
    }),
    // ---- field_values: distinct values + hits (§2.2 #12) ----
    "q_field_values" -> ((s, d) => {
      documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("hits"))
        .orderBy(col("lang"))
    }),
    // ---- word/exact filter + numeric filter conjunction (§2.1 #5, #24) ----
    "q_filter_and" -> ((s, d) => {
      events(s, d)
        .filter(col("event_type") === "purchase" && col("value") > 100)
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
    }),
    // ---- median / quantile (§2.3) ----
    "q_quantile" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
             expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy(col("l_returnflag"))
    }),
    // ---- count_uniq (§2.3) ----
    "q_count_uniq" -> ((s, d) => {
      events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("uniq_users"))
        .orderBy(col("event_type"))
    }),

    // ==== LogsQL end-to-end (parser → compiler → Catalyst) ====
    // ---- word filter + stats (§2.1 #1, §2.2 #32) ----
    "q_lql_filter_stats" -> ((s, d) =>
      lql(s, d, "event_type:purchase | stats by (event_type) count() hits")),
    // ---- time bucketing via LogsQL (§2.3 grouping extras) ----
    "q_lql_time_stats" -> ((s, d) =>
      lql(s, d,
        "* | stats by (_time:1d) count() hits | math _time as day_s | fields day_s, hits | sort by (day_s)")),
    // ---- in() filter + sort/limit (§2.1 #7, §2.2 #31) ----
    "q_lql_topk" -> ((s, d) =>
      lql(s, d,
        "event_type:in(purchase, refund) | sort by (value desc, event_id) limit 5 | fields event_id, event_type, value")),
    // ---- math pipe + min/max stats (§2.2 #23) ----
    "q_lql_math" -> ((s, d) =>
      lql(s, d, "* | math value * 2 + 1 as y | stats max(y) mx, min(y) mn")),
    // ---- range filter + count_uniq via LogsQL (§2.1 #12) ----
    "q_lql_range_uniq" -> ((s, d) =>
      lql(s, d,
        "value:>100 | stats by (event_type) count() hits, count_uniq(user_id) uu | sort by (event_type)")),
  )

  /** Run a LogsQL query against the events log view. */
  private def lql(s: SparkSession, d: String, q: String): DataFrame =
    graft.logql.Compiler.run(Tables.eventsLog(s, d), q)

  def oracleSql: Map[String, String] = Map(
    "q_agg_stats" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_qty
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_filter_range" ->
      """SELECT count(*) AS cnt,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
         FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05""",
    "q_sort_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_top" ->
      """SELECT event_type, count(*) AS hits FROM events
         GROUP BY 1 ORDER BY hits DESC, event_type ASC LIMIT 5""",
    "q_uniq" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q_time_bucket" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hr,
         count(*) AS hits FROM events GROUP BY 1 ORDER BY 1""",
    "q_dedup_exact" ->
      "SELECT count(DISTINCT text) AS uniq_docs, count(*) AS total_docs FROM documents",
    "q_field_values" ->
      "SELECT lang, count(*) AS hits FROM documents GROUP BY 1 ORDER BY 1",
    "q_filter_and" ->
      """SELECT count(*) AS cnt,
         CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'purchase' AND value > 100""",
    "q_quantile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
         quantile_cont(l_quantity, 0.9) AS p90_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_count_uniq" ->
      """SELECT event_type, count(DISTINCT user_id) AS uniq_users
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_lql_filter_stats" ->
      """SELECT event_type, count(*) AS hits FROM events
         WHERE event_type = 'purchase' GROUP BY 1""",
    "q_lql_time_stats" ->
      """SELECT epoch(date_trunc('day', ts)) AS day_s, count(*) AS hits
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_lql_topk" ->
      """SELECT event_id, event_type, value FROM events
         WHERE event_type IN ('purchase', 'refund')
         ORDER BY value DESC, event_id LIMIT 5""",
    "q_lql_math" ->
      "SELECT max(value*2+1) AS mx, min(value*2+1) AS mn FROM events",
    "q_lql_range_uniq" ->
      """SELECT event_type, count(*) AS hits, count(DISTINCT user_id) AS uu
         FROM events WHERE value > 100 GROUP BY 1 ORDER BY 1""",
  )
}
