package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  // memoized per (session, path): reusing one DataFrame instance lets
  // Spark reuse its InMemoryFileIndex + schema across queries instead of
  // re-listing and re-reading footers per query (metastore-like behavior)
  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    synchronized {
      cache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
        spark.read.parquet(s"$sfDir/$name.parquet"))
    }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame   = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame   = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame   = load(spark, d, "region")
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read as
    * a timestamp. Read it as a long (nanos since epoch) and derive:
    *   - `ts`: TimestampType truncated to micros (integer division — the raw
    *     int64 exceeds 2^53, double arithmetic would corrupt it)
    *   - `ts_ns`: the original nanos, kept for exact arithmetic.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** `events` mapped into the engine's log-event shape (FIXTURES.md §1):
    * `_time` + `_msg` + promoted typed field columns. LogsQL queries run
    * directly against this view. */
  def eventsLog(spark: SparkSession, d: String): DataFrame =
    events(spark, d).select(
      col("ts").as("_time"),
      col("props").as("_msg"),
      col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** `documents` as a log view: `_msg` = text. */
  def docsLog(spark: SparkSession, d: String): DataFrame =
    documents(spark, d).select(
      col("text").as("_msg"),
      col("doc_id"), col("lang"), col("source"), col("n_chars"))
}
