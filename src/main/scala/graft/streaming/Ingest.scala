package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.store.LogStore

/** M6 streaming ingestion: Structured Streaming sources parsed with the
  * same expressions the unpack_* pipes use, written through the LogStore
  * layout via foreachBatch (SURVEY §2.4; reference app/vlinsert).
  *
  * Protocol parsers are pure `DataFrame => DataFrame` transforms over a
  * `value: String` line column, so they serve both the streaming path and
  * one-shot batch backfills.
  */
object Ingest {

  /** JSON-lines payload (app/vlinsert/jsonline/jsonline.go): one object
    * per line; `_time`/`_msg` are special, everything else lands in the
    * `fields` map (keyConcepts.md:16-120 schemaless model). Rows that fail
    * to parse are kept with the raw line as `_msg` (the reference logs and
    * drops; keeping is the safer default for data pipelines). */
  def parseJsonline(lines: DataFrame, timeField: String = "_time",
                    msgField: String = "_msg"): DataFrame = {
    val m = from_json(col("value"), MapType(StringType, StringType))
    lines.select(
      coalesce(element_at(m, timeField).try_cast("timestamp"),
        current_timestamp()).as("_time"),
      coalesce(element_at(m, msgField), when(m.isNull, col("value")), lit(""))
        .as("_msg"),
      coalesce(map_filter(m, (k, _) => k =!= timeField && k =!= msgField),
        map().cast(MapType(StringType, StringType))).as("fields"))
  }

  /** Syslog RFC3164/RFC5424 lines via the unpack_syslog expressions
    * (syslog_parser.go; app/vlinsert/syslog/syslog.go:38-60). */
  def parseSyslog(lines: DataFrame): DataFrame = {
    val unpacked = graft.logql.Compiler.applyUnpackSyslog(
      lines.withColumnRenamed("value", "_msg"), "_msg", "")
    unpacked.select(
      coalesce(col("timestamp").try_cast("timestamp"),
        current_timestamp()).as("_time"),
      col("message").as("_msg"),
      map(
        lit("hostname"), col("hostname"),
        lit("app_name"), col("app_name"),
        lit("proc_id"), col("proc_id"),
        lit("severity"), col("severity"),
        lit("facility"), col("facility")).as("fields"))
  }

  /** Promote stream label fields out of the `fields` map so LogStore can
    * derive `_stream_id` from them. */
  private def promote(df: DataFrame, streamFields: Seq[String]): DataFrame =
    streamFields.foldLeft(df)((d, f) =>
      d.withColumn(f, coalesce(element_at(col("fields"), f), lit(""))))

  /** Append one parsed micro-batch into the store layout (the streaming
    * counterpart of LogStore.ingest, mode=append). */
  def appendBatch(parsed: DataFrame, dir: String, streamFields: Seq[String],
                  tenant: String = "0:0", filesPerDay: Int = 4): Unit = {
    val sorted = streamFields.sorted
    val withMeta = promote(parsed, sorted)
      .withColumn("_stream", map(sorted.flatMap(f =>
        Seq(lit(f), coalesce(col(f).cast(StringType), lit("")))): _*))
      .withColumn("_stream_id", LogStore.streamIdCol(sorted))
      .withColumn("tenant", lit(tenant))
      .withColumn("_day", to_date(col("_time")))
    withMeta
      .repartition(col("tenant"), col("_day"),
        pmod(xxhash64(col("_stream_id")), lit(filesPerDay)))
      .sortWithinPartitions(col("_stream_id"), col("_time"))
      .write.mode("append")
      .partitionBy("tenant", "_day")
      .parquet(s"$dir/logs")
    withMeta.select(col("_stream_id"), col("_stream")).dropDuplicates("_stream_id")
      .write.mode("append").parquet(s"$dir/streams")
  }

  /** File-source streaming ingest: text lines under `srcDir` → parser →
    * store layout. `format` ∈ jsonline | syslog. */
  def fileStream(spark: SparkSession, srcDir: String, storeDir: String,
                 format: String, streamFields: Seq[String],
                 checkpointDir: String): StreamingQuery = {
    val parser: DataFrame => DataFrame = format match {
      case "jsonline" => parseJsonline(_)
      case "syslog" => parseSyslog(_)
      case other => throw new IllegalArgumentException(s"unknown format '$other'")
    }
    spark.readStream.text(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(parser(batch), storeDir, streamFields)
      }
      .start()
  }
}
