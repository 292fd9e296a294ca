package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Environment-drift tripwire: asserts the driver-provided fixtures load
  * and normalize to the schemas the rest of the suite assumes. When the
  * driver regenerates /root/testdata with a different physical encoding
  * (round 6: events.ts flipped TIMESTAMP(NANOS) → timestamp[us] and 33
  * tests failed 33 different ways), this spec turns the drift into ONE
  * failure that names the observed schema. */
class FixtureContractSpec extends SparkSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("all driver tables load") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val failures = tables.flatMap { t =>
      try { Tables.load(spark, sfDir, t).schema; None }
      catch { case e: Exception => Some(s"$t: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"fixture tables failed to load:\n${failures.mkString("\n")}")
  }

  test("events loader normalizes ts regardless of fixture encoding") {
    val ev = Tables.events(spark, sfDir)
    val tsType = ev.schema("ts").dataType
    val nsType = ev.schema("ts_ns").dataType
    assert(tsType == TimestampType && nsType == LongType,
      s"Tables.events must yield (ts: TimestampType, ts_ns: LongType); " +
        s"got (ts: $tsType, ts_ns: $nsType). Raw fixture schema: " +
        spark.read.parquet(s"$sfDir/events.parquet").schema.treeString)
    val row = ev.agg(count(lit(1)), min("ts_ns"), max("ts_ns")).head()
    assert(row.getLong(0) > 0, "events fixture is empty")
    // sanity: ts_ns is nanos-since-epoch in a plausible range (2000..2100),
    // catching a wrong-unit derivation (micros-as-nanos is off by 1000x)
    val loNs = 946684800L * 1000000000L
    val hiNs = 4102444800L * 1000000000L
    assert(row.getLong(1) > loNs && row.getLong(2) < hiNs,
      s"events.ts_ns outside [2000, 2100): min=${row.getLong(1)} max=${row.getLong(2)}")
    // ts and ts_ns describe the same instant (micros precision)
    val drift = ev.filter(unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(drift == 0, s"$drift rows where ts != ts_ns at micros precision")
  }

  test("events loader accepts both nanos-as-long and timestamp[us] parquet") {
    import spark.implicits._
    // ns values chosen as multiples of 1000 so both encodings carry the
    // exact instant, plus one non-multiple to pin the truncation rule
    val ns = Seq(1718236800000000000L, 1718236801123456000L, 1718236802999999789L)
    def base(tsCol: org.apache.spark.sql.Column) = ns.toDF("ns").select(
      monotonically_increasing_id().as("event_id"),
      tsCol.as("ts"),
      lit(7L).as("user_id"), lit("click").as("event_type"),
      lit(1.5).as("value"), lit("k=v").as("props"))
    val dirLong = java.nio.file.Files.createTempDirectory("graft-evt-long-").toString
    val dirTs = java.nio.file.Files.createTempDirectory("graft-evt-ts-").toString
    val dirNtz = java.nio.file.Files.createTempDirectory("graft-evt-ntz-").toString
    base(col("ns")).write.parquet(s"$dirLong/events.parquet")
    base(timestamp_micros(expr("ns div 1000"))).write.parquet(s"$dirTs/events.parquet")
    base(timestamp_micros(expr("ns div 1000")).cast(TimestampNTZType))
      .write.parquet(s"$dirNtz/events.parquet")
    def dump(d: String): Seq[(Long, Long)] =
      Tables.events(spark, d)
        .select(unix_micros(col("ts")), col("ts_ns")).as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    val fromLong = dump(dirLong)
    val fromTs = dump(dirTs)
    val fromNtz = dump(dirNtz)
    // the long flavor keeps full nanos in ts_ns; the timestamp flavors
    // carry micros only — compare at micros precision
    assert(fromLong.map(_._1) == ns.map(_ / 1000).sorted, s"long-flavor ts: $fromLong")
    assert(fromLong.map(_._2) == ns.sorted, s"long-flavor ts_ns: $fromLong")
    assert(fromTs == ns.sorted.map(n => (n / 1000, n / 1000 * 1000)), s"ts-flavor: $fromTs")
    assert(fromNtz == fromTs, s"ntz-flavor diverged from tz-flavor: $fromNtz vs $fromTs")
  }
}
