package graft

/** Pins the r14 streaming-drive sizing rule: state-store instance count
  * follows input bytes (one per 8 MiB by default), clamped to [1, root
  * shuffle width] — tiny tails stop paying a full shuffle-width of
  * per-micro-batch state-store commits, and at scale the rule saturates
  * to the cluster's configured parallelism. */
class StreamDrivePartitionsSpec extends SparkSuite {

  test("state partitions scale with input bytes and clamp to root width") {
    val rootParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Sessions.streamStatePartitions(spark, 0L) == 1)
    assert(Sessions.streamStatePartitions(spark, (8L << 20) - 1) == 1)
    assert(Sessions.streamStatePartitions(spark, 3L * (8L << 20)) ==
      math.min(3, rootParts))
    assert(Sessions.streamStatePartitions(spark, Long.MaxValue / 2) ==
      rootParts)
  }

  test("override conf changes the per-partition byte budget") {
    val s = spark.newSession()
    s.conf.set("spark.graft.streaming.stateBytesPerPartition",
      String.valueOf(1L << 20))
    val rootParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Sessions.streamStatePartitions(s, 2L << 20) ==
      math.min(2, rootParts))
  }

  test("streamingDrive session is memoized per (root, n) with AQE off") {
    val a = Sessions.streamingDrive(spark, 2)
    val b = Sessions.streamingDrive(spark, 2)
    assert(a eq b)
    assert(a.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(a.conf.get("spark.sql.shuffle.partitions") == "2")
    assert(Sessions.streamingDrive(spark, 3) ne a)
  }
}
