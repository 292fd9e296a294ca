package graft

/** Local filesystem wearing a non-`file:` scheme — the HDFS/S3 stand-in
  * for [[Sessions.pathInputBytes]]'s Hadoop-FS resolution test. */
class GraftMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftmock:///")
}

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

  test("pathInputBytes resolves through Hadoop FS: file: URI and a " +
      "non-file scheme both report real bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pib_").toFile
    try {
      val f = new java.io.File(dir, "part-0.bin")
      java.nio.file.Files.write(f.toPath, new Array[Byte](12345))
      val sub = new java.io.File(dir, "sub"); sub.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(sub, "part-1.bin").toPath, new Array[Byte](55))
      // explicit file: URI
      assert(Sessions.pathInputBytes(spark, s"file:${dir.getAbsolutePath}")
        == 12400L)
      // non-local scheme (the HDFS/S3 stand-in): a java.io.File-based du
      // would see a nonexistent local path and report 0 — the Hadoop FS
      // resolution must still count the bytes
      spark.sparkContext.hadoopConfiguration.set("fs.graftmock.impl",
        classOf[GraftMockFs].getName)
      assert(Sessions.pathInputBytes(spark,
        s"graftmock:${dir.getAbsolutePath}") == 12400L)
      // data-proportional state sizing sees the same bytes on both schemes
      assert(Sessions.streamStatePartitions(spark,
          Sessions.pathInputBytes(spark, s"graftmock:${dir.getAbsolutePath}"))
        == Sessions.streamStatePartitions(spark,
          Sessions.pathInputBytes(spark, s"file:${dir.getAbsolutePath}")))
      // missing path: 0 bytes, never a throw
      assert(Sessions.pathInputBytes(spark,
        s"file:${dir.getAbsolutePath}/nope") == 0L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(dir)
    }
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
