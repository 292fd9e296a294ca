package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone ingest-throughput probe (the Bench.ingestBench section alone,
  * for fast iteration on the group-commit path). */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val threads = 16
    val posts = 96
    val linesPerPost = 5000
    val dir = s"/root/repo/target/probe_ingest-${System.nanoTime()}"
    val srv = new graft.server.IngestServer(spark, dir)
    val port = srv.start()
    try {
      def post(body: Array[Byte]): Int = {
        val conn = new java.net.URI(s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body)
        val code = conn.getResponseCode
        conn.getInputStream.readAllBytes(); conn.disconnect()
        code
      }
      def body(i: Int): Array[Byte] = (0 until linesPerPost).map { j =>
        s"""{"_time":"2024-01-05T10:${f"${j % 60}%02d"}:00Z","_msg":"bench ingest row $i $j from generator","app":"app${i % 8}"}"""
      }.mkString("\n").getBytes("UTF-8")
      // warmup: one full concurrent wave (matches Bench.ingestBench)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      (0 until threads).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = post(body(-1 - i)) })
      }.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      val t0 = System.nanoTime()
      val futs = (0 until posts).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = post(body(i)) })
      }
      val ok = futs.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS)).count(_ == 200)
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      println(f"INGEST rows=${ok * linesPerPost} sec=$sec%.2f rps=${ok * linesPerPost / sec}%.0f flushes=${srv.committer.flushes}")
    } finally {
      srv.stop()
      try {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => }
    }
  }
}
