package graft.tools

import org.apache.spark.sql.SparkSession

/** Reader/writer chaos: N concurrent query threads hammer the query API
  * while jsonline ingest streams new rows, the background compactor
  * rewrites partitions under them, AND (from halfway) retention deletes
  * a whole live `_day=` directory every 2s — the end-to-end drive of
  * the stale-file-retry contract (LogStore.withStaleRetry + the
  * handler's inline retry) and the plan cache's generation
  * invalidation, including invalidation on retention drops. PASS =
  * zero 5xx responses, zero client errors, every counted result
  * bounded by rows posted, retention actually fired, and the final
  * count equals exactly the rows posted to the retained days.
  *
  * Usage: runMain graft.tools.ChaosProbe [seconds] [queryThreads]
  */
object ChaosProbe {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(45)
    val qThreads = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/root/repo/target/graft_chaos/run-${System.nanoTime()}"
    val (http, port) = graft.Server.start(spark, dir)
    val compactor = graft.store.Compaction.startBackground(spark, dir,
      intervalMs = 3000L, minFilesToCompact = 4)

    val posted = new java.util.concurrent.atomic.AtomicLong(0)
    val deadline = System.nanoTime() + seconds * 1000000000L
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val non200 = new java.util.concurrent.atomic.AtomicInteger(0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val queriesRun = new java.util.concurrent.atomic.AtomicInteger(0)
    var lastCount = 0L

    def post(body: String): Int = {
      val conn = new java.net.URI(
        s"http://127.0.0.1:$port/insert/jsonline?_stream_fields=app")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      val code = conn.getResponseCode
      conn.getInputStream.readAllBytes(); conn.disconnect(); code
    }
    def get(pq: String): (Int, String) = {
      val conn = new java.net.URI(s"http://127.0.0.1:$port$pq")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
      val cache = Option(conn.getHeaderField("X-Graft-Plan-Cache")).getOrElse("")
      if (cache == "hit") hits.incrementAndGet()
      conn.disconnect(); (code, body)
    }
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

    // writer: a steady stream of small batches across 3 days; per-day
    // tallies let the final invariant survive the retention drop below
    val postedByDay = Array.fill(4)(new java.util.concurrent.atomic.AtomicLong(0))
    val writer = new Thread(() => {
      var i = 0
      while (System.nanoTime() < deadline) {
        val byDay = (0 until 20).groupBy(r => (i + r) % 3 + 1)
        byDay.foreach { case (d, rs) =>
          val lines = rs.map { r =>
            val ss = f"${(i + r) % 60}%02d"
            s"""{"_time":"2024-06-0${d}T10:00:$ss.000Z","_msg":"chaos row ${i * 20 + r}","app":"a${i % 4}"}"""
          }.mkString("\n")
          if (post(lines) == 200) {
            posted.addAndGet(rs.size)
            postedByDay(d).addAndGet(rs.size)
          }
        }
        i += 1
      }
    })
    // retention: halfway through, start dropping day 1 under the live
    // readers — the whole `_day=2024-06-01` directory disappears while
    // queries scan it, the stale-retry contract's hardest case
    @volatile var retentionFired = false
    val retainer = new Thread(() => {
      val halfway = deadline - seconds * 500000000L
      while (System.nanoTime() < halfway) Thread.sleep(200)
      while (System.nanoTime() < deadline) {
        val dropped = graft.store.Compaction.enforceRetention(spark, dir,
          retentionDays = 1, today = java.time.LocalDate.parse("2024-06-03"))
        if (dropped.nonEmpty) retentionFired = true
        Thread.sleep(2000)
      }
    })
    // readers: mixed query shapes, including the cached lastN path
    val qs = Seq(
      s"/select/logsql/query?query=${enc("chaos | stats count() c")}",
      s"/select/logsql/query?query=${enc("*")}&limit=20",
      s"/select/logsql/hits?query=${enc("*")}&step=1d",
      s"/select/logsql/query?query=${enc("app:a1 | stats by (app) count() c")}",
      s"/select/logsql/field_values?query=${enc("*")}&field=app")
    val readers = (0 until qThreads).map { t =>
      new Thread(() => {
        val rnd = new scala.util.Random(t)
        while (System.nanoTime() < deadline) {
          val pq = qs(rnd.nextInt(qs.length))
          try {
            val (code, body) = get(pq)
            queriesRun.incrementAndGet()
            if (code != 200) {
              non200.incrementAndGet()
              errors.add(s"HTTP $code for $pq: ${body.take(120)}")
            } else if (pq.contains("stats+count")) {
              // rows visible can lag posts but never exceed them and
              // never go backwards by more than a cache-vs-live skew
              """"c":"?(\d+)""".r.findFirstMatchIn(body).foreach { m =>
                val c = m.group(1).toLong
                if (c > posted.get + 400) errors.add(s"count $c > posted ${posted.get}")
                lastCount = math.max(lastCount, c)
              }
            }
          } catch { case e: Exception => errors.add(s"client: ${e.getMessage}") }
        }
      })
    }
    writer.start(); readers.foreach(_.start()); retainer.start()
    writer.join(); readers.foreach(_.join()); retainer.join()
    Thread.sleep(500)
    // one final retention pass so the expected count is exact (the last
    // writer batches may land in day 1 after the retainer's final tick)
    graft.store.Compaction.enforceRetention(spark, dir,
      retentionDays = 1, today = java.time.LocalDate.parse("2024-06-03"))
    val (fc, fb) = get(s"/select/logsql/query?query=${enc("chaos | stats count() c")}")
    val finalCount = """"c":"?(\d+)""".r.findFirstMatchIn(fb).map(_.group(1).toLong).getOrElse(-1L)
    compactor.close(); http.stop(0)
    val expected = postedByDay(2).get + postedByDay(3).get // day 1 retained out
    println(s"[chaos] duration=${seconds}s readers=$qThreads queries=${queriesRun.get} cache_hits=${hits.get} posted=${posted.get} retention_fired=$retentionFired")
    println(s"[chaos] non200=${non200.get} errors=${errors.size} final_count=$finalCount expected=$expected (fc=$fc)")
    errors.stream().limit(6).forEach(e => println(s"[chaos]   $e"))
    val ok = non200.get == 0 && errors.isEmpty && finalCount == expected && retentionFired
    println(s"[chaos] ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    System.exit(if (ok) 0 else 1)
  }
}
