package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible log-load generator — the counterpart of the reference's
  * `vlogsgenerator` (app/vlogsgenerator/main.go:24-59 flags,
  * :219-286 line shape): N workers × evenly-spaced timestamps ×
  * `activeStreams` lines per timestamp, with the same field-type mix
  * per line (const / var / dict / u8 / u16 / u32 / u64 / i64 / float /
  * ip / timestamp / json fields) and the same stream-churn model
  * (`totalStreams` > `activeStreams` substitutes streams over the time
  * range, main.go:219-231). Stream fields are (host, worker_id), like
  * the reference forces via `_stream_fields` (main.go:79).
  *
  * Spark-native: the corpus is a DataFrame built from `spark.range`
  * with codegen expressions (no per-row UDF), so generation scales with
  * the cluster; the HTTP sink posts per partition — `--workers` is both
  * the worker_id cardinality and the parallelism, exactly the
  * reference's model. Deviation (documented): field values derive from
  * xxhash64(seed, row, field) instead of a process-local RNG, so a
  * given flag set regenerates the identical corpus — reproducibility is
  * the point of a load generator used for benchmarks.
  *
  * Usage:
  *   runMain graft.tools.LogsGen [k=v ...]
  *     addr=stdout | dir:/path | http://host:port/insert/jsonline
  *     workers=1 activeStreams=100 totalStreams=0 logsPerStream=1000
  *     spanSec=86400 startSec=<epoch> seed=42
  *     const=3 var=1 dict=2 u8=1 u16=1 u32=1 u64=1 i64=1 float=1 ip=1
  *     timestamp=1 json=1
  */
object LogsGen {

  final case class Config(
      addr: String = "stdout",
      workers: Int = 1,
      activeStreams: Int = 100,
      totalStreams: Int = 0,
      logsPerStream: Long = 1000L,
      startSec: Long = 1704067200L, // 2024-01-01T00:00:00Z
      spanSec: Long = 86400L,
      seed: Long = 42L,
      constF: Int = 3, varF: Int = 1, dictF: Int = 2,
      u8F: Int = 1, u16F: Int = 1, u32F: Int = 1, u64F: Int = 1,
      i64F: Int = 1, floatF: Int = 1, ipF: Int = 1,
      timestampF: Int = 1, jsonF: Int = 1) {
    def total: Int = math.max(totalStreams, activeStreams)
  }

  /** dict_* draw from the reference's 8-value set (main.go:288-297). */
  private val DictValues =
    Seq("debug", "info", "warn", "error", "fatal", "ERROR", "FATAL", "INFO")

  def parse(args: Array[String]): Config =
    args.foldLeft(Config()) { (c, a) =>
      a.split("=", 2) match {
        case Array("addr", v)          => c.copy(addr = v)
        case Array("workers", v)       => c.copy(workers = v.toInt)
        case Array("activeStreams", v) => c.copy(activeStreams = v.toInt)
        case Array("totalStreams", v)  => c.copy(totalStreams = v.toInt)
        case Array("logsPerStream", v) => c.copy(logsPerStream = v.toLong)
        case Array("startSec", v)      => c.copy(startSec = v.toLong)
        case Array("spanSec", v)       => c.copy(spanSec = v.toLong)
        case Array("seed", v)          => c.copy(seed = v.toLong)
        case Array("const", v)         => c.copy(constF = v.toInt)
        case Array("var", v)           => c.copy(varF = v.toInt)
        case Array("dict", v)          => c.copy(dictF = v.toInt)
        case Array("u8", v)            => c.copy(u8F = v.toInt)
        case Array("u16", v)           => c.copy(u16F = v.toInt)
        case Array("u32", v)           => c.copy(u32F = v.toInt)
        case Array("u64", v)           => c.copy(u64F = v.toInt)
        case Array("i64", v)           => c.copy(i64F = v.toInt)
        case Array("float", v)         => c.copy(floatF = v.toInt)
        case Array("ip", v)            => c.copy(ipF = v.toInt)
        case Array("timestamp", v)     => c.copy(timestampF = v.toInt)
        case Array("json", v)          => c.copy(jsonF = v.toInt)
        case other => sys.error(s"unknown arg '${other.mkString("=")}'")
      }
    }

  /** The generated corpus as (line: String) — one JSON log line per row,
    * `workers × nTimestamps × activeStreams` rows, partitioned so each
    * worker's lines stay in that worker's partitions. */
  def lines(spark: SparkSession, cfg: Config): DataFrame = {
    require(cfg.activeStreams > 0 && cfg.logsPerStream > 0 && cfg.workers > 0,
      s"activeStreams/logsPerStream/workers must be positive: $cfg")
    val spanNs = cfg.spanSec * 1000000000L
    // stream lifetime & step, the churn model of main.go:219-231
    val lifetimeNs =
      (spanNs.toDouble * cfg.activeStreams / cfg.total).toLong
    val stepNs = math.max(1L,
      if (cfg.logsPerStream <= 1) lifetimeNs
      else lifetimeNs / (cfg.logsPerStream - 1))
    val streamStepNs = math.max(1L, spanNs / (cfg.total - cfg.activeStreams + 1))
    val nTs = ((spanNs + stepNs - 1) / stepNs).toInt

    val perWorker = nTs.toLong * cfg.activeStreams
    // exactly `workers` partitions: the flag is BOTH the worker_id
    // cardinality and the true parallelism (one POST per partition in
    // push()), like the reference's worker goroutines — more partitions
    // would open more concurrent connections than the flag promises
    val base = spark.range(0, cfg.workers * perWorker, 1, cfg.workers)
    val worker = (col("id") / perWorker).cast("long")
    val tsIdx = pmod(col("id"), lit(perWorker)) / cfg.activeStreams
    val slot = pmod(col("id"), lit(cfg.activeStreams.toLong)) // 0..active-1
    val tsNs = lit(cfg.startSec * 1000000000L) +
      tsIdx.cast("long") * stepNs
    val firstStream = ((tsNs - cfg.startSec * 1000000000L) / streamStepNs).cast("long")
    val streamId = firstStream + slot

    // deterministic per-(row, field) draw
    def h(tag: Int, j: Int): Column =
      xxhash64(lit(cfg.seed), col("id"), lit(tag), lit(j))
    def uns(c: Column): Column = // render a long as unsigned decimal
      conv(hex(c), 16, 10)
    def ipv4(c: Column): Column = concat_ws(".",
      shiftrightunsigned(c, 24).cast("int") % 256 + lit(0),
      pmod(shiftrightunsigned(c, 16), lit(256L)).cast("int"),
      pmod(shiftrightunsigned(c, 8), lit(256L)).cast("int"),
      pmod(c, lit(256L)).cast("int"))
    val timeStr = concat(
      date_format(timestamp_micros((tsNs / 1000L).cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z"))

    val uuid = {
      val a = h(99, 0); val b = h(99, 1)
      lower(concat_ws("-",
        lpad(hex(shiftrightunsigned(a, 32)), 8, "0"),
        lpad(hex(pmod(shiftrightunsigned(a, 16), lit(65536L))), 4, "0"),
        lpad(hex(pmod(a, lit(65536L))), 4, "0"),
        lpad(hex(pmod(shiftrightunsigned(b, 48), lit(65536L))), 4, "0"),
        lpad(hex(pmod(b, lit(281474976710656L))), 12, "0")))
    }
    val msgIp = ipv4(pmod(h(98, 0), lit(4294967296L)))
    val msg = format_string(
      "message for the stream %d and worker %d; ip=%s; uuid=%s; u64=%s",
      streamId, worker, msgIp, uuid, uns(h(97, 0)))

    // msg's alphabet has no JSON-special characters, so a plain quote
    // wrap IS the correct JSON string encoding here. run_id identifies
    // the generation run (main.go:242) — here derived from the seed so
    // a rerun with the same flags is the same corpus.
    val head = format_string(
      """{"_time":"%s","_msg":"%s","host":"host_%d","worker_id":"%d","run_id":"run_%d"""",
      timeStr, msg, streamId, worker, lit(cfg.seed))

    def fields(n: Int, name: String, value: Int => Column): Seq[Column] =
      (0 until n).map { j =>
        concat(lit(s""","${name}_$j":""""), value(j), lit("\""))
      }
    val floatV = (j: Int) => // main.go:268 round(10000*f)/1000 → 0..10.000
      (pmod(h(8, j), lit(10001L)).cast("double") / 1000.0).cast("string")
    val dictArr = array(DictValues.map(lit): _*)
    val parts: Seq[Column] = Seq(head) ++
      fields(cfg.constF, "const", j => format_string("some value %d %d", lit(j), streamId)) ++
      fields(cfg.varF, "var", j => format_string("some value %d %s", lit(j), uns(h(1, j)))) ++
      fields(cfg.dictF, "dict", j => element_at(dictArr, pmod(h(2, j), lit(8L)).cast("int") + 1)) ++
      fields(cfg.u8F, "u8", j => pmod(h(3, j), lit(256L)).cast("string")) ++
      fields(cfg.u16F, "u16", j => pmod(h(4, j), lit(65536L)).cast("string")) ++
      fields(cfg.u32F, "u32", j => pmod(h(5, j), lit(4294967296L)).cast("string")) ++
      fields(cfg.u64F, "u64", j => uns(h(6, j))) ++
      fields(cfg.i64F, "i64", j => h(7, j).cast("string")) ++
      fields(cfg.floatF, "float", floatV) ++
      fields(cfg.ipF, "ip", j => ipv4(pmod(h(9, j), lit(4294967296L)))) ++
      fields(cfg.timestampF, "timestamp", j =>
        concat(date_format(to_timestamp(pmod(h(10, j), lit(4102444800L))),
          "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))) ++
      // main.go:279 verbatim (a STRING whose content is pseudo-JSON with
      // NaN — an ingest-robustness fixture, kept byte-compatible)
      (0 until cfg.jsonF).map { j =>
        format_string(
          s""","json_$j":"{\\"foo\\":\\"bar_%d\\",\\"baz\\":{\\"a\\":[\\"x\\",\\"y\\"]},\\"f3\\":NaN,\\"f4\\":%d}"""",
          pmod(h(11, j), lit(10L)), pmod(h(12, j), lit(100L)))
      }
    base.select(concat(concat(parts: _*), lit("}")).as("line"))
  }

  /** POST the line DataFrame to a jsonline ingest endpoint — one
    * chunked-streaming POST per partition (the reference generator's
    * io.Pipe writer shape: no partition-sized buffer anywhere). Returns
    * (rows, bytes) actually sent. */
  def push(df: DataFrame, url: String): (Long, Long) = {
    val target = url + (if (url.contains("?")) "&" else "?") +
      "_stream_fields=host,worker_id"
    val counts = df.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator((0L, 0L)) else {
        val conn = new java.net.URL(target).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setChunkedStreamingMode(1 << 20)
        // a hung endpoint must fail the task, not pin the executor slot
        // forever (default timeout 0 = infinite)
        conn.setConnectTimeout(30000)
        conn.setReadTimeout(600000) // the server commits before replying
        val os = new java.io.BufferedOutputStream(conn.getOutputStream, 1 << 20)
        var n = 0L; var b = 0L
        while (it.hasNext) {
          val line = it.next().getString(0)
          val bs = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          os.write(bs); os.write('\n')
          n += 1; b += bs.length + 1
        }
        try {
          os.flush(); os.close()
          val code = conn.getResponseCode
          if (code / 100 != 2) {
            val err = Option(conn.getErrorStream)
              .map(s => new String(s.readAllBytes())).getOrElse("")
            throw new IllegalStateException(
              s"ingest POST failed: HTTP $code ${err.take(300)}")
          }
        } finally conn.disconnect()
        Iterator((n, b))
      }
    }.collect()
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-logsgen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = lines(spark, cfg)
    val (rows, bytes) = cfg.addr match {
      case "stdout" =>
        // stream the WHOLE corpus (the reference pipes all workers to
        // stdout); toLocalIterator keeps one partition in memory at a time
        val it = df.toLocalIterator()
        var rows = 0L; var bytes = 0L
        while (it.hasNext) {
          val line = it.next().getString(0)
          println(line)
          rows += 1; bytes += line.length + 1L
        }
        (rows, bytes)
      case d if d.startsWith("dir:") =>
        val out = d.stripPrefix("dir:")
        df.write.mode("overwrite").text(out)
        val n = spark.read.text(out).count()
        (n, new java.io.File(out).listFiles().map(_.length).sum)
      case url => push(df, url)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"tool":"logsgen","rows":$rows,"bytes":$bytes,"sec":$sec%.3f,""" +
      f""""rows_per_sec":${rows / sec}%.0f,"mb_per_sec":${bytes / sec / 1e6}%.1f}""")
    spark.stop()
  }
}
