package graft

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress

import graft.server.{IngestServer, QueryServer}
import graft.store.LogStore

/** Unified single-port log service (the reference serves both halves on
  * :9428): `/insert/...` ingestion and `/select/logsql/...` queries mount
  * on one HTTP server over one store directory, plus syslog TCP/UDP
  * listeners. The query side re-resolves the store relation per request,
  * so freshly ingested rows are immediately queryable.
  *
  * {{{
  *   sbt "runMain graft.Server /path/to/store 9428"
  * }}}
  */
object Server {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Server <storeDir> [port] [syslogTcpPort] [syslogUdpPort]")
      sys.exit(2)
    }
    val storeDir = args(0)
    val port = args.lift(1).map(_.toInt).getOrElse(9428)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", String.valueOf(256 * 1024))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (http, boundPort) = start(spark, storeDir, port)
    val ingest = new IngestServer(spark, storeDir)
    val tcpPort = args.lift(2).map(_.toInt).map(p => ingest.startSyslogTcp(port = p))
    val udpPort = args.lift(3).map(_.toInt).map(p => ingest.startSyslogUdp(port = p))

    // background merge + retention, like the reference's bgMergers /
    // retention watcher; interval and retention are env-tunable
    graft.store.Compaction.startBackground(spark, storeDir,
      intervalMs = sys.env.get("SPARK_GRAFT_COMPACT_INTERVAL_MS")
        .map(_.toLong).getOrElse(60000L),
      retentionDays = sys.env.get("SPARK_GRAFT_RETENTION_DAYS").map(_.toInt))

    System.err.println(s"graft log service on http://127.0.0.1:$boundPort " +
      s"(/insert/*, /select/logsql/*)" +
      tcpPort.map(p => s", syslog tcp :$p").getOrElse("") +
      udpPort.map(p => s", syslog udp :$p").getOrElse(""))
    // block until killed
    Thread.currentThread().join()
  }

  /** Build and start the combined server; returns (server, bound port).
    * Factored out so tests can drive an ephemeral port. */
  def start(spark: SparkSession, storeDir: String,
            port: Int = 0): (HttpServer, Int) = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    new IngestServer(spark, storeDir).attach(http)
    // lazy per-request resolution: LogStore.read memoizes and ingest
    // invalidates, so each query sees the latest file set; before the
    // first ingest the store may not exist yet — surface that as an
    // empty-store error per request rather than failing startup
    new QueryServer(spark, () => LogStore.read(spark, storeDir), 0,
      storeDir = Some(storeDir)).attach(http)
    http.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    http.start()
    (http, http.getAddress.getPort)
  }
}
