package graft.tools

/** Grammar-conformance sweep: extract every ```logsql code block from the
  * reference's own documentation (LogsQL.md, logsql-examples.md, …) and
  * feed it to the parser — PURELY as parse-input data. Each block is a
  * query a real user will paste verbatim, so the failure list IS the
  * remaining grammar gap list, ranked by documentation frequency.
  *
  * With `compile` as the second arg, every parsed query is ALSO compiled
  * against a real store relation and executed with a row cap — the
  * end-to-end "paste any docs example and it runs" check (fields the
  * docs reference that the fixture lacks read as empty, the reference's
  * missing-field semantics, so compile failures are genuine gaps).
  *
  * Usage: runMain graft.tools.DocsQueryProbe [docsDir] [compile]
  */
object DocsQueryProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/reference/docs/victorialogs")
    val doCompile = args.lift(1).contains("compile")
    lazy val (spark, logs) = {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val dir = graft.store.LogStore.ensureFromEvents(s, "/root/testdata/sf0.001")
      (s, graft.store.LogStore.read(s, dir))
    }
    val files = new java.io.File(root).listFiles()
      .filter(f => f.getName.endsWith(".md"))
      .sortBy(_.getName)
    val now = 1700000000000L * 1000000L
    var total = 0
    var ok = 0
    val failures = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[String]]
    for (f <- files) {
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
      var i = 0
      while (i < lines.length) {
        if (lines(i).trim == "```logsql") {
          val start = i + 1
          var j = start
          while (j < lines.length && !lines(j).trim.startsWith("```")) j += 1
          val q = lines.slice(start, j).mkString("\n").trim
          // skip documentation PLACEHOLDER pseudo-queries — `{...}`,
          // `<q> | ...`, `stats_func1(...)` are grammar sketches, not
          // queries a user can paste
          val placeholder = q.contains("{...}") || q.contains("<q>") ||
            q.contains("<filters>") || q.contains("stats_func") ||
            q.contains("<optional_pipe")
          if (q.nonEmpty && !placeholder) {
            total += 1
            try {
              val ast = graft.logql.Parser.parse(q, now)
              if (doCompile) {
                graft.logql.Compiler.run(logs, ast, now).limit(3).collect()
              }
              ok += 1
            } catch {
              case e: Exception =>
                val key = String.valueOf(e.getMessage).replace("\n", " ").take(90)
                failures.getOrElseUpdate(key,
                  scala.collection.mutable.ArrayBuffer.empty) += q.take(110)
            }
          }
          i = j + 1
        } else i += 1
      }
    }
    val verb = if (doCompile) "parsed+compiled+ran" else "parsed"
    println(s"[docsql] $verb $ok / $total docs queries (${failures.values.map(_.size).sum} failures)")
    failures.toSeq.sortBy(-_._2.size).foreach { case (err, qs) =>
      println(s"[docsql] ${qs.size}x  $err")
      qs.take(3).foreach(q => println(s"[docsql]      e.g. ${q.replace("\n", " ")}"))
    }
    if (doCompile) spark.stop()
  }
}
