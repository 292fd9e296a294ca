package graft.tools

import graft.logql.{Canon, Parser}

/** Diffs Canon.query against the reference's (input, canonical) pairs
  * from TestParseQuery_Success (src/test/resources/conformance/
  * parser_canonical.txt). Prints every mismatch; drives the renderer to
  * conformance the same way ParserCorpusProbe drove the grammar.
  */
object CanonProbe {
  private val NOW = 1700000000000000000L
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def main(args: Array[String]): Unit = {
    val lines = Option(getClass.getResourceAsStream("/conformance/parser_canonical.txt"))
      .map(in => scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList)
      .getOrElse(scala.io.Source.fromFile(
        "src/test/resources/conformance/parser_canonical.txt", "UTF-8").getLines().toList)
      .filterNot(_.startsWith("#"))
    var bad = 0
    var n = 0
    val limit = if (args.nonEmpty) args(0).toInt else 80
    lines.foreach { l =>
      val arr = mapper.readValue(l, classOf[Array[String]])
      val (in, want) = (arr(0), arr(1))
      n += 1
      try {
        val got = Canon.query(Parser.parse(in, NOW))
        if (got != want) {
          bad += 1
          if (bad <= limit) {
            println(s"IN   <<$in>>")
            println(s"WANT <<$want>>")
            println(s"GOT  <<$got>>")
            println()
          }
        }
      } catch {
        case e: Exception =>
          bad += 1
          if (bad <= limit) println(s"ERR  <<$in>> -- ${e.getMessage}\n")
      }
    }
    println(s"== canonical: ${n - bad}/$n match")
  }
}
