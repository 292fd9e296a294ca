package graft.tools

import graft.logql.Parser

/** Runs the reference's parser_test.go accept/reject corpus (extracted by
  * tools/extract_parser_corpus.py into src/test/resources/conformance/)
  * through [[graft.logql.Parser]] and prints every disagreement, so the
  * allowlists in ParserConformanceSpec stay explicit and justified.
  */
object ParserCorpusProbe {
  private val NOW = 1700000000000000000L

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def load(name: String): Seq[String] = {
    // classpath when run from tests; repo-relative path when runMain'd
    val lines = Option(getClass.getResourceAsStream(s"/conformance/$name"))
      .map(in => scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList)
      .getOrElse(scala.io.Source.fromFile(
        s"src/test/resources/conformance/$name", "UTF-8").getLines().toList)
    lines.filterNot(_.startsWith("#"))
      .map(l => mapper.readValue(l, classOf[String]))
  }

  def main(args: Array[String]): Unit = {
    val success = load("parser_success.txt")
    val failure = load("parser_failure.txt")
    var sBad, fBad = 0
    success.foreach { q =>
      try Parser.parse(q, NOW)
      catch {
        case e: Exception =>
          sBad += 1
          println(s"SHOULD-PARSE rejected: <<$q>> -- ${e.getMessage.take(100)}")
      }
    }
    failure.foreach { q =>
      try {
        Parser.parse(q, NOW)
        fBad += 1
        println(s"SHOULD-REJECT accepted: <<$q>>")
      } catch { case _: Exception => () }
    }
    println(s"== success corpus: ${success.size - sBad}/${success.size} parse")
    println(s"== failure corpus: ${failure.size - fBad}/${failure.size} reject")
  }
}
