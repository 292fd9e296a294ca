package graft.tools

import graft.logql.Parser

/** Ad-hoc parse probe: prints the AST of each argument query. */
object MiniParse {
  def main(args: Array[String]): Unit =
    args.foreach { q =>
      try println(s"<<$q>> => ${Parser.parse(q, 1700000000000000000L)}")
      catch { case e: Exception => println(s"<<$q>> !! ${e.getMessage}") }
    }
}
