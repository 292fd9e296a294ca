package graft.logql

import org.scalatest.funsuite.AnyFunSuite

/** Runs every golden table from the reference's lib/prefixfilter/
  * filter_test.go (extracted to conformance/prefixfilter.txt, 184 cases)
  * against the [[PrefixFilter]] port — the allow/deny wildcard model the
  * needed-fields analysis threads through every pipe. */
class PrefixFilterConformanceSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private case class C(test: String, args: Seq[Any])

  private def loadCases(): Seq[C] = {
    val in = getClass.getResourceAsStream("/conformance/prefixfilter.txt")
    require(in != null, "missing prefixfilter.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).map { l =>
        val n = mapper.readTree(l)
        val args = (0 until n.get("args").size).map { i =>
          val a = n.get("args").get(i)
          if (a.isNull) null
          else if (a.isBoolean) java.lang.Boolean.valueOf(a.asBoolean)
          else if (a.isArray) (0 until a.size).map(a.get(_).asText)
          else a.asText
        }
        C(n.get("test").asText, args)
      }.toList
  }

  private def strs(a: Any): Seq[String] =
    if (a == null) Nil else a.asInstanceOf[Seq[String]]
  private def str(a: Any): String = a.asInstanceOf[String]
  private def bool(a: Any): Boolean = a.asInstanceOf[java.lang.Boolean]

  private def build(allow: Any, deny: Any): PrefixFilter = {
    val f = new PrefixFilter
    f.addAllowFilters(strs(allow))
    f.addDenyFilters(strs(deny))
    f
  }

  test("every filter_test.go golden matches the PrefixFilter port") {
    val cases = loadCases()
    assert(cases.size >= 184, s"corpus shrank: ${cases.size}")
    val bad = cases.flatMap { c =>
      val args = c.args
      def fail(got: Any, want: Any): Option[String] =
        Some(s"${c.test}(${args.mkString(", ")}): got $got want $want")
      def check(got: Any, want: Any): Option[String] =
        if (got == want) None else fail(got, want)
      c.test match {
        case "TestIsWildcardFilter" =>
          check(PrefixFilter.isWildcardFilter(str(args(0))), bool(args(1)))
        case "TestMatchFilter" =>
          check(PrefixFilter.matchFilter(str(args(0)), str(args(1))),
            bool(args(2)))
        case "TestMatchFilters" =>
          check(PrefixFilter.matchFilters(strs(args(0)), str(args(1))),
            bool(args(2)))
        case "TestMatchAll" =>
          check(PrefixFilter.matchAll(strs(args(0))), bool(args(1)))
        case "TestAppendReplace" =>
          check(PrefixFilter.appendReplace(str(args(0)), str(args(1)),
            str(args(2))), str(args(3)))
        case "TestFilter_MatchString_NilFilter" =>
          None // nil-receiver semantics don't exist in Scala
        case "TestFilter_Clone" =>
          val f = build(args(0), args(1))
          check(f.cloneFilter().toString, f.toString)
        case "TestFilter_GetAllowStrings" =>
          val f = build(args(0), args(1))
          val want = (Option(args(2)).map(_.asInstanceOf[Seq[String]]),
            bool(args(3)))
          val got = f.getAllowStrings match {
            case Some(s) => (if (s.isEmpty) None else Some(s), true)
            case None => (None, false)
          }
          // Go returns (nil, true) for an empty allow list
          check(got, (want._1.filter(_.nonEmpty), want._2))
        case "TestFilter_GetAllowFilters" =>
          check(build(args(0), args(1)).getAllowFilters, strs(args(2)))
        case "TestFilter_GetDenyFilters" =>
          check(build(args(0), args(1)).getDenyFilters, strs(args(2)))
        case "TestFilter_MatchStringOrWildcard" =>
          check(build(args(0), args(1)).matchStringOrWildcard(str(args(2))),
            bool(args(3)))
        case "TestFilter_DropBroaderDenyFilters" =>
          val f = new PrefixFilter
          f.addAllowFilter("*")
          f.addDenyFilters(strs(args(0)))
          f.addAllowFilters(strs(args(1)))
          check((f.getDenyFilters, f.getAllowFilters),
            (strs(args(2)), strs(args(3))))
        case other => Some(s"unknown test table $other")
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} prefixfilter mismatches:\n" +
      bad.mkString("\n"))
  }

  test("filter-pair invariants from TestFilter_MatchNothing/MatchAll") {
    // filter_test.go:124-200 (imperative sections transcribed)
    val f = new PrefixFilter
    assert(f.matchNothing && !f.matchAll)
    f.addAllowFilters(Seq("foo", "bar*"))
    assert(!f.matchNothing)
    f.addDenyFilters(Seq("abc", "def*"))
    assert(!f.matchNothing)
    val g = new PrefixFilter
    g.addAllowFilter("*")
    assert(g.matchAll)
    g.addDenyFilter("x*")
    assert(!g.matchAll)
    g.addAllowFilter("*")
    assert(g.matchAll)
  }
}
