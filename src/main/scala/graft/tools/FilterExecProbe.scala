package graft.tools

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import graft.logql.{Canon, Compiler, Filter}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executes the reference's filter golden tests
  * (filter_*_test.go testFilterMatchForColumns tables, extracted to
  * conformance/filter_exec.txt): build the column table as a DataFrame
  * with a row index, reconstruct the filter AST from the struct fields,
  * render it to LogsQL text (Canon) and run it through the full
  * parse→compile path, then compare the surviving row-index set.
  *
  * Each row also carries the generator's constant stream tags
  * (job=foobar, instance=host1:234 — filter_test.go:249-263).
  */
object FilterExecProbe {
  private val mapper = new ObjectMapper()

  case class Case(src: String, filterJson: JsonNode,
                  columns: Seq[(String, Seq[String])],
                  resultField: String, expected: Seq[Int])

  def loadCases(): Seq[Case] = {
    val in = Option(getClass.getResourceAsStream("/conformance/filter_exec.txt"))
      .map(scala.io.Source.fromInputStream(_, "UTF-8"))
      .getOrElse(scala.io.Source.fromFile(
        "src/test/resources/conformance/filter_exec.txt", "UTF-8"))
    in.getLines().filterNot(_.startsWith("#")).map { l =>
      val n = mapper.readTree(l)
      val cols = (0 until n.get("columns").size).map { i =>
        val c = n.get("columns").get(i)
        val vals = (0 until c.get(1).size).map(j => c.get(1).get(j).asText)
        (c.get(0).asText, vals)
      }
      val exp = (0 until n.get("expected_rows").size)
        .map(i => n.get("expected_rows").get(i).asInt)
      Case(n.get("src").asText, n.get("filter"), cols,
        n.get("result_field").asText, exp)
    }.toList
  }

  /** filterX struct JSON → graft Filter AST (reprs filled so Canon can
    * render it back to parseable LogsQL). */
  def buildFilter(n: JsonNode): Filter = {
    val f = n.get("fields")
    def str(k: String): String =
      Option(f.get(k)).map(_.asText).getOrElse("")
    def strs(k: String): Seq[String] = Option(f.get(k)).map { a =>
      (0 until a.size).map(a.get(_).asText)
    }.getOrElse(Nil)
    def num(k: String): Double =
      Option(f.get(k)).map(_.asDouble).getOrElse(0d)
    def lng(k: String): Long =
      Option(f.get(k)).map(_.asLong).getOrElse(0L)
    val field = str("fieldName")
    n.get("type").asText match {
      case "filterNoop" => Filter.Noop
      case "filterPhrase" => Filter.Phrase(field, str("phrase"))
      case "filterPrefix" => Filter.Prefix(field, str("prefix"))
      case "filterAnyCasePhrase" => Filter.AnyCasePhrase(field, str("phrase"))
      case "filterAnyCasePrefix" => Filter.AnyCasePrefix(field, str("prefix"))
      case "filterExact" => Filter.Exact(field, str("value"))
      case "filterExactPrefix" => Filter.ExactPrefix(field, str("prefix"))
      case "filterIn" => Filter.In(field, strs("values"))
      case "filterContainsAll" => Filter.ContainsAll(field, strs("values"))
      case "filterContainsAny" => Filter.ContainsAny(field, strs("values"))
      case "filterSequence" => Filter.Sequence(field, strs("phrases"))
      case "filterRegexp" => Filter.Regexp(field, str("re"))
      case "filterRange" =>
        val (lo, hi) = (num("minValue"), num("maxValue"))
        Filter.Range(field, lo, hi, inclLo = true, inclHi = true,
          s"range[${graft.functions.GoFloat.format(lo)}, ${graft.functions.GoFloat.format(hi)}]")
      case "filterIPv4Range" =>
        Filter.Ipv4Range(field, lng("minValue"), lng("maxValue"))
      case "filterStringRange" =>
        Filter.StringRange(field, str("minValue"), str("maxValue"),
          s"string_range(${Canon.quoteToken(str("minValue"))}, ${Canon.quoteToken(str("maxValue"))})")
      case "filterLenRange" =>
        Filter.LenRange(field, lng("minLen"), lng("maxLen"),
          s"len_range(${lng("minLen")}, ${lng("maxLen")})")
      case "filterValueType" => Filter.ValueType(field, str("valueType"))
      case "filterEqField" => Filter.EqField(field, str("otherFieldName"))
      case "filterLeField" =>
        if (Option(f.get("excludeEqualValues")).exists(_.asBoolean))
          Filter.LtField(field, str("otherFieldName"))
        else Filter.LeField(field, str("otherFieldName"))
      case "filterNot" => Filter.Not(buildFilter(f.get("f")))
      case "filterAnd" | "filterOr" =>
        val kids = Option(f.get("filters")).map { a =>
          (0 until a.size).map(i => buildFilter(a.get(i)))
        }.getOrElse(Nil)
        if (n.get("type").asText == "filterAnd") Filter.And(kids)
        else Filter.Or(kids)
      case "filterTime" =>
        // struct bounds are INCLUSIVE nanos (filter_time.go); the AST is
        // half-open on the high side
        val (lo, hi) = (lng2(f, "minTimestamp"), lng2(f, "maxTimestamp"))
        Filter.TimeRange(lo, if (hi == Long.MaxValue) hi else hi + 1,
          repr = s"[$lo, $hi]")
      case "filterDayRange" =>
        Filter.DayRange(lng2(f, "start"), lng2(f, "end"),
          lng2(f, "offset"), repr = s"[${lng2(f, "start")}, ${lng2(f, "end")}]")
      case "filterWeekRange" =>
        Filter.WeekRange(lng2(f, "startDay").toInt, lng2(f, "endDay").toInt,
          lng2(f, "offset"), repr = s"[${lng2(f, "startDay")}, ${lng2(f, "endDay")}]")
      case other => throw new IllegalArgumentException(s"filter type $other")
    }
  }

  private def lng2(f: JsonNode, k: String): Long =
    Option(f.get(k)).map(_.asLong).getOrElse(0L)

  def buildInput(spark: SparkSession, c: Case): DataFrame = {
    val names = c.columns.map(_._1) ++
      Seq("job", "instance").filterNot(c.columns.map(_._1).contains)
    val nRows = c.columns.headOption.map(_._2.size).getOrElse(0)
    val schema = StructType(
      StructField("__idx", IntegerType) +: names.map(StructField(_, StringType)))
    val consts = Map("job" -> "foobar", "instance" -> "host1:234")
    val rows = (0 until nRows).map { i =>
      Row.fromSeq(i +: names.map { nm =>
        c.columns.find(_._1 == nm).map(_._2(i))
          .orElse(consts.get(nm)).orNull
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.min(2, math.max(1, nRows))),
      schema)
  }

  def runCase(spark: SparkSession, c: Case): Option[String] = {
    try {
      val ast = buildFilter(c.filterJson)
      val text = Canon.filter(ast)
      val df = buildInput(spark, c)
      val out = Compiler.run(df, s"$text | fields __idx", 0L)
      val got = out.collect().map(_.getAs[Any]("__idx").toString.toInt)
        .toSeq.sorted
      if (got == c.expected.sorted) None
      else Some(s"${c.src} <<$text>>\n  want ${c.expected.sorted.mkString(",")}" +
        s"\n  got  ${got.mkString(",")}")
    } catch {
      case e: Exception =>
        Some(s"${c.src} <<${c.filterJson}>> !! ${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
    }
  }

  // ---- filter_query_exec.txt: ParseQuery-based and timestamp-struct cases
  // (filter_and/or_test.go + filter_time/day_range/week_range_test.go)

  sealed trait QCase { def src: String; def expected: Seq[Int] }
  case class QueryCase(src: String, query: String,
                       columns: Seq[(String, Seq[String])],
                       resultField: String, expected: Seq[Int]) extends QCase
  case class TsCase(src: String, timestamps: Seq[Long],
                    filterJson: JsonNode, expected: Seq[Int]) extends QCase

  def loadQueryCases(): Seq[QCase] = {
    val in = Option(getClass.getResourceAsStream(
      "/conformance/filter_query_exec.txt"))
      .map(scala.io.Source.fromInputStream(_, "UTF-8"))
      .getOrElse(scala.io.Source.fromFile(
        "src/test/resources/conformance/filter_query_exec.txt", "UTF-8"))
    in.getLines().filterNot(_.startsWith("#")).map { l =>
      val n = mapper.readTree(l)
      val exp = (0 until n.get("expected_rows").size)
        .map(i => n.get("expected_rows").get(i).asInt)
      n.get("kind").asText match {
        case "query" =>
          val cols = (0 until n.get("columns").size).map { i =>
            val c = n.get("columns").get(i)
            (c.get(0).asText,
              (0 until c.get(1).size).map(j => c.get(1).get(j).asText))
          }
          QueryCase(n.get("src").asText, n.get("query").asText, cols,
            n.get("result_field").asText, exp)
        case "timestamps" =>
          val ts = (0 until n.get("timestamps").size)
            .map(i => n.get("timestamps").get(i).asLong)
          TsCase(n.get("src").asText, ts, n.get("filter"), exp)
      }
    }.toList
  }

  def runQCase(spark: SparkSession, c: QCase): Option[String] = {
    try {
      val (df, q) = c match {
        case QueryCase(_, query, columns, rf, _) =>
          val base = buildInput(spark,
            Case(c.src, mapper.createObjectNode(), columns, rf, c.expected))
          (base, graft.logql.Parser.parse(s"$query | fields __idx", 0L))
        case TsCase(_, ts, fj, _) =>
          // native nanosecond _time column, like the reference's storage
          val schema = StructType(Seq(
            StructField("__idx", IntegerType), StructField("_time", LongType),
            StructField("_msg", StringType)))
          val rows = ts.zipWithIndex.map { case (t, i) =>
            Row(i, t, s"some value for row $i")
          }
          val df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 2), schema)
          (df, graft.logql.Query(buildFilter(fj),
            graft.logql.Parser.parse("* | fields __idx", 0L).pipes))
      }
      val out = Compiler.run(df, q, 0L)
      val got = out.collect().map(_.getAs[Any]("__idx").toString.toInt)
        .toSeq.sorted
      if (got == c.expected.sorted) None
      else Some(s"${c.src}\n  want ${c.expected.sorted.mkString(",")}" +
        s"\n  got  ${got.mkString(",")}")
    } catch {
      case e: Exception =>
        Some(s"${c.src} !! ${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
    }
  }

  def main(args: Array[String]): Unit = {
    val only = args.headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("filter-exec-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cases = loadCases().filter(c => only.forall(c.src.contains))
    var bad = 0
    val t0 = System.nanoTime()
    cases.foreach { c =>
      runCase(spark, c).foreach { m => bad += 1; println(m) }
    }
    println(f"== filter-exec: ${cases.size - bad}/${cases.size} match " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    val qcases = loadQueryCases().filter(c => only.forall(c.src.contains))
    var qbad = 0
    qcases.foreach { c =>
      runQCase(spark, c).foreach { m => qbad += 1; println(m) }
    }
    println(f"== filter-query-exec: ${qcases.size - qbad}/${qcases.size} match")
    spark.stop()
  }
}
