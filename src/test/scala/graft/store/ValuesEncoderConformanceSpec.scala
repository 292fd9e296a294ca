package graft.store

import graft.SparkSuite
import graft.functions.GoValues
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-golden conformance for the write-time value_type classifier:
  *
  *  - every tryParseUint64 / tryParseInt64 / tryParseFloat64Exact /
  *    tryParseIPv4 / tryParseTimestampISO8601 golden from
  *    values_encoder_test.go runs against the exact GoValues ports
  *    (conformance/values_encoder.txt, 90 cases);
  *  - the TestValuesEncoder type-decision table (values_encoder_test.go:
  *    11-99) re-generated verbatim and pushed through the one-pass
  *    classify aggregate. The reference reports a single-valued block as
  *    `dict`; this engine layers the const-column concept above the
  *    encoder (like the reference's own const columns) and reports
  *    `const` — the one documented mapping.
  */
class ValuesEncoderConformanceSpec extends SparkSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def lines(name: String): List[String] = {
    val in = getClass.getResourceAsStream(s"/conformance/$name")
    require(in != null, s"missing $name")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).toList
  }

  test("every tryParseXxx golden from values_encoder_test matches") {
    def f64eq(a: Double, b: Double): Boolean =
      math.abs(a - b) * math.abs(math.max(a, b)) < 1e-15
    val bad = lines("values_encoder.txt").flatMap { l =>
      val n = mapper.readTree(l)
      val in = n.get("in").asText
      val out = Option(n.get("out")).map(_.asText)
      def check(ok: Boolean, wantOk: Boolean, detail: String = "") =
        if (ok == wantOk && detail.isEmpty) None
        else if (detail.nonEmpty) Some(s"<<$in>> $detail")
        else Some(s"<<$in>> ok=$ok want=$wantOk")
      n.get("t").asText match {
        case "ipv4_ok" => check(GoValues.parseIpv4Ok(in), wantOk = true)
        case "ipv4_bad" => check(GoValues.parseIpv4Ok(in), wantOk = false)
        case "iso_ok" => check(GoValues.parseIso8601Ok(in), wantOk = true)
        case "iso_bad" => check(GoValues.parseIso8601Ok(in), wantOk = false)
        case "u64_ok" =>
          val v = GoValues.parseUint64(in)
          if (v == null) Some(s"<<$in>> uint64 parse failed")
          else if (v.toString != out.get) Some(s"<<$in>> got $v want ${out.get}")
          else None
        case "u64_bad" => check(GoValues.parseUint64(in) == null, wantOk = true)
        case "i64_ok" =>
          val v = GoValues.parseInt64(in)
          if (v == null) Some(s"<<$in>> int64 parse failed")
          else if (v.toString != out.get) Some(s"<<$in>> got $v want ${out.get}")
          else None
        case "i64_bad" => check(GoValues.parseInt64(in) == null, wantOk = true)
        case "f64x_ok" =>
          val v = GoValues.parseFloat64Exact(in)
          if (v == null) Some(s"<<$in>> float64-exact parse failed")
          else if (!f64eq(v, out.get.toDouble))
            Some(s"<<$in>> got $v want ${out.get}")
          else None
        case "f64x_bad" =>
          check(GoValues.parseFloat64Exact(in) == null, wantOk = true)
      }
    }
    assert(bad.isEmpty, s"\n${bad.size} parse-golden mismatches:\n" +
      bad.mkString("\n"))
  }

  private def classifyValues(vals: Seq[String]): String = {
    val schema = StructType(Seq(StructField("v", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 2), schema)
    ValueTypeMeta.classify(df, Seq("v" -> coalesce(col("v"), lit(""))))("v")
  }

  test("TestValuesEncoder type decisions match (const for 1-distinct)") {
    // values_encoder_test.go:46-99, regenerated verbatim (9 = maxDictLen+1)
    val idx = 0 until 9

    assert(classifyValues(idx.map(i => s"value_$i")) == "string")

    // the reference encoder reports a single value as dict; the engine's
    // const-column layer claims it first (same observable pruning power)
    assert(classifyValues(Seq("foobar")) == "const")
    assert(classifyValues(Seq("foo", "bar")) == "dict")
    assert(classifyValues(Seq("1", "2foo")) == "dict")

    assert(classifyValues(idx.map(i => s"${i + 1}")) == "uint8")
    assert(classifyValues(idx.map(i => s"${(i + 1).toLong << 8}")) == "uint16")
    assert(classifyValues(idx.map(i => s"${(i + 1).toLong << 16}")) == "uint32")
    assert(classifyValues(idx.map(i => s"${(i + 1).toLong << 32}")) == "uint64")

    // %g of sqrt(i+1) — GoFloat.format is the %g/-1 analogue
    assert(classifyValues(idx.map(i =>
      graft.functions.GoFloat.format(math.sqrt((i + 1).toDouble)))) == "float64")

    assert(classifyValues(idx.map(i => s"1.2.3.$i")) == "ipv4")

    assert(classifyValues(idx.map(i =>
      f"2011-04-19T03:44:01.$i%03dZ")) == "iso8601")
  }

  test("classifier follows the encoder's leading-zero and underscore rules") {
    // spot rules that the old regex classifier got wrong (8361: leading
    // zeros are strings; underscore digit groups are numbers)
    assert(classifyValues(Seq("012", "0123", "01", "07", "001", "002",
      "003", "004", "005")) == "string")
    assert(classifyValues(Seq("1_000", "2_000", "3_000", "4_000", "5_000",
      "6_000", "7_000", "8_000", "9_000")) == "uint16")
    // 9 distinct exponent floats: rejected by the exponent-free rule
    assert(classifyValues((1 to 9).map(i => s"${i}e5")) == "string")
  }
}
