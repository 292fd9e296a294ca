package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import graft.logql.{Compiler, Render}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executes the reference's own pipe golden tests (pipe_*_test.go
  * expectPipeResults tables, extracted to conformance/pipe_exec.txt by
  * tools/extract_pipe_corpus.py) against the Spark compiler.
  *
  * Each case: build a tiny all-string DataFrame from the input rows, run
  * `* | <pipe>`, render the result back to (name, value) string pairs,
  * and compare as an order-insensitive multiset — with empty values
  * dropped on both sides, since the reference's field model treats a
  * missing field and an empty value as equivalent (its tests emit
  * per-block column sets that a uniform relation cannot reproduce).
  */
object PipeExecProbe {
  private val NOW = 1700000000000000000L
  private val mapper = new ObjectMapper()

  case class Case(src: String, pipe: String,
                  in: Seq[Seq[(String, String)]],
                  out: Seq[Seq[(String, String)]])

  def loadCases(): Seq[Case] = {
    val in = Option(getClass.getResourceAsStream("/conformance/pipe_exec.txt"))
      .map(scala.io.Source.fromInputStream(_, "UTF-8"))
      .getOrElse(scala.io.Source.fromFile(
        "src/test/resources/conformance/pipe_exec.txt", "UTF-8"))
    in.getLines().filterNot(_.startsWith("#")).map { l =>
      val n = mapper.readTree(l)
      def rows(key: String): Seq[Seq[(String, String)]] = {
        val arr = n.get(key)
        (0 until arr.size).map { i =>
          val row = arr.get(i)
          (0 until row.size).map { j =>
            val f = row.get(j)
            (f.get(0).asText, f.get(1).asText)
          }
        }
      }
      Case(n.get("src").asText, n.get("pipe").asText, rows("in"), rows("out"))
    }.toList
  }

  def buildInput(spark: SparkSession, rows: Seq[Seq[(String, String)]]): DataFrame = {
    val cols = rows.flatMap(_.map(_._1)).distinct
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    val data = rows.map { r =>
      val m = r.toMap
      Row.fromSeq(cols.map(c => m.getOrElse(c, null)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.min(2, math.max(1, rows.size))),
      schema)
  }

  /** Collect a result DataFrame as reference-style string fields. The
    * engine's dynamic `fields` map column is the internal home of
    * unpacked/extracted fields — every output surface (NDJSON emit, CLI)
    * flattens its entries into the row, so the probe does the same. */
  def collectRows(df: DataFrame): Seq[Seq[(String, String)]] = {
    val isFieldsMap: StructField => Boolean = f =>
      f.name == "fields" && f.dataType.isInstanceOf[MapType]
    val rendered = df.select(df.schema.fields.map { f =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      (f.dataType match {
        case _ if isFieldsMap(f) => to_json(c)
        case DoubleType | FloatType => Render.goDouble(c)
        case TimestampType | TimestampNTZType => Render.rfc3339(c)
        case _: MapType => to_json(c)
        case _: ArrayType => to_json(c)
        case _ => c.cast(StringType)
      }).as(f.name)
    }.toSeq: _*)
    val fieldsIdx = df.schema.fields.indexWhere(isFieldsMap)
    rendered.collect().toSeq.map { r =>
      val top = rendered.schema.fieldNames.toSeq.zipWithIndex
        .filter(_._2 != fieldsIdx)
        .flatMap { case (n, i) =>
          Option(r.getString(i)).filter(_.nonEmpty).map(v => (n, v))
        }
      val dyn: Seq[(String, String)] =
        if (fieldsIdx < 0) Nil
        else Option(r.getString(fieldsIdx)).filter(_.nonEmpty).toSeq.flatMap { js =>
          val node = mapper.readTree(js)
          val it = node.fields()
          val buf = Seq.newBuilder[(String, String)]
          while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue.asText)) }
          buf.result()
        }
      // top-level columns shadow same-named map entries (strF precedence)
      val topNames = top.map(_._1).toSet
      top ++ dyn.filterNot { case (k, _) => topNames(k) }
    }
  }

  /** Order-insensitive, empty-dropped normalization. */
  def normalize(rows: Seq[Seq[(String, String)]]): Seq[Seq[(String, String)]] =
    rows.map(_.filter(_._2.nonEmpty).sorted)
      .sortBy(_.map { case (k, v) => s"$k\u0000$v" }.mkString("\u0001"))

  def runCase(spark: SparkSession, c: Case): Option[String] = {
    try {
      val df = buildInput(spark, c.in)
      val out = Compiler.run(df, "* | " + c.pipe, NOW)
      val got = normalize(collectRows(out))
      val want = normalize(c.out)
      if (got == want) None
      else Some(s"${c.src} <<${c.pipe}>>\n  want ${fmt(want)}\n  got  ${fmt(got)}")
    } catch {
      case e: Exception =>
        Some(s"${c.src} <<${c.pipe}>> !! ${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
    }
  }

  private def fmt(rows: Seq[Seq[(String, String)]]): String =
    rows.map(_.map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}"))
      .mkString("[", " ", "]")

  def main(args: Array[String]): Unit = {
    val only = args.headOption // substring filter on src or pipe
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("pipe-exec-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cases = loadCases().filter(c =>
      only.forall(f => c.src.contains(f) || c.pipe.contains(f)))
    var bad = 0
    val t0 = System.nanoTime()
    cases.foreach { c =>
      runCase(spark, c).foreach { msg => bad += 1; println(msg) }
    }
    println(f"== pipe-exec: ${cases.size - bad}/${cases.size} match " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    spark.stop()
  }
}
