package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Direct contract tests for the duplicate-key-safe map builders (the
  * ingestion/query paths exercise them end-to-end; these pin the helper
  * itself so reuse elsewhere stays safe). */
class MapOpsSpec extends SparkSuite {

  private def entriesDf(pairs: Seq[(String, String)]*) = {
    val schema = StructType(Seq(StructField("e",
      ArrayType(StructType(Seq(
        StructField("key", StringType), StructField("value", StringType)))))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        pairs.map(p => Row(p.map { case (k, v) => Row(k, v) })), 1),
      schema)
  }

  test("entriesFirstWins / entriesLastWins precedence and order") {
    val df = entriesDf(Seq("a" -> "1", "b" -> "2", "a" -> "3", "c" -> "4"))
    val first = df.select(MapOps.entriesFirstWins(col("e"))).collect().head
      .getAs[Map[String, String]](0)
    assert(first == Map("a" -> "1", "b" -> "2", "c" -> "4"))
    val last = df.select(MapOps.entriesLastWins(col("e"))).collect().head
      .getAs[Map[String, String]](0)
    assert(last == Map("a" -> "3", "b" -> "2", "c" -> "4"))
    // duplicate-free input keeps its entry order under BOTH policies
    // (LAST_WIN keeps the later position only for actual duplicates)
    val clean = entriesDf(Seq("z" -> "1", "a" -> "2", "m" -> "3"))
    for (f <- Seq(MapOps.entriesFirstWins(_), MapOps.entriesLastWins(_))) {
      val keys = clean.select(map_keys(f(col("e")))).collect().head
        .getAs[scala.collection.Seq[String]](0)
      assert(keys == Seq("z", "a", "m"), keys.toString)
    }
  }

  test("dedupKeysFirst survives downstream map rebuilds; null propagates") {
    import spark.implicits._
    val df = Seq("""{"k":"1","k":"2","x":"9"}""", "not json").toDF("j")
    val m = MapOps.dedupKeysFirst(
      from_json(col("j"), MapType(StringType, StringType)))
    // the rebuild (map_filter) is exactly what threw DUPLICATED_MAP_KEY
    // on the raw from_json output
    val out = df.select(map_filter(m, (k, _) => k =!= "x").as("m"))
      .collect().map(r => Option(r.getAs[Map[String, String]]("m")))
    assert(out(0) == Some(Map("k" -> "1")))
    assert(out(1).isEmpty) // unparseable → null map, not empty
  }

  test("concatLastWins layers with later-argument precedence, null-safe") {
    import spark.implicits._
    val df = Seq(1).toDF("i")
    val out = df.select(MapOps.concatLastWins(
      map(lit("a"), lit("base"), lit("b"), lit("base")),
      lit(null).cast(MapType(StringType, StringType)),
      map(lit("b"), lit("override"))).as("m"))
      .collect().head.getAs[Map[String, String]]("m")
    assert(out == Map("a" -> "base", "b" -> "override"))
  }
}
