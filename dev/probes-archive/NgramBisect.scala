package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bisect ngramJaccard's stage CPU: OHA rollup vs perDoc vs pair-gen vs
  * array_sort-lambda cost, warm min-of-5 wall each. */
object NgramBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    val spark = graft.Sessions.interactive(spark0)
    import graft.functions.Shingles.shingles
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
    val corpus = docs0.union(docs0.select((col("doc_id")+10000).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text")))
    val exploded = corpus.select(col("doc_id").as("id"),
      explode(shingles(col("text"), 3)).as("g"))
    def time(label: String)(df: => DataFrame): Unit = {
      df.count(); df.count()
      val ts = Seq.fill(5) {
        val t = System.nanoTime(); df.count(); (System.nanoTime()-t)/1e6 }.sorted
      println(f"$label%-34s min=${ts.head}%7.1fms med=${ts(2)}%7.1fms")
    }
    time("explode_only")(exploded)
    val gAgg = exploded.groupBy("g")
      .agg(graft.functions.CappedIds.idsWithCount(col("id"), 10001).as("r"))
      .select(col("r._1").as("ids"), col("r._2").as("__df"))
      .filter(col("__df") <= 10000)
    time("gAgg (CappedIds OHA)")(gAgg)
    time("gAgg collect_list instead")(
      exploded.groupBy("g").agg(collect_list(col("id")).as("ids"))
        .filter(size(col("ids")) <= 10000))
    val perDoc = gAgg.select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("sh_count"))
    time("perDoc")(perDoc)
    val buckets = gAgg.filter(col("__df") >= 2)
      .select(array_sort(col("ids")).as("ids"))
    time("buckets(array_sort)")(buckets)
    time("buckets(sort_array)")(gAgg.filter(col("__df") >= 2)
      .select(sort_array(col("ids")).as("ids")))
    val pairs = buckets
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    time("pairs")(pairs)
    println("pair rows: " + pairs.count() + "  gAgg groups: " + gAgg.count() +
      "  exploded rows: " + exploded.count())
    spark0.stop()
  }
}
