package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for ngramJaccard plan shapes at tiny input: job count is
  * the latency driver (each AQE stage-job costs ~60-100ms local). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    import graft.ops.Dedup.shingles
    val docs0 = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
    val corpus = docs0.union(docs0.select((col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text")))
    val n = 3; val threshold = 0.3; val maxDocFreq = 10000

    def exploded = corpus.select(col("doc_id").as("id"), explode(shingles(col("text"), n)).as("g"))

    // A: current tree shape (groupBy df + join + post-rollup count joins)
    def vA: DataFrame = {
      val gdf = exploded.groupBy("g").agg(count(lit(1)).as("__df"))
      val rare = exploded.join(gdf.filter(col("__df") <= maxDocFreq), "g")
      val counts = rare.groupBy("id").agg(count(lit(1)).as("sh_count"))
      val pairs = rare.as("a").join(rare.as("b"), Seq("g"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(counts.select(col("id").as("id_a"), col("sh_count").as("ca")), "id_a")
        .join(counts.select(col("id").as("id_b"), col("sh_count").as("cb")), "id_b")
        .select(col("id_a"), col("id_b"), (col("common").cast("double") / (col("ca") + col("cb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    // B: carry counts through pair rollup, SMJ hints for exchange reuse
    def vB: DataFrame = {
      val gdf = exploded.groupBy("g").agg(count(lit(1)).as("__df"))
      val rare = exploded.hint("merge").join(gdf.filter(col("__df") <= maxDocFreq).hint("merge"), "g").select(col("id"), col("g"))
      val counts = rare.groupBy("id").agg(count(lit(1)).as("sh_count"))
      val inverted = rare.hint("merge").join(counts.hint("merge"), "id")
      val pairs = inverted.as("a").join(inverted.as("b"), Seq("g"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sh_count").as("ca"), col("b.sh_count").as("cb"))
        .agg(count(lit(1)).as("common"))
      pairs.select(col("id_a"), col("id_b"), (col("common").cast("double") / (col("ca") + col("cb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    // C: frequent-set LEFT ANTI (broadcast, tiny stop-phrase set), counts by size()
    //    minus per-doc frequent members counted via the same broadcast set
    def vC: DataFrame = {
      val sh = shingles(col("text"), n)
      val ex = corpus.select(col("doc_id").as("id"), size(sh).as("tot"), explode(sh).as("g"))
      val frequent = ex.groupBy("g").agg(count(lit(1)).as("__df")).filter(col("__df") > maxDocFreq)
      val rare = ex.join(broadcast(frequent), Seq("g"), "left_anti")
      val counts = rare.groupBy("id").agg(count(lit(1)).as("sh_count"))
      val inverted = rare.join(counts, "id")
      val pairs = inverted.as("a").join(inverted.as("b"), Seq("g"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sh_count").as("ca"), col("b.sh_count").as("cb"))
        .agg(count(lit(1)).as("common"))
      pairs.select(col("id_a"), col("id_b"), (col("common").cast("double") / (col("ca") + col("cb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    // D: groupBy(g) -> collect doc list (df-capped), explode pairs in place;
    //    ca/cb joined after from size() pre-explode (cutoff-unadjusted only
    //    when cutoff binds -- adjust via rare counts like C)
    def vD: DataFrame = {
      val sh = shingles(col("text"), n)
      val ex = corpus.select(col("doc_id").as("id"), explode(sh).as("g"))
      val byG = ex.groupBy("g").agg(collect_list("id").as("ids"))
        .filter(size(col("ids")).between(2, maxDocFreq))
      val pairs = byG.select(explode(expr(
        "flatten(transform(ids, a -> filter(transform(ids, b -> struct(a as id_a, b as id_b)), p -> p.id_a < p.id_b)))")).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(count(lit(1)).as("common"))
      val counts = ex.join(broadcast(ex.groupBy("g").agg(count(lit(1)).as("__df")).filter(col("__df") > maxDocFreq)), Seq("g"), "left_anti")
        .groupBy("id").agg(count(lit(1)).as("sh_count"))
      pairs
        .join(counts.select(col("id").as("id_a"), col("sh_count").as("ca")), "id_a")
        .join(counts.select(col("id").as("id_b"), col("sh_count").as("cb")), "id_b")
        .select(col("id_a"), col("id_b"), (col("common").cast("double") / (col("ca") + col("cb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    // E: two windows (g for df-cutoff, id for counts), self-join reuse
    def vE: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val rare = exploded
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("g")))
        .filter(col("__df") <= maxDocFreq)
        .withColumn("sh_count", count(lit(1)).over(Window.partitionBy("id")))
        .select(col("id"), col("g"), col("sh_count"))
      val pairs = rare.as("a").join(rare.as("b"), Seq("g"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sh_count").as("ca"), col("b.sh_count").as("cb"))
        .agg(count(lit(1)).as("common"))
      pairs.select(col("id_a"), col("id_b"), (col("common").cast("double") / (col("ca") + col("cb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    // F: original window shape (reference point)
    def vF: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val rare = exploded
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("g")))
        .filter(col("__df") <= maxDocFreq)
        .drop("__df")
      val counts = rare.groupBy("id").agg(count(lit(1)).as("sh_count"))
      val inverted = rare.join(counts, "id")
      val pairs = inverted.as("a").join(inverted.as("b"), Seq("g"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sh_count").as("ca"), col("b.sh_count").as("cb"))
        .agg(count(lit(1)).as("common"))
      pairs.select(col("id_a"), col("id_b"), (col("common").cast("double") / (col("ca") + col("cb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    def bench(name: String, f: => DataFrame): Unit = {
      f.count() // warm
      val runs = Seq.fill(3) {
        jobs.set(0)
        val t0 = System.nanoTime(); val c = f.count(); val ms = (System.nanoTime()-t0)/1e6
        (ms, jobs.get, c)
      }
      val m = runs.sortBy(_._1).apply(1)
      println(f"$name%-4s exec=${m._1}%7.1fms jobs=${m._2}%2d rows=${m._3}")
    }
    bench("E", vE); bench("F", vF); bench("B", vB); bench("E2", vE)
    spark.stop()
  }
}
