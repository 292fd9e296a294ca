package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Randomized differential soak for needed-fields-bounded unpacks: the
  * curated NeededFieldsSpec matrix covers ~300 combos; this assembles
  * random middle-pipe chains from a wider pool (extract, collapse_nums,
  * replace, decolorize, math, copy/rename/delete, where) between a bare
  * unpack head and a narrowing tail, and compares the WHOLE result set
  * of the bounded compile against the kill-switched full parse.
  * Deterministic-result pipes only (no sample / tie-broken limits).
  *
  * Usage: runMain graft.tools.UnpackDiffFuzz [iters] [seed]
  */
object UnpackDiffFuzz {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(300)
    val seed = args.lift(1).map(_.toLong).getOrElse(8142026L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val msgs = Seq(
      """{"k":"v1","n":"7","other":"x=1 y=2"}""",
      """{"k":"v2","n":"-3.5","j":"[1,2]"}""",
      """{"k":"","n":"zz","deep":{"a":1}}""",
      """{"n":"42"}""", """{"k":null,"n":"0"}""",
      """{"k":"dup","k":"dup2"}""", "not json", "",
      """{"k":"with space","n":"1e3"}""", """  {"k":"ws"}""")
    val lfs = Seq("""k=v1 n=7 other="x y"""", "k= n=-2", "n=9 n=8 dup=1",
      "", "no pairs here", """k="q\"uote" n=0""", "k=v n=", "weird==x",
      "k=last n=1 k=first", "just=one")
    val df = msgs.zipWithIndex.map { case (m, i) =>
      (m, Seq("error", "info", "warn")(i % 3),
        if (i % 4 == 0) null else s"pre$i", lfs(i % lfs.length))
    }.toDF("_msg", "level", "k", "lf")
    val heads = Seq(
      "* | unpack_json from _msg",
      "* | unpack_json from _msg skip_empty_results",
      "* | unpack_json from _msg keep_original_fields",
      "* | unpack_json if (level:error) from _msg",
      """* | unpack_json from _msg result_prefix "p_"""",
      "* | unpack_logfmt from lf",
      "* | unpack_logfmt if (level:info) from lf skip_empty_results")
    val mids = Seq(
      """format "<k>/<n>" as f""",
      "math (n * 2) as n2",
      "copy k as k2", "rename n as m", "delete other",
      """replace ("v", "V") at k""",
      "collapse_nums at k", "decolorize k",
      """extract "x=<xv> " from other""",
      "where n:>0", "len(k) as kl",
      "unpack_logfmt from other",
      "hash k as kh")
    val tails = Seq(
      "stats by (k) count() c",
      "stats by (k, level) count() c, min(n) mn",
      "stats count_uniq(k) uk, sum(n) sn",
      "uniq by (k, level)",
      "stats by (f) count() c",
      "stats by (k2) max(n) mx",
      "field_values k")
    val rnd = new scala.util.Random(seed)
    var diverged = 0
    var ran = 0
    def rows(q: String): Seq[String] =
      graft.logql.Compiler.run(df, q, 0L).collect()
        .map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq
    for (i <- 1 to iters) {
      val h = heads(rnd.nextInt(heads.length))
      val nm = rnd.nextInt(3)
      val mid = Seq.fill(nm)(mids(rnd.nextInt(mids.length)))
      val t = tails(rnd.nextInt(tails.length))
      val q = (h +: mid :+ t).mkString(" | ")
      // EACH path runs in its own try: a chain where exactly one path
      // throws (e.g. bounded compile fails, full parse succeeds) is a
      // DIVERGENCE, not a deliberate compile error — wrapping both runs
      // in one try silently skipped that case when the bounded path
      // failed first
      def attempt(f: => Seq[String]): Either[Throwable, Seq[String]] =
        try Right(f)
        catch {
          case e: graft.logql.ParseException => Left(e)
          case e: UnsupportedOperationException => Left(e)
          case e: org.apache.spark.sql.AnalysisException => Left(e)
        }
      val bounded = attempt(rows(q))
      System.setProperty("graft.neededfields.disable", "1")
      val full = try attempt(rows(q))
      finally System.clearProperty("graft.neededfields.disable")
      ran += 1
      val same = (bounded, full) match {
        case (Right(a), Right(b)) => a == b
        // both erroring is agreement (deliberate compile errors), but the
        // exception CLASS must match — a different failure mode diverges
        case (Left(a), Left(b)) => a.getClass == b.getClass
        case _ => false
      }
      if (!same) {
        diverged += 1
        println(s"DIVERGED: $q")
        println(s"  bounded=${bounded.fold(e => s"ERR ${e.getClass.getSimpleName}", _.take(6).toString)}")
        println(s"  full   =${full.fold(e => s"ERR ${e.getClass.getSimpleName}", _.take(6).toString)}")
      }
      if (i % 100 == 0) println(s"[unpackdiff] $i/$iters ran=$ran diverged=$diverged")
    }
    println(s"[unpackdiff] DONE: $ran compared, $diverged diverged (seed=$seed)")
    spark.stop()
    if (diverged > 0) sys.exit(1)
  }
}
