package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions entry point must expose the engine's custom
  * expressions to plain SQL sessions. */
class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions registers codegen'd functions for plain SQL") {
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session with the extension applied the
      // way a cluster would: spark.sql.extensions=graft.GraftExtensions
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      try {
        val r = s2.sql(
          """SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
                    graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                    graft_ipv4('10.0.0.1') AS ip,
                    graft_logfmt('a=1 b="x y"') AS m""").collect().head
        assert(r.getDouble(0) == 11.0)
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
        assert(r.getLong(2) == ((10L << 24) | 1L))
        assert(r.getAs[Map[String, String]](3) == Map("a" -> "1", "b" -> "x y"))
        // the whole table is injected, not a hand-picked subset: every
        // name in GraftFunctions.all resolves in a plain SQL session
        val r2 = s2.sql(
          """SELECT graft_json_get('{"a":{"b":7}}', 'a', 'b') AS j,
                    graft_word_match('an error here', 'error', false) AS w,
                    graft_seq_match('connect then fail', array('connect', 'fail')) AS q,
                    graft_extract_groups('u=7 d=9', 'u=(\\d+) d=(\\d+)') AS g,
                    graft_simhash64(array('a', 'b')) AS sh,
                    size(graft_minhash_sig(array('a', 'b'), 8)) AS mh,
                    graft_text_stats('hello the world').n_tokens AS tk""")
          .collect().head
        assert(r2.getString(0) == "7")
        assert(r2.getBoolean(1) && r2.getBoolean(2))
        assert(r2.getSeq[String](3) == Seq("7", "9"))
        assert(r2.getLong(4) != 0L)
        assert(r2.getInt(5) == 8)
        assert(r2.getLong(6) == 3L)
      } finally {
        // do NOT stop s2 — it shares the suite-wide SparkContext
      }
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }
}
