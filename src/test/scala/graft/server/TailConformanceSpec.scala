package graft.server

import graft.logql.Parser
import org.scalatest.funsuite.AnyFunSuite

/** Live-tail conformance (reference app/vlselect/logsql/logsql.go:497-689):
  *
  *   1. the CanLiveTail gate, against the reference's own golden table
  *      (lib/logstorage/parser_test.go TestQueryCanLiveTail, extracted by
  *      tools/extract_tail_corpus.py);
  *   2. the tailProcessor dedup/refresh semantics, differentially against
  *      a literal transcription of the Go algorithm (getTailRows,
  *      logsql.go:658-689) on pinned and randomized poll sequences.
  */
class TailConformanceSpec extends AnyFunSuite {
  private val NOW = 1700000000000000000L

  test("every CanLiveTail golden matches") {
    val in = getClass.getResourceAsStream("/conformance/can_live_tail.txt")
    require(in != null, "missing can_live_tail.txt")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val bad = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(_.startsWith("#")).flatMap { l =>
        val n = mapper.readTree(l)
        val qs = n.get("q").asText
        val want = n.get("ok").asBoolean
        try {
          val q = Parser.parse(qs, NOW)
          val got = q.pipes.forall(QueryServer.canLiveTail)
          if (got == want) None else Some(s"<<$qs>> got $got want $want")
        } catch {
          case e: Exception => Some(s"<<$qs>> failed to parse: ${e.getMessage}")
        }
      }.toList
    assert(bad.isEmpty, s"\n${bad.size} CanLiveTail mismatches:\n" + bad.mkString("\n"))
  }

  /** Literal transcription of the reference's tailProcessor used as the
    * oracle: writeBlock appends rows per stream in arrival order
    * (logsql.go:620-656); getTailRows stable-sorts each stream by
    * timestamp, skips the prefix at-or-before the stream's last delivered
    * timestamp, advances the watermark to the last emitted row, then
    * stable-sorts the combined result (logsql.go:658-689). Streams are
    * visited in REVERSE id order here — Go iterates its map randomly, so
    * any visit order must yield the same delivery wherever the reference
    * pins one; disagreeing with TailState's sorted order proves the
    * comparison exercises that. */
  private final class GoTailOracle {
    private val lastTimestamps = scala.collection.mutable.Map.empty[String, Long]
    def poll(rows: Seq[(String, Long, String)]): Seq[(String, Long, String)] = {
      val perStream =
        scala.collection.mutable.Map.empty[String, Vector[(String, Long, String)]]
      rows.foreach { r =>
        perStream(r._1) = perStream.getOrElse(r._1, Vector.empty) :+ r
      }
      var result = Vector.empty[(String, Long, String)]
      perStream.toSeq.sortBy(_._1).reverse.foreach { case (sid, rs0) =>
        var rs = rs0.sortBy(_._2) // sort.SliceStable by timestamp
        lastTimestamps.get(sid).foreach { last =>
          while (rs.nonEmpty && rs.head._2 <= last) rs = rs.tail
        }
        if (rs.nonEmpty) {
          result = result ++ rs
          lastTimestamps(sid) = rs.last._2
        }
      }
      result.sortBy(_._2) // final sortLogRows (stable)
    }
  }

  test("pinned tail semantics: overlap dedup, watermark skip, per-stream independence") {
    val st = new TailState
    def adv(rows: (String, Long, String)*): Seq[String] =
      st.advance(rows.toSeq).map(_._3)
    // first poll delivers everything, sorted by ts
    assert(adv(("a", 3, "a3"), ("a", 1, "a1"), ("a", 2, "a2")) ==
      Seq("a1", "a2", "a3"))
    // overlapping re-poll: rows at or below the watermark skip; new row lands
    assert(adv(("a", 2, "a2"), ("a", 3, "a3"), ("a", 4, "a4")) == Seq("a4"))
    // a NEW row written later at exactly the watermark is dropped too —
    // the reference skips by timestamp, not content (logsql.go:668-671)
    assert(adv(("a", 4, "a4-late-sibling")) == Seq.empty)
    // per-stream independence: stream b starts fresh behind a's watermark
    assert(adv(("b", 1, "b1"), ("a", 5, "a5")) == Seq("b1", "a5"))
    // in-stream ties deliver in arrival order (stable sort)…
    assert(adv(("b", 7, "b7x"), ("b", 7, "b7y")) == Seq("b7x", "b7y"))
    // …and advance the watermark past the tie
    assert(adv(("b", 7, "b7z"), ("b", 8, "b8")) == Seq("b8"))
  }

  test("randomized poll sequences match the Go transcription exactly") {
    val rnd = new scala.util.Random(7411)
    val streams = Vector("", "s1", "s2", "s3")
    val st = new TailState
    val oracle = new GoTailOracle
    var clock = 0L
    var k = 0
    for (round <- 0 until 200) {
      // sliding window with overlap: timestamps straddle the advancing
      // clock, so polls re-deliver boundary rows, tie within and across
      // streams, and occasionally arrive out of order — the shapes the
      // 5s-overlap poll loop produces
      clock += rnd.nextInt(3)
      val rows = Vector.fill(rnd.nextInt(8)) {
        val sid = streams(rnd.nextInt(streams.size))
        val ts = math.max(0L, clock + rnd.nextInt(7) - 3)
        k += 1
        (sid, ts, s"$sid@$ts#$k")
      }
      val got = st.advance(rows)
      val want = oracle.poll(rows)
      // per-stream delivery must agree EXACTLY (the reference pins it)
      for (s <- streams)
        assert(got.filter(_._1 == s) == want.filter(_._1 == s),
          s"round $round stream '$s' rows=$rows")
      // same delivered multiset, both timestamp-sorted
      assert(got.sortBy(r => (r._2, r._1, r._3)) ==
        want.sortBy(r => (r._2, r._1, r._3)), s"round $round rows=$rows")
      assert(got.map(_._2) == got.map(_._2).sorted)
      assert(want.map(_._2) == want.map(_._2).sorted)
      // with no cross-stream timestamp ties the full order is pinned —
      // TailState (ascending stream visit) and the oracle (descending)
      // must then agree outright
      val crossTie = got.groupBy(_._2)
        .exists { case (_, g) => g.map(_._1).distinct.size > 1 }
      if (!crossTie) assert(got == want, s"round $round rows=$rows")
    }
  }
}
