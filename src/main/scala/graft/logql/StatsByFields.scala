package graft.logql

/** Query.GetStatsByFields / GetStatsByFieldsAddGroupingByTime (reference
  * lib/logstorage/parser.go:741-897) — the contract behind
  * `/select/logsql/stats_query` and `stats_query_range`:
  *
  *   - find the LAST `stats` pipe; its `by(...)` names are the series
  *     labels, its function result names the metrics;
  *   - pipes after it may only shape fields in chartable ways: filter /
  *     sort / first / last pass through; math adds metrics; fields(keep)
  *     must retain every label; delete must not drop a label; copy adds
  *     renamed labels / metrics; rename moves them; format adds a label;
  *     anything else is an error — as is ending up with zero metrics or
  *     overriding a label;
  *   - with step > 0 the query is ALSO rewritten (AddGroupingByTime):
  *     `_time:<step-ns>` joins every stats pipe's by list (replacing an
  *     existing `_time` bucket), rate()/rate_sum() divide by the step
  *     (initRateFuncs, pipe_stats.go:298), and limited sort/first/last
  *     pipes gain `partition by (_time)` so per-step ranking stays
  *     per-step (addPartitionByTime, pipe_sort.go:131).
  *
  * Conformance: the reference's four TestQueryGetStatsByFields* golden
  * tables (parser_test.go:3001-3238), extracted by
  * tools/extract_stats_by_fields_corpus.py.
  */
object StatsByFields {

  /** (labels, metrics) of the last stats pipe as seen through the
    * trailing pipes, or the reference's error condition. */
  def get(q: Query): Either[String, (Seq[String], Seq[String])] =
    addGroupingByTime(q, 0L).map { case (_, by, ms) => (by, ms) }

  private final case class Bad(msg: String) extends RuntimeException(msg)

  /** prefixfilter.MatchFilter: trailing `*` is a prefix wildcard. */
  private def matches(filter: String, f: String): Boolean =
    if (filter.endsWith("*")) f.startsWith(filter.dropRight(1)) else f == filter

  /** prefixfilter.AppendReplace: rewrite `f` from the src filter's shape
    * into the dst filter's. */
  private def replaced(src: String, dst: String, f: String): String =
    (src.endsWith("*"), dst.endsWith("*")) match {
      case (true, true) => dst.dropRight(1) + f.stripPrefix(src.dropRight(1))
      case (false, true) => dst.dropRight(1)
      case _ => dst
    }

  def addGroupingByTime(q: Query, stepNs: Long)
      : Either[String, (Query, Seq[String], Seq[String])] = {
    import Pipe._
    val idx = q.pipes.lastIndexWhere(_.isInstanceOf[Stats])
    if (idx < 0)
      return Left("missing `| stats ...` pipe in the query")

    val pipes2: Seq[Pipe] =
      if (stepNs <= 0) q.pipes
      else q.pipes.map {
        case st: Stats =>
          val stepStr = stepNs.toString
          val byTime = ByField("_time", Some(stepStr), None)
          val replacedBy = st.by.map(b => if (b.name == "_time") byTime else b)
          val by2 =
            if (st.by.exists(_.name == "_time")) replacedBy
            else replacedBy :+ byTime
          st.copy(by = by2, funcs = st.funcs.map { fa =>
            fa.fn match {
              case StatsFunc.Rate(_) =>
                fa.copy(fn = StatsFunc.Rate(Some(stepNs / 1e9)))
              case StatsFunc.RateSum(fs, _) =>
                fa.copy(fn = StatsFunc.RateSum(fs, Some(stepNs / 1e9)))
              case _ => fa
            }
          })
        case s: Sort if s.limit.exists(_ > 0) && !s.partitionBy.contains("_time") =>
          s.copy(partitionBy = s.partitionBy :+ "_time")
        case p => p
      }

    val st = pipes2(idx).asInstanceOf[Stats]
    var by: Vector[String] = st.by.map(_.name).toVector
    val metrics = scala.collection.mutable.LinkedHashSet.empty[String]

    try {
      for (f <- st.funcs) {
        if (by.contains(f.as))
          throw Bad(s"the '${f.as}' field cannot be overridden at the stats pipe")
        metrics += f.as
      }

      for (p <- pipes2.drop(idx + 1)) p match {
        case _: Where => () // filter: field set unchanged
        case _: Sort => () // sort/first/last: field set unchanged
        case Math(es) =>
          // math adds metrics; results must not override labels
          for ((_, out) <- es) {
            if (by.contains(out))
              throw Bad(s"the '$out' field cannot be overridden at the math pipe")
            metrics += out
          }
        case Fields(fs) =>
          // keep must retain every label; metrics outside it drop
          for (f <- by)
            if (!fs.exists(matches(_, f)))
              throw Bad(s"missing '$f' field at the fields pipe")
          for (m <- metrics.toSeq)
            if (!fs.exists(matches(_, m))) metrics -= m
        case Delete(fs) =>
          for (f <- by)
            if (fs.exists(matches(_, f)))
              throw Bad(s"the '$f' field cannot be deleted")
          for (m <- metrics.toSeq)
            if (fs.exists(matches(_, m))) metrics -= m
        case Copy(pairs) =>
          for ((src, dst) <- pairs) {
            for (f <- by) { // snapshot: appends visible to the NEXT pair
              if (matches(dst, f))
                throw Bad(s"the '$f' field cannot be overridden by copy")
              if (matches(src, f)) {
                val d = replaced(src, dst, f)
                if (by.contains(d))
                  throw Bad(s"the '$d' field cannot be overridden by copy")
                by = by :+ d
              }
            }
            for (m <- metrics.toSeq) {
              if (matches(dst, m)) metrics -= m
              if (matches(src, m)) metrics += replaced(src, dst, m)
            }
          }
        case Rename(pairs) =>
          for ((src, dst) <- pairs) {
            val snapshot = by
            for ((f, j) <- snapshot.zipWithIndex) {
              if (matches(dst, f))
                throw Bad(s"the '$f' field cannot be overridden by rename")
              if (matches(src, f)) {
                val d = replaced(src, dst, f)
                if (by.contains(d))
                  throw Bad(s"the '$d' field cannot be overridden by rename")
                by = by.updated(j, d)
              }
            }
            for (m <- metrics.toSeq) {
              if (matches(dst, m)) metrics -= m
              if (matches(src, m)) { metrics -= m; metrics += replaced(src, dst, m) }
            }
          }
        case f: Format =>
          // a format result is one more label
          if (by.contains(f.out))
            throw Bad(s"the '${f.out}' field cannot be overridden by format")
          by = by :+ f.out
          metrics -= f.out
        case other =>
          throw Bad(s"the '${Canon.pipe(other)}' pipe cannot be put after the stats pipe")
      }

      if (metrics.isEmpty)
        throw Bad("missing metric fields in the results of the query")

      Right((q.copy(pipes = pipes2), by, metrics.toSeq))
    } catch { case Bad(msg) => Left(msg) }
  }
}
