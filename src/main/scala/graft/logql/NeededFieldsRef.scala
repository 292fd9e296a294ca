package graft.logql

/** The reference's needed-fields back-propagation over the allow/deny
  * wildcard model — a faithful transcription of every pipe's
  * `updateNeededFields(pf *prefixfilter.Filter)` (lib/logstorage/pipe_*.go)
  * plus the filter and stats-function contributions they call into.
  *
  * The analysis runs BACKWARDS: `pf` holds the fields needed by
  * everything after the pipe; updatePipe rewrites it into the fields
  * needed before the pipe. Conformance: every expectPipeNeededFields
  * golden table (674 cases, conformance/pipe_needed_fields.txt) in
  * NeededFieldsRefConformanceSpec.
  */
object NeededFieldsRef {

  /** allowFilters of an `if (...)` condition — the reference precomputes
    * this at parse (if_filter.go:47: run the filter's updateNeededFields
    * on a fresh Filter, take GetAllowFilters). */
  def ifAllowFilters(f: Filter): Seq[String] = {
    val pf = new PrefixFilter
    updateFilter(f, pf)
    pf.getAllowFilters
  }

  /** filter.updateNeededFields (filter_*.go — each adds the fields it
    * reads). */
  def updateFilter(f: Filter, pf: PrefixFilter): Unit = f match {
    case Filter.And(fs) => fs.foreach(updateFilter(_, pf))
    case Filter.Or(fs) => fs.foreach(updateFilter(_, pf))
    case Filter.Not(x) => updateFilter(x, pf)
    case Filter.Noop => ()
    case Filter.Phrase(fld, _) => pf.addAllowFilter(fld)
    case Filter.Prefix(fld, _) => pf.addAllowFilter(fld)
    case Filter.AnyCasePhrase(fld, _) => pf.addAllowFilter(fld)
    case Filter.AnyCasePrefix(fld, _) => pf.addAllowFilter(fld)
    case Filter.Exact(fld, _) => pf.addAllowFilter(fld)
    case Filter.ExactPrefix(fld, _) => pf.addAllowFilter(fld)
    case Filter.In(fld, _) => pf.addAllowFilter(fld)
    case Filter.InQuery(fld, _) => pf.addAllowFilter(fld)
    case Filter.ContainsAll(fld, _) => pf.addAllowFilter(fld)
    case Filter.ContainsAny(fld, _) => pf.addAllowFilter(fld)
    case Filter.ContainsQuery(fld, _, _) => pf.addAllowFilter(fld)
    case Filter.Sequence(fld, _) => pf.addAllowFilter(fld)
    case Filter.Regexp(fld, _) => pf.addAllowFilter(fld)
    case r: Filter.Range => pf.addAllowFilter(r.field)
    case r: Filter.Ipv4Range => pf.addAllowFilter(r.field)
    case r: Filter.StringRange => pf.addAllowFilter(r.field)
    case r: Filter.LenRange => pf.addAllowFilter(r.field)
    case Filter.ValueType(fld, _) => pf.addAllowFilter(fld)
    case Filter.EqField(fld, other) =>
      pf.addAllowFilter(fld); pf.addAllowFilter(other)
    case Filter.LeField(fld, other) =>
      pf.addAllowFilter(fld); pf.addAllowFilter(other)
    case Filter.LtField(fld, other) =>
      pf.addAllowFilter(fld); pf.addAllowFilter(other)
    case _: Filter.TimeRange => pf.addAllowFilter("_time")
    case _: Filter.DayRange => pf.addAllowFilter("_time")
    case _: Filter.WeekRange => pf.addAllowFilter("_time")
    case _: Filter.Stream => pf.addAllowFilter("_stream")
    case _: Filter.StreamId => pf.addAllowFilter("_stream_id")
  }

  /** statsFunc.updateNeededFields (stats_*.go). */
  def updateStatsFunc(fn: StatsFunc, pf: PrefixFilter): Unit = fn match {
    case StatsFunc.Count(fields) =>
      // count(*) / count() need no columns (stats_count.go:"Special case")
      if (!PrefixFilter.matchAll(fields) && fields.nonEmpty)
        pf.addAllowFilters(fields)
    case StatsFunc.CountEmpty(fields) => pf.addAllowFilters(fields)
    case StatsFunc.CountUniq(fields, _) => pf.addAllowFilters(fields)
    case StatsFunc.CountUniqHash(fields, _) => pf.addAllowFilters(fields)
    case StatsFunc.Sum(fields) => pf.addAllowFilters(fields)
    case StatsFunc.Avg(fields) => pf.addAllowFilters(fields)
    case StatsFunc.Min(fields) => pf.addAllowFilters(fields)
    case StatsFunc.Max(fields) => pf.addAllowFilters(fields)
    case StatsFunc.Median(fields) => pf.addAllowFilters(fields)
    case StatsFunc.Quantile(_, fields) => pf.addAllowFilters(fields)
    case StatsFunc.SumLen(fields) => pf.addAllowFilters(fields)
    case StatsFunc.Values(fields, _) => pf.addAllowFilters(fields)
    case StatsFunc.UniqValues(fields, _) => pf.addAllowFilters(fields)
    case StatsFunc.JsonValues(fields, _) => pf.addAllowFilters(fields)
    case StatsFunc.RowAny(fields) => pf.addAllowFilters(fields)
    case StatsFunc.RowMax(src, fields) =>
      pf.addAllowFilters(fields); pf.addAllowFilter(src)
    case StatsFunc.RowMin(src, fields) =>
      pf.addAllowFilters(fields); pf.addAllowFilter(src)
    case StatsFunc.Rate(_) => () // row count only (stats_rate.go)
    case StatsFunc.RateSum(fields, _) => pf.addAllowFilters(fields)
    case StatsFunc.Histogram(field) => pf.addAllowFilter(field)
  }

  /** Ordered capture-group names of a Go regexp ("" = unnamed group) —
    * regexp.SubexpNames()[1:], which pipe_extract_regexp.go stores as
    * reFields. */
  def regexpCaptureNames(re: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var inClass = false
    while (i < re.length) {
      re.charAt(i) match {
        case '\\' => i += 1
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (re.startsWith("(?P<", i)) {
            val end = re.indexOf('>', i + 4)
            out += re.substring(i + 4, if (end < 0) re.length else end)
          } else if (i + 1 < re.length && re.charAt(i + 1) == '?') {
            // non-capturing (?: (?= (?i) ...
          } else out += ""
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  private def updateForUpdatePipe(pf: PrefixFilter, field: String,
                                  iff: Option[Filter]): Unit =
    // pipe_update.go:9
    iff.foreach { f =>
      if (pf.matchString(field) || pf.matchNothing)
        pf.addAllowFilters(ifAllowFilters(f))
    }

  private def updateForUnpackPipe(from: String, outFieldFilters: Seq[String],
                                  keepOriginal: Boolean, skipEmpty: Boolean,
                                  iff: Option[Filter],
                                  pf: PrefixFilter): Unit = {
    // pipe_unpack.go:10
    if (pf.matchNothing) {
      iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
      return
    }
    var needFromField = outFieldFilters.isEmpty
    if (!needFromField)
      needFromField = outFieldFilters.exists(pf.matchStringOrWildcard)
    if (!keepOriginal && !skipEmpty)
      outFieldFilters.filterNot(PrefixFilter.isWildcardFilter)
        .foreach(pf.addDenyFilter)
    if (needFromField) {
      pf.addAllowFilter(from)
      iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
    }
  }

  private def updateForPipePack(pf: PrefixFilter, resultField: String,
                                fieldFilters: Seq[String]): Unit =
    // pipe_pack.go:12
    if (pf.matchString(resultField)) {
      pf.addDenyFilter(resultField)
      if (fieldFilters.nonEmpty) pf.addAllowFilters(fieldFilters)
      else pf.addAllowFilter("*")
    }

  private def updateMathExpr(e: MathExpr, pf: PrefixFilter): Unit = e match {
    case _: MathExpr.Num => ()
    case MathExpr.FieldRef(name) => pf.addAllowFilter(name)
    case MathExpr.Bin(_, l, r) =>
      updateMathExpr(l, pf); updateMathExpr(r, pf)
    case MathExpr.Neg(x) => updateMathExpr(x, pf)
    case MathExpr.Call(_, args) => args.foreach(updateMathExpr(_, pf))
  }

  /** pipe.updateNeededFields — one case per pipe_*.go. */
  def updatePipe(p: Pipe, pf: PrefixFilter): Unit = p match {
    case Pipe.Fields(fields) =>
      // pipe_fields.go: keep only requested filters that are still needed
      val orig = pf.cloneFilter()
      pf.reset()
      fields.foreach { f =>
        if (orig.matchStringOrWildcard(f)) pf.addAllowFilter(f)
      }

    case Pipe.Delete(fields) => pf.addDenyFilters(fields) // pipe_delete.go

    case Pipe.Copy(pairs) =>
      // pipe_copy.go: reverse order
      pairs.reverse.foreach { case (src, dst) =>
        val needSrc = pf.matchStringOrWildcard(dst)
        pf.addDenyFilter(dst)
        if (needSrc) pf.addAllowFilter(src)
      }

    case Pipe.Rename(pairs) =>
      // pipe_rename.go: like copy, but the source dies either way
      pairs.reverse.foreach { case (src, dst) =>
        val needSrc = pf.matchStringOrWildcard(dst)
        pf.addDenyFilter(dst)
        if (needSrc) pf.addAllowFilter(src)
        else pf.addDenyFilter(src)
      }

    case Pipe.Where(f) => updateFilter(f, pf) // pipe_filter.go

    case _: Pipe.Limit | _: Pipe.Offset | _: Pipe.Sample => ()

    case Pipe.Sort(keys, _, _, rank, partitionBy, _) =>
      // pipe_sort.go (first/last desugar to sort in this AST too)
      if (!pf.matchNothing) {
        rank.foreach(pf.addDenyFilter)
        if (keys.isEmpty) pf.addAllowFilter("*")
        else keys.foreach(k => pf.addAllowFilter(k.field))
        pf.addAllowFilters(partitionBy)
      }

    case Pipe.Stats(by, funcs, _) =>
      // pipe_stats.go (default mode; the cluster-phase local/proxy modes
      // don't exist in this engine — Spark's exchange replaces them)
      val orig = pf.cloneFilter()
      pf.reset()
      by.foreach(bf => pf.addAllowFilter(bf.name))
      funcs.foreach { f =>
        if (orig.matchString(f.as)) {
          updateStatsFunc(f.fn, pf)
          f.iff.foreach(c => pf.addAllowFilters(ifAllowFilters(c)))
        }
      }

    case Pipe.Top(_, fields, _, _) =>
      pf.reset(); pf.addAllowFilters(fields) // pipe_top.go

    case Pipe.Uniq(fields, _, _) =>
      pf.reset(); pf.addAllowFilters(fields) // pipe_uniq.go

    case Pipe.FieldNames(_) =>
      // pipe_field_names.go (isFirstPipe=false shape; the first-pipe
      // variant resets instead — the compiler's metadata path)
      pf.addAllowFilter("*")

    case Pipe.FieldValues(field, _) =>
      pf.reset(); pf.addAllowFilter(field) // pipe_field_values.go

    case Pipe.Math(exprs) =>
      // pipe_math.go: reverse order
      exprs.reverse.foreach { case (expr, result) =>
        if (pf.matchString(result)) {
          pf.addDenyFilter(result)
          updateMathExpr(expr, pf)
        }
      }

    case Pipe.Format(parts, out, keepOriginal, skipEmpty, iff, _) =>
      // pipe_format.go
      if (pf.matchNothing) {
        iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
      } else if (pf.matchString(out)) {
        if (!keepOriginal && !skipEmpty) pf.addDenyFilter(out)
        iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
        parts.foreach {
          case Right((_, field)) if field.nonEmpty => pf.addAllowFilter(field)
          case _ => ()
        }
      }

    case Pipe.Extract(steps, from, keepOriginal, skipEmpty, iff, _) =>
      // pipe_extract.go
      if (pf.matchNothing) {
        iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
      } else {
        val orig = pf.cloneFilter()
        var needFromField = false
        steps.foreach { st =>
          st.field.filter(_.nonEmpty).foreach { fld =>
            if (orig.matchString(fld)) {
              needFromField = true
              if (!keepOriginal && !skipEmpty) pf.addDenyFilter(fld)
            }
          }
        }
        if (needFromField) {
          pf.addAllowFilter(from)
          iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
        }
      }

    case Pipe.ExtractRegexp(re, from, keepOriginal, skipEmpty, iff) =>
      // pipe_extract_regexp.go (reFields = SubexpNames)
      if (pf.matchNothing) {
        iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
      } else {
        val orig = pf.cloneFilter()
        var needFromField = false
        regexpCaptureNames(re).filter(_.nonEmpty).foreach { fld =>
          if (orig.matchString(fld)) {
            needFromField = true
            if (!keepOriginal && !skipEmpty) pf.addDenyFilter(fld)
          }
        }
        if (needFromField) {
          pf.addAllowFilter(from)
          iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
        }
      }

    case Pipe.Replace(_, _, at, _, iff) => updateForUpdatePipe(pf, at, iff)
    case Pipe.ReplaceRegexp(_, _, at, _, iff) => updateForUpdatePipe(pf, at, iff)
    case Pipe.CollapseNums(field, _, iff) => updateForUpdatePipe(pf, field, iff)

    case Pipe.Len(field, out) => // pipe_len.go
      if (pf.matchString(out)) {
        pf.addDenyFilter(out); pf.addAllowFilter(field)
      }
    case Pipe.Hash(field, out) => // pipe_hash.go
      if (pf.matchString(out)) {
        pf.addDenyFilter(out); pf.addAllowFilter(field)
      }
    case Pipe.JsonArrayLen(field, out) => // pipe_json_array_len.go
      if (pf.matchString(out)) {
        pf.addDenyFilter(out); pf.addAllowFilter(field)
      }

    case Pipe.UnpackJson(from, fieldsList, _, keepOriginal, skipEmpty, iff) =>
      updateForUnpackPipe(from, fieldsList, keepOriginal, skipEmpty, iff, pf)
    case Pipe.UnpackLogfmt(from, fieldsList, _, keepOriginal, skipEmpty, iff) =>
      updateForUnpackPipe(from, fieldsList, keepOriginal, skipEmpty, iff, pf)
    case Pipe.UnpackSyslog(from, _, _, keepOriginal, iff) =>
      updateForUnpackPipe(from, Nil, keepOriginal, skipEmpty = false, iff, pf)

    case Pipe.UnpackWords(from, out, _, _) => // pipe_unpack_words.go
      if (pf.matchString(out)) {
        pf.addDenyFilter(out); pf.addAllowFilter(from)
      }

    case Pipe.Unroll(fields, iff) => // pipe_unroll.go
      iff.foreach(f => pf.addAllowFilters(ifAllowFilters(f)))
      pf.addAllowFilters(fields)

    case Pipe.BlocksCount(_) => pf.reset() // pipe_blocks_count.go
    case Pipe.BlockStats => pf.addAllowFilter("*") // pipe_block_stats.go

    case Pipe.PackJson(out, fieldsList) =>
      updateForPipePack(pf, out, fieldsList)
    case Pipe.PackLogfmt(out, fieldsList) =>
      updateForPipePack(pf, out, fieldsList)

    case Pipe.DropEmptyFields => () // pipe_drop_empty_fields.go
    case _: Pipe.Decolorize => () // pipe_decolorize.go

    case Pipe.Join(by, _, _, _) => pf.addAllowFilters(by) // pipe_join.go

    case _: Pipe.StreamContext => // pipe_stream_context.go
      pf.addAllowFilter("_time"); pf.addAllowFilter("_stream_id")

    case _: Pipe.Union => () // pipe_union.go
    case _: Pipe.Facets => pf.addAllowFilter("*") // pipe_facets.go
  }
}
