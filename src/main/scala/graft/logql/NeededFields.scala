package graft.logql

/** Backward needed-fields analysis over a pipe chain — the Spark analogue
  * of the reference's `updateNeededFields` propagation (pipe.go:11-55;
  * consumed column set → `fieldsFilter`, storage_search.go:124-133).
  *
  * For each pipe position it computes the set of field NAMES any
  * downstream pipe may still read (`None` = statically unknown / all).
  * The compiler uses the set to bound dynamic-schema pipes: a bare
  * `unpack_json from _msg` followed by `... | stats by (k)` only needs
  * key `k`, so the full-map Jackson parse + fields-map merge collapses to
  * one per-key kernel extraction (see Compiler's UnpackJson branch).
  *
  * Every transfer function OVER-approximates (a field is only removed
  * from the needed set when the pipe unconditionally overwrites it
  * without reading its prior value); an over-approximation can cost a
  * wasted key extraction but never drops a consumed field. Wildcards and
  * whole-row consumers (`facets`, `field_names`, bare `pack_json`,
  * `row_any()` with no field list, `p*` stats args) degrade to `None`.
  */
object NeededFields {

  /** `None` = all fields may be needed. */
  type Needed = Option[Set[String]]

  /** Element i = fields needed AFTER pipe i (i.e. by pipes i+1..n and the
    * final result). The final result needs all fields unless a projection
    * pipe (stats/fields/uniq/top/...) bounds it. */
  def afterSets(pipes: Seq[Pipe]): IndexedSeq[Needed] = {
    val arr = new Array[Needed](pipes.length)
    var cur: Needed = None
    var i = pipes.length - 1
    while (i >= 0) {
      arr(i) = cur
      cur = before(pipes(i), cur)
      i -= 1
    }
    arr.toIndexedSeq
  }

  private def isWild(f: String): Boolean = f.contains("*")

  private def plus(a: Needed, fs: Iterable[String]): Needed =
    a.map(_ ++ fs)

  private def iffFields(iff: Option[Filter]): Set[String] =
    iff.map(filterFields).getOrElse(Set.empty)

  /** Fields a filter expression reads. Time filters touch whichever of
    * `_time`/`ts` the relation carries; both names are listed (extra
    * names are harmless — the set bounds key extraction, nothing else). */
  def filterFields(f: Filter): Set[String] = f match {
    case Filter.And(fs) => fs.flatMap(filterFields).toSet
    case Filter.Or(fs) => fs.flatMap(filterFields).toSet
    case Filter.Not(x) => filterFields(x)
    case Filter.Noop => Set.empty
    case Filter.Phrase(fd, _) => Set(fd)
    case Filter.Prefix(fd, _) => Set(fd)
    case Filter.AnyCasePhrase(fd, _) => Set(fd)
    case Filter.AnyCasePrefix(fd, _) => Set(fd)
    case Filter.Exact(fd, _) => Set(fd)
    case Filter.ExactPrefix(fd, _) => Set(fd)
    case Filter.In(fd, _) => Set(fd)
    case Filter.InQuery(fd, _) => Set(fd)
    case Filter.ContainsAll(fd, _) => Set(fd)
    case Filter.ContainsAny(fd, _) => Set(fd)
    case Filter.ContainsQuery(fd, _, _) => Set(fd)
    case Filter.Sequence(fd, _) => Set(fd)
    case Filter.Regexp(fd, _) => Set(fd)
    case Filter.Range(fd, _, _, _, _, _) => Set(fd)
    case Filter.Ipv4Range(fd, _, _) => Set(fd)
    case Filter.StringRange(fd, _, _, _) => Set(fd)
    case Filter.LenRange(fd, _, _, _) => Set(fd)
    case Filter.ValueType(fd, _) => Set(fd)
    case Filter.EqField(a, b) => Set(a, b)
    case Filter.LeField(a, b) => Set(a, b)
    case Filter.LtField(a, b) => Set(a, b)
    case _: Filter.TimeRange => Set("_time", "ts")
    case _: Filter.DayRange => Set("_time", "ts")
    case _: Filter.WeekRange => Set("_time", "ts")
    case Filter.Stream(gs) => gs.flatten.map(_.label).toSet + "_stream"
    case Filter.StreamId(_) => Set("_stream_id", "_stream")
  }

  private def mathRefs(e: MathExpr): Set[String] = e match {
    case _: MathExpr.Num => Set.empty
    case MathExpr.FieldRef(n) => Set(n)
    case MathExpr.Bin(_, l, r) => mathRefs(l) ++ mathRefs(r)
    case MathExpr.Neg(x) => mathRefs(x)
    case MathExpr.Call(_, args) => args.flatMap(mathRefs).toSet
  }

  /** Fields a stats function reads; None for wildcard args and the
    * whole-row collectors with an empty field-filter list. */
  private def statsFuncNeeded(fa: StatsFuncAs): Needed = {
    def fromList(fs: Seq[String]): Needed =
      if (fs.exists(isWild)) None else Some(fs.toSet)
    val base: Needed = fa.fn match {
      case StatsFunc.Count(fs) => fromList(fs)
      case StatsFunc.CountEmpty(fs) => fromList(fs)
      case StatsFunc.CountUniq(fs, _) => fromList(fs)
      case StatsFunc.CountUniqHash(fs, _) => fromList(fs)
      case StatsFunc.Sum(fs) => fromList(fs)
      case StatsFunc.Avg(fs) => fromList(fs)
      case StatsFunc.Min(fs) => fromList(fs)
      case StatsFunc.Max(fs) => fromList(fs)
      case StatsFunc.Median(fs) => fromList(fs)
      case StatsFunc.Quantile(_, fs) => fromList(fs)
      case StatsFunc.SumLen(fs) => fromList(fs)
      case StatsFunc.Values(fs, _) => fromList(fs)
      case StatsFunc.UniqValues(fs, _) => fromList(fs)
      case StatsFunc.JsonValues(fs, _) => fromList(fs)
      case StatsFunc.RowAny(fs) =>
        if (fs.isEmpty) None else fromList(fs) // empty list = whole row
      case StatsFunc.RowMax(fd, fs) =>
        if (fs.isEmpty) None else fromList(fd +: fs)
      case StatsFunc.RowMin(fd, fs) =>
        if (fs.isEmpty) None else fromList(fd +: fs)
      case StatsFunc.Rate(_) => Some(Set("_time", "ts"))
      case StatsFunc.RateSum(fs, _) => fromList(fs).map(_ ++ Set("_time", "ts"))
      case StatsFunc.Histogram(fd) => Some(Set(fd))
    }
    base.map(_ ++ iffFields(fa.iff))
  }

  /** Needed set BEFORE pipe `p`, given needed set `a` after it. */
  private def before(p: Pipe, a: Needed): Needed = p match {
    case Pipe.Fields(fs) =>
      if (fs.exists(isWild)) None
      else Some(a.map(_.intersect(fs.toSet)).getOrElse(fs.toSet))
    case Pipe.Delete(fs) =>
      a.map(_ -- fs.filterNot(isWild))
    case Pipe.Copy(pairs) => plus(a, pairs.map(_._1))
    case Pipe.Rename(pairs) => plus(a, pairs.map(_._1))
    case Pipe.Where(f) => plus(a, filterFields(f))
    case Pipe.Limit(_) | Pipe.Offset(_) => a
    // sample hashes EVERY column of the row: which rows survive depends on
    // the full row representation, so nothing upstream may be pruned
    case Pipe.Sample(_) => None
    case s: Pipe.Sort =>
      plus(a, s.keys.map(_.field) ++ s.partitionBy)
    case Pipe.Stats(by, funcs, _) =>
      val byNeeded: Seq[Needed] = by.map { b =>
        if (isWild(b.name)) None
        else if (b.name == "_time") Some(Set("_time", "ts"))
        else Some(Set(b.name))
      }
      val parts = byNeeded ++ funcs.map(statsFuncNeeded)
      if (parts.exists(_.isEmpty)) None
      else Some(parts.flatMap(_.get).toSet)
    case Pipe.Top(_, fs, _, _) =>
      if (fs.isEmpty || fs.exists(isWild)) None else Some(fs.toSet)
    case Pipe.Uniq(fs, _, _) =>
      if (fs.isEmpty || fs.exists(isWild)) None else Some(fs.toSet)
    case Pipe.FieldNames(_) => None
    case Pipe.FieldValues(fd, _) => Some(Set(fd))
    case Pipe.Math(exprs) => plus(a, exprs.flatMap(e => mathRefs(e._1)))
    case Pipe.Format(parts, out, keepOrig, skipEmpty, iff, _) =>
      val reads = parts.collect { case Right((_, fd)) => fd }.toSet
      // without `if`/keep/skip, `out` is overwritten unconditionally and
      // its prior value is never read — the one subtraction that buys
      // precision for the unpack→format→stats chain. keep_original_fields
      // and skip_empty_results READ the prior value (pipe_format.go:70).
      a.map(s => (if (iff.isEmpty && !keepOrig && !skipEmpty) s - out else s)
        ++ reads ++ iffFields(iff))
    case Pipe.Extract(_, from, _, _, iff, _) => plus(a, Set(from) ++ iffFields(iff))
    case Pipe.ExtractRegexp(_, from, _, _, iff) => plus(a, Set(from) ++ iffFields(iff))
    case Pipe.Replace(_, _, at, _, iff) => plus(a, Set(at) ++ iffFields(iff))
    case Pipe.ReplaceRegexp(_, _, at, _, iff) => plus(a, Set(at) ++ iffFields(iff))
    case Pipe.Len(fd, out) => a.map(s => (s - out) + fd)
    case Pipe.Hash(fd, out) => a.map(s => (s - out) + fd)
    case Pipe.JsonArrayLen(fd, out) => a.map(s => (s - out) + fd)
    case Pipe.UnpackJson(from, _, _, _, _, iff) =>
      plus(a, Set(from) ++ iffFields(iff))
    case Pipe.UnpackLogfmt(from, _, _, _, _, iff) =>
      plus(a, Set(from) ++ iffFields(iff))
    case Pipe.UnpackSyslog(from, _, _, _, iff) =>
      plus(a, Set(from) ++ iffFields(iff))
    case Pipe.UnpackWords(from, out, _, _) => a.map(s => (s - out) + from)
    case Pipe.Unroll(fs, iff) => plus(a, fs.toSet ++ iffFields(iff))
    case Pipe.BlocksCount(_) => Some(Set.empty)
    case Pipe.BlockStats => Some(Set.empty)
    case Pipe.PackJson(out, fs) =>
      if (fs.isEmpty) None else a.map(s => (s - out) ++ fs)
    case Pipe.PackLogfmt(out, fs) =>
      if (fs.isEmpty) None else a.map(s => (s - out) ++ fs)
    // drop_empty_fields removes empty MAP entries but leaves promoted
    // columns alone: whether a value is map- or column-resident is
    // observable through it (pack_json omits an absent key but keeps an
    // empty column), so upstream unpacks must not be re-homed
    case Pipe.DropEmptyFields => None
    case Pipe.Decolorize(fd) => plus(a, Set(fd))
    case Pipe.CollapseNums(fd, _, iff) => plus(a, Set(fd) ++ iffFields(iff))
    case j: Pipe.Join => plus(a, j.by)
    case Pipe.StreamContext(_, _, _) => None // emits whole context rows
    case Pipe.Union(_) => a // sub-query side analyzed in its own run()
    case _: Pipe.Facets => None
  }
}
