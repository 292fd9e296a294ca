package graft.logql

/** Post-parse query normalization — the reference's `Query.optimize()`
  * (parser.go:600-641), applied to the query and every subquery by
  * ParseQuery. These rewrites are semantic no-ops that shrink the plan
  * (adjacent pipe merges) and normalize the filter tree; the canonical
  * rendering (Canon) is defined over the OPTIMIZED form, which is what
  * the reference's Query.String() prints.
  */
object Optimize {

  def apply(q: Query): Query =
    Query.transformWithSubqueries(q)(one)

  private def one(q0: Query): Query = {
    var pipes: List[Pipe] = q0.pipes.toList
    pipes = mergeSortOffset(pipes)
    pipes = mergeSortLimit(pipes)
    pipes = mergeUniqLimit(pipes)
    pipes = mergeFilterPipes(pipes)
    var f = q0.filter
    // merge a leading `| filter ...` into the query filter
    pipes match {
      case Pipe.Where(pf) :: rest => f = mergeAnd(f, pf); pipes = rest
      case _ =>
    }
    f = flattenAnd(f)
    f = flattenOr(f)
    f = removeStars(f)
    f = mergeStreams(f)
    q0.copy(filter = f, pipes = pipes)
  }

  // --------------------------------------------------------- pipe merges

  private def mergeSortOffset(pipes: List[Pipe]): List[Pipe] = pipes match {
    case (s: Pipe.Sort) :: Pipe.Offset(n) :: rest =>
      val s2 = if (s.offset == 0 && s.limit.isEmpty) s.copy(offset = n) else s
      mergeSortOffset(s2 :: rest)
    case p :: rest => p :: mergeSortOffset(rest)
    case Nil => Nil
  }

  private def mergeSortLimit(pipes: List[Pipe]): List[Pipe] = pipes match {
    case (s: Pipe.Sort) :: Pipe.Limit(n) :: rest =>
      val s2 =
        if (s.limit.forall(n < _)) s.copy(limit = Some(n)) else s
      mergeSortLimit(s2 :: rest)
    case p :: rest => p :: mergeSortLimit(rest)
    case Nil => Nil
  }

  private def mergeUniqLimit(pipes: List[Pipe]): List[Pipe] = pipes match {
    case (u: Pipe.Uniq) :: Pipe.Limit(n) :: rest =>
      val u2 = if (u.limit.forall(n < _)) u.copy(limit = Some(n)) else u
      mergeUniqLimit(u2 :: rest)
    case p :: rest => p :: mergeUniqLimit(rest)
    case Nil => Nil
  }

  private def mergeFilterPipes(pipes: List[Pipe]): List[Pipe] = pipes match {
    case Pipe.Where(a) :: Pipe.Where(b) :: rest =>
      mergeFilterPipes(Pipe.Where(mergeAnd(a, b)) :: rest)
    case p :: rest => p :: mergeFilterPipes(rest)
    case Nil => Nil
  }

  /** mergeFiltersAnd (parser.go): append into an existing AND. */
  def mergeAnd(f1: Filter, f2: Filter): Filter = (f1, f2) match {
    case (Filter.And(a), _) => Filter.And(a :+ f2)
    case (_, Filter.And(b)) => Filter.And(f1 +: b)
    case _ => Filter.And(Seq(f1, f2))
  }

  // -------------------------------------------------- filter normalizing

  /** Bottom-up structural rewrite over the filter tree (subquery filters
    * are NOT entered here — optimize() visits each subquery itself). */
  private def rewrite(f: Filter)(pf: PartialFunction[Filter, Filter]): Filter = {
    val f2 = f match {
      case Filter.And(fs) => Filter.And(fs.map(rewrite(_)(pf)))
      case Filter.Or(fs) => Filter.Or(fs.map(rewrite(_)(pf)))
      case Filter.Not(x) => Filter.Not(rewrite(x)(pf))
      case other => other
    }
    pf.applyOrElse(f2, identity[Filter])
  }

  private def flattenAnd(f: Filter): Filter = rewrite(f) {
    case Filter.And(fs) if fs.exists(_.isInstanceOf[Filter.And]) =>
      Filter.And(fs.flatMap {
        case Filter.And(inner) => inner
        case other => Seq(other)
      })
  }

  private def flattenOr(f: Filter): Filter = rewrite(f) {
    case Filter.Or(fs) if fs.exists(_.isInstanceOf[Filter.Or]) =>
      Filter.Or(fs.flatMap {
        case Filter.Or(inner) => inner
        case other => Seq(other)
      })
  }

  /** removeStarFilters (parser.go): `*` prefixes become noop, an OR with
    * a noop arm is noop, noops inside AND are dropped. */
  private def removeStars(f: Filter): Filter = {
    val f1 = rewrite(f) {
      case Filter.Prefix(fd, "") if fd.isEmpty || fd == "_msg" => Filter.Noop
    }
    val f2 = rewrite(f1) {
      case Filter.Or(fs) if fs.contains(Filter.Noop) => Filter.Noop
    }
    rewrite(f2) {
      case Filter.And(fs) if fs.contains(Filter.Noop) =>
        fs.filterNot(_ == Filter.Noop) match {
          case Seq() => Filter.Noop
          case Seq(single) => single
          case kept => Filter.And(kept)
        }
    }
  }

  /** mergeFiltersStream (parser.go:679): single-group `{...}` filters in
    * a top-level AND merge into one and move to the FRONT (stream
    * selection prunes storage first). */
  private def mergeStreams(f: Filter): Filter = f match {
    case Filter.And(fs) =>
      val (streams, others) = fs.partition(_.isInstanceOf[Filter.Stream])
      if (streams.isEmpty) f
      else {
        val ss = streams.map(_.asInstanceOf[Filter.Stream])
        val merged: Seq[Filter] =
          if (ss.size >= 2 && ss.forall(_.orGroups.size == 1))
            Seq(Filter.Stream(Seq(ss.flatMap(_.orGroups.head))))
          else ss
        (merged ++ others) match {
          case Seq(single) => single
          case all => Filter.And(all)
        }
      }
    case other => other
  }
}
