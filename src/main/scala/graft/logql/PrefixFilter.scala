package graft.logql

import scala.collection.mutable.ArrayBuffer

/** Port of the reference's allow/deny wildcard field-filter set
  * (lib/prefixfilter/filter.go) — the data structure its
  * updateNeededFields analysis threads backwards through every pipe to
  * decide which columns each stage must read. Filters are either full
  * field names or prefixes ending with `*`.
  *
  * The semantics that matter (all pinned by the ported filter_test.go
  * corpus in PrefixFilterConformanceSpec):
  *
  *  - `AddAllowFilter` removes the same filter from the deny list, plus
  *    any BROADER deny wildcards that shadow it;
  *  - `AddDenyFilter` is a no-op when the filter can't match anything
  *    allowed; otherwise it removes the exact filter from the allow list
  *    and registers the deny;
  *  - adding a wildcard drops weaker wildcards and covered full strings;
  *  - a deny list only exists alongside allow wildcards — with a
  *    literal-only allow list the deny list resets (normalize()).
  */
final class PrefixFilter {
  private val allow = new PrefixFilter.FilterSet
  private val deny = new PrefixFilter.FilterSet

  def reset(): Unit = { allow.reset(); deny.reset() }

  def cloneFilter(): PrefixFilter = {
    val dst = new PrefixFilter
    dst.allow.copyFrom(allow)
    dst.deny.copyFrom(deny)
    dst
  }

  /** Sorted allow filters (wildcards rendered with trailing `*`). */
  def getAllowFilters: Seq[String] = allow.getFilters
  def getDenyFilters: Seq[String] = deny.getFilters

  /** Allow strings when no allow wildcards exist (GetAllowStrings). */
  def getAllowStrings: Option[Seq[String]] =
    if (allow.wildcards.isEmpty) Some(allow.fullStrings.toSeq) else None

  def matchNothing: Boolean = allow.matchNothing
  def matchAll: Boolean = allow.matchAll && deny.matchNothing

  def matchString(s: String): Boolean =
    allow.matchString(s) && !deny.matchString(s)

  def matchStringOrWildcard(s: String): Boolean = {
    if (!PrefixFilter.isWildcardFilter(s)) return matchString(s)
    val wildcard = s.dropRight(1)
    allow.matchWildcardFilter(wildcard) && !deny.matchWildcard(wildcard)
  }

  private def normalize(): Unit =
    if (allow.wildcards.isEmpty) deny.reset()

  def addAllowFilters(filters: Seq[String]): Unit =
    filters.foreach(addAllowFilter)

  def addAllowFilter(filter: String): Unit = {
    allow.addFilter(filter)
    deny.removeFilter(filter, removeBroaderWildcards = true)
    normalize()
  }

  def addDenyFilters(filters: Seq[String]): Unit =
    filters.foreach(addDenyFilter)

  def addDenyFilter(filter: String): Unit = {
    if (!matchStringOrWildcard(filter)) return // nothing to deny
    allow.removeFilter(filter, removeBroaderWildcards = false)
    deny.addFilter(filter)
    normalize()
  }

  override def toString: String = {
    def q(a: Seq[String]) = a.map(s => "\"" + s + "\"").mkString(",")
    s"allow=[${q(getAllowFilters)}], deny=[${q(getDenyFilters)}]"
  }
}

object PrefixFilter {

  def isWildcardFilter(filter: String): Boolean = filter.endsWith("*")

  /** MatchFilter: s matches a single (possibly wildcard) filter. */
  def matchFilter(filter: String, s: String): Boolean =
    if (!isWildcardFilter(filter)) filter == s
    else s.startsWith(filter.dropRight(1))

  def matchFilters(filters: Seq[String], s: String): Boolean =
    filters.exists(matchFilter(_, s))

  def matchAll(filters: Seq[String]): Boolean = filters.contains("*")

  /** AppendReplace: rewrite s's srcFilter prefix into dstFilter. */
  def appendReplace(srcFilter: String, dstFilter: String, s: String): String = {
    if (!isWildcardFilter(srcFilter))
      return if (s == srcFilter) dstFilter else s
    val srcPrefix = srcFilter.dropRight(1)
    if (!s.startsWith(srcPrefix)) return s
    if (!isWildcardFilter(dstFilter)) return dstFilter
    dstFilter.dropRight(1) + s.substring(srcPrefix.length)
  }

  /** One direction (allow or deny) of the filter pair. */
  private[logql] final class FilterSet {
    val fullStrings = ArrayBuffer.empty[String]
    val wildcards = ArrayBuffer.empty[String] // stored WITHOUT the '*'

    def reset(): Unit = { fullStrings.clear(); wildcards.clear() }

    def copyFrom(src: FilterSet): Unit = {
      reset()
      fullStrings ++= src.fullStrings
      wildcards ++= src.wildcards
    }

    def getFilters: Seq[String] =
      (fullStrings.toSeq ++ wildcards.map(_ + "*")).sorted

    def matchAll: Boolean = wildcards.contains("")
    def matchNothing: Boolean = fullStrings.isEmpty && wildcards.isEmpty

    def addFilter(filter: String): Unit =
      if (!isWildcardFilter(filter)) addFullString(filter)
      else addWildcard(filter.dropRight(1))

    private def addWildcard(wildcard: String): Unit =
      if (!matchWildcard(wildcard)) {
        dropWildcard(wildcard)
        wildcards += wildcard
      }

    def removeFilter(filter: String, removeBroaderWildcards: Boolean): Unit = {
      if (!isWildcardFilter(filter)) removeFullString(filter)
      else dropWildcard(filter.dropRight(1))
      if (removeBroaderWildcards) {
        val s = filter.stripSuffix("*")
        val keep = wildcards.filterNot(wc => s.startsWith(wc))
        wildcards.clear(); wildcards ++= keep
      }
    }

    private def dropWildcard(wildcard: String): Unit = {
      // drop the wildcard together with weaker wildcards
      val keepW = wildcards.filterNot(_.startsWith(wildcard))
      wildcards.clear(); wildcards ++= keepW
      // drop full strings matching the wildcard
      val keepS = fullStrings.filterNot(_.startsWith(wildcard))
      fullStrings.clear(); fullStrings ++= keepS
    }

    private def addFullString(s: String): Unit =
      if (!matchString(s)) fullStrings += s

    private def removeFullString(s: String): Unit =
      if (fullStrings.contains(s)) {
        val keep = fullStrings.filterNot(_ == s)
        fullStrings.clear(); fullStrings ++= keep
      }

    def matchString(s: String): Boolean =
      if (matchNothing) false
      else matchWildcard(s) || fullStrings.contains(s)

    def matchWildcardFilter(wildcard: String): Boolean =
      wildcards.exists(wc =>
        wildcard.startsWith(wc) || wc.startsWith(wildcard)) ||
        fullStrings.exists(_.startsWith(wildcard))

    def matchWildcard(wildcard: String): Boolean =
      wildcards.exists(wc => wildcard.startsWith(wc))
  }
}
