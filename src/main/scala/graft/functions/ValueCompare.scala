package graft.functions

/** The reference's value collation (lessString, pipe_sort_topk.go:707):
  * equal strings tie; both-int64 / both-uint64 / both-RFC3339-timestamp /
  * both-number compare numerically; anything else falls back to NATURAL
  * string order (digit runs compare as integers —
  * stringsutil.LessNatural). Shared by min/max/median/quantile and the
  * le_field/lt_field compare.
  */
object ValueCompare {

  def less(a: String, b: String): Boolean = {
    if (a == b) return false
    val ia = tryLong(a)
    if (ia != null) {
      val ib = tryLong(b)
      if (ib != null) return ia.longValue < ib.longValue
    }
    val ua = tryULong(a)
    if (ua != null) {
      val ub = tryULong(b)
      if (ub != null)
        return java.lang.Long.compareUnsigned(ua.longValue, ub.longValue) < 0
    }
    val ta = tryRfc3339(a)
    if (ta != null) {
      val tb = tryRfc3339(b)
      if (tb != null) return ta.longValue < tb.longValue
    }
    val fa = tryNumber(a)
    if (!fa.isNaN) {
      val fb = tryNumber(b)
      if (!fb.isNaN) return fa < fb
    }
    lessNatural(a, b)
  }

  private def tryLong(s: String): java.lang.Long = {
    if (s.isEmpty) return null
    var i = if (s.charAt(0) == '-') 1 else 0
    if (i >= s.length || s.length - i > 19) return null
    var j = i
    while (j < s.length) {
      if (s.charAt(j) < '0' || s.charAt(j) > '9') return null
      j += 1
    }
    try java.lang.Long.valueOf(s)
    catch { case _: NumberFormatException => null }
  }

  private def tryULong(s: String): java.lang.Long = {
    if (s.isEmpty || s.length > 20) return null
    var j = 0
    while (j < s.length) {
      if (s.charAt(j) < '0' || s.charAt(j) > '9') return null
      j += 1
    }
    try java.lang.Long.valueOf(java.lang.Long.parseUnsignedLong(s))
    catch { case _: NumberFormatException => null }
  }

  /** RFC3339Nano → unix nanos; null when not a timestamp. */
  def tryRfc3339(s: String): java.lang.Long = {
    if (s.length < 20 || s.charAt(4) != '-' || s.charAt(10) != 'T') return null
    try {
      val i = java.time.OffsetDateTime.parse(s).toInstant
      java.lang.Long.valueOf(i.getEpochSecond * 1000000000L + i.getNano)
    } catch { case _: Exception => null }
  }

  /** tryParseNumber: float64 / duration (nanos) / byte size / hex —
    * NaN when unparseable. */
  def tryNumber(s: String): Double = {
    if (s.isEmpty) return Double.NaN
    val t = s.trim
    if (t.isEmpty) return Double.NaN
    // every parseable form starts with a digit, sign, dot, or inf/NaN —
    // ordinary log text shorts out here instead of walking the
    // size/duration/number Option chain per comparison (the value
    // collation runs per ROW in min/max/sort over string fields)
    val c0 = t.charAt(0)
    if (!((c0 >= '0' && c0 <= '9') || c0 == '-' || c0 == '+' || c0 == '.' ||
          c0 == 'i' || c0 == 'I' || c0 == 'n' || c0 == 'N'))
      return Double.NaN
    // plain-decimal fast path: [-+]?digits[.digits][eE[-+]digits] with no
    // underscores is exactly the shape the Option chain below resolves
    // via s.toDouble — after durationNanos/sizeValue have each FULLY
    // parsed and rejected it (BigInteger-heavy; measured as the dominant
    // frames sorting a 200M-row folded numeric column, r14 soak).
    // parseDouble IS that final branch, so the value is identical.
    if (isPlainNumber(t)) return java.lang.Double.parseDouble(t)
    graft.logql.NumLit.sizeValue(t)
      .orElse(graft.logql.NumLit.durationNanos(t)
        .filter(_ => t.exists(_.isLetter)).map(_.toDouble))
      .orElse(graft.logql.NumLit.parse(t)
        .filter(_ => !t.exists(c => c.isLetter && "eExX".indexOf(c) < 0)))
      .getOrElse(Double.NaN)
  }

  /** `[-+]?d*(.d*)?([eE][-+]?d+)?` with ≥1 mantissa digit — the exact
    * set of strings Java's parseDouble and the parse chain's final
    * `s.toDouble` both accept with identical values and every earlier
    * chain stage rejects (no letters outside the exponent marker, no
    * underscores, no unit suffix). */
  private def isPlainNumber(t: String): Boolean = {
    val n = t.length
    var i = if (t.charAt(0) == '+' || t.charAt(0) == '-') 1 else 0
    var mant = 0
    while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') { mant += 1; i += 1 }
    if (i < n && t.charAt(i) == '.') {
      i += 1
      while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') { mant += 1; i += 1 }
    }
    if (mant == 0) return false
    if (i == n) return true
    val c = t.charAt(i)
    if (c != 'e' && c != 'E') return false
    i += 1
    if (i < n && (t.charAt(i) == '+' || t.charAt(i) == '-')) i += 1
    var exp = 0
    while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') { exp += 1; i += 1 }
    i == n && exp > 0
  }

  /** stringsutil.LessNatural: common prefixes skip, decimal digit runs
    * compare as integers (too-long runs fall back to string order). */
  def lessNatural(a0: String, b0: String): Boolean = {
    var a = a0
    var b = b0
    var isReverse = false
    while (true) {
      if (a.length > b.length) { val t = a; a = b; b = t; isReverse = !isReverse }
      var i = 0
      var broke = false
      while (i < a.length && !broke) {
        val cA = a.charAt(i)
        val cB = b.charAt(i)
        if (cA >= '0' && cA <= '9') {
          if (cB >= '0' && cB <= '9') broke = true
          else return !isReverse
        } else if (cB >= '0' && cB <= '9') return isReverse
        else if (cA != cB) {
          return if (isReverse) cB < cA else cA < cB
        } else i += 1
      }
      a = a.substring(i)
      b = b.substring(i)
      if (a.isEmpty) return (if (isReverse) false else b.nonEmpty)
      // collect digit prefixes and compare numerically
      var iA = 0
      var nA = 0L
      var overflowA = false
      while (iA < a.length && a.charAt(iA) >= '0' && a.charAt(iA) <= '9' && !overflowA) {
        if (nA > (Long.MaxValue - 9) / 10) overflowA = true
        else { nA = nA * 10 + (a.charAt(iA) - '0'); iA += 1 }
      }
      var iB = 0
      var nB = 0L
      var overflowB = false
      while (iB < b.length && b.charAt(iB) >= '0' && b.charAt(iB) <= '9' && !overflowB) {
        if (nB > (Long.MaxValue - 9) / 10) overflowB = true
        else { nB = nB * 10 + (b.charAt(iB) - '0'); iB += 1 }
      }
      if (overflowA || overflowB) {
        return if (isReverse) b < a else a < b
      }
      if (nA != nB) return (if (isReverse) nB < nA else nA < nB)
      a = a.substring(iA)
      b = b.substring(iB)
    }
    false
  }
}
