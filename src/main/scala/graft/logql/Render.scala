package graft.logql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Reference-conformant value rendering, shared by every output surface
  * (HTTP NDJSON, CLI, format pipe): the reference's field model is
  * all-strings, floats marshal Go-style (strconv 'g': no ".0" on
  * integral values, "+Inf"/"-Inf"/"NaN" — marshalFloat64String), and
  * `_time` renders RFC3339Nano with trailing fraction zeros trimmed. */
object Render {

  /** Go strconv 'g' for a double column. Deviation (documented): very
    * large/small magnitudes keep Java's E-notation ("1.0E21") where Go
    * writes "1e+21" — reachable only through math-pipe overflow. */
  def goDouble(c: Column): Column = {
    val n = c.try_cast("long")
    when(c === Double.PositiveInfinity, lit("+Inf"))
      .when(c === Double.NegativeInfinity, lit("-Inf"))
      .when(isnan(c), lit("NaN"))
      .when(n.isNotNull && n.cast(DoubleType) === c, n.cast(StringType))
      .otherwise(c.cast(StringType))
  }

  /** RFC3339 with microsecond fraction, trailing zeros trimmed like Go's
    * RFC3339Nano ("…16.220000Z" → "…16.22Z", "…16.000000Z" → "…16Z"). */
  def rfc3339(c: Column): Column =
    regexp_replace(
      concat(date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")),
      "\\.?0+Z$", "Z")
}
