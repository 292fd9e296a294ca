package graft.logql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-conformant value rendering, shared by every output surface
  * (HTTP NDJSON, CLI, format pipe): the reference's field model is
  * all-strings, floats marshal Go-style (strconv.AppendFloat 'f'
  * precision -1 — marshalFloat64String, values_encoder.go:1404: fixed
  * notation always, shortest round-trip digits, "+Inf"/"-Inf"/"NaN"),
  * and `_time` renders RFC3339Nano with trailing fraction zeros
  * trimmed. */
object Render {

  /** Go strconv 'f'/-1 for a double or float column — the exact
    * [[graft.functions.GoFloat]] kernel ("5" not "5.0", "0.0000001" not
    * "1.0E-7", "1000000000000000000000" not "1.0E21"). */
  def goDouble(c: Column): Column = graft.functions.GoFloat.render(c)

  /** RFC3339 with microsecond fraction, trailing zeros trimmed like Go's
    * RFC3339Nano ("…16.220000Z" → "…16.22Z", "…16.000000Z" → "…16Z"). */
  def rfc3339(c: Column): Column =
    regexp_replace(
      concat(date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")),
      "\\.?0+Z$", "Z")
}
