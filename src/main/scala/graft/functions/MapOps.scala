package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Duplicate-key-safe map construction.
  *
  * Spark's map-building expressions (map_from_entries, map_concat, and
  * any map REBUILD like map_filter over a from_json result that kept
  * duplicate JSON keys) throw DUPLICATED_MAP_KEY under the default
  * dedup policy — which turns a client-controlled payload
  * (`{"a":1,"a":2}` jsonline, repeated OTLP attribute keys, a ddtags
  * tag shadowing `hostname`) into a failed ingest batch or query.
  * These helpers make the precedence DEFINED instead:
  *
  *  - [[dedupKeysFirst]]/[[entriesFirstWins]]: FIRST occurrence wins —
  *    matching `element_at` over the raw duplicated map and the JsonGet
  *    kernel's first-non-null rule (query-side JSON parsing).
  *  - [[entriesLastWins]]: LAST occurrence wins — the `map_concat`
  *    LAST_WIN convention for layered sources (resource attrs < record
  *    attrs < severity; base fields < ddtags; repeated journald FIELD=
  *    lines), implemented by dropping an entry when a later one carries
  *    the same key, so entry ORDER is preserved for duplicate-free input.
  *
  * One [[EntriesDedupExpr]] kernel pass per row — O(k) in the entry
  * count, safe for wide client documents (hundreds of keys).
  */
object MapOps {

  // both map through the EntriesDedupExpr kernel: one LinkedHashMap pass
  // per row instead of the O(k²) interpreted filter/exists tower this
  // started as (ingest CPU went quadratic in the entry count on wide
  // client documents), and positional struct access instead of field
  // names (repacking entries through struct(...as(...)) inside a lambda
  // loses the aliases under nested-lambda re-resolution)

  private def dedup(entries: Column, lastWins: Boolean): Column = {
    GraftFunctions.ensure()
    call_function("graft_entries_dedup", entries, lit(lastWins))
  }

  /** Entry array → map, first occurrence of each key wins. */
  def entriesFirstWins(entries: Column): Column = dedup(entries, lastWins = false)

  /** Entry array → map, last occurrence of each key wins; order of the
    * surviving entries is their original position. */
  def entriesLastWins(entries: Column): Column = dedup(entries, lastWins = true)

  /** Map (possibly carrying duplicate keys, e.g. straight out of
    * from_json) → map with unique keys, first wins. Null propagates. */
  def dedupKeysFirst(m: Column): Column = entriesFirstWins(map_entries(m))

  /** Concatenate maps with defined LAST_WIN precedence (later arguments
    * override earlier ones); null inputs contribute nothing. */
  def concatLastWins(ms: Column*): Column =
    entriesLastWins(concat(ms.map(m => coalesce(map_entries(m),
      array().cast("array<struct<key:string,value:string>>"))): _*))

  /** Typed empty string map. */
  def emptyStringMap: Column = map().cast(MapType(StringType, StringType))
}
