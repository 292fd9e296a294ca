package graft.store

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-time value-type metadata — the Spark analogue of the reference's
  * per-block `columnHeader.valueType` (values_encoder.go:19-59, decided by
  * `encode()` while blocks are written; filter_value_type.go:67 reads it
  * back at query time).
  *
  * Granularity: one verdict per string field per (tenant, _day) part.
  * Bulk loads ([[LogStore.ingest]]) classify each part exactly (one
  * groupBy over the batch being written). Streaming appends stay OFF the
  * hot path: they only INVALIDATE the parts they touch (the part list
  * rides the existing write-pass observe() — measured: classifying in
  * the flush itself cost ~35% of ingest throughput), and background
  * compaction re-classifies each part it rewrites EXACTLY (whole-part
  * verdict on data it is already reading) — the analogue of the
  * reference deciding types as its merges write blocks (datadb.go
  * background merges). Verdicts live in `<dir>/logs/_value_types.json`.
  *
  * Query side: `value_type()` over a store-backed relation answers from
  * the sidecar — constant when every part agrees, a partition-prunable
  * (tenant, _day) predicate when they disagree — and only falls back to
  * data-driven classification (one bounded aggregate, memoized) for
  * fields or relations the engine didn't write. Documented deviation from
  * the reference: block → part granularity (SURVEY §8).
  */
object ValueTypeMeta {

  // ---------------------------------------------------------------------
  // classification — the encode() chain (values_encoder.go:106-150):
  // const, dict (<=8 distinct, <=256 total bytes), uint8/16/32/64, int64,
  // float64, ipv4, iso8601, string. One aggregate struct per field; all
  // fields classify in a single pass.
  // ---------------------------------------------------------------------

  private def allMatch(c: Column): Column =
    coalesce(min(c.cast(IntegerType)), lit(0)) === 1

  /** Pre-projected classification: evaluate the parse-chain meta struct
    * (GoValues.metaCol) ONCE per (field, row) in a codegen'd projection
    * below the aggregate. The typed-imperative cappedSet forces
    * ObjectHashAggregate, which is outside whole-stage codegen and
    * evaluates every aggregate function's input separately and
    * interpreted — with metaCol inlined into each aggregate input, the
    * full uint/int/float/ipv4/iso parse chain ran ~7× per field per row
    * (measured: 4s classification vs 0.65s rewrite on a 167k-row
    * partition at compaction). After the projection the aggregate
    * inputs are plain struct-field reads. */
  private def addMetaCols(df: DataFrame,
                          fields: Seq[(String, Column)]): DataFrame =
    fields.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(s"__vtv_$n", c)
        .withColumn(s"__vtm_$n",
          graft.functions.GoValues.metaCol(col(s"__vtv_$n")))
    }

  /** Aggregate struct classifying one pre-projected field (bounded
    * state: the distinct sample caps at 9 values). Parse families come
    * from the exact values_encoder.go ports (functions/GoValues.scala) —
    * underscore digit groups, no leading zeros, exponent-free floats,
    * lenient date-uint octets — so part verdicts match the reference's
    * per-block decisions. */
  private def classifyAggPre(n: String): Column = {
    val m = col(s"__vtm_$n")
    struct(
      graft.functions.CappedCollect.cappedSet(col(s"__vtv_$n"), 9).as("vals"),
      allMatch(m.getField("u")).as("u"),
      max(m.getField("uval")).as("umax"),
      allMatch(m.getField("i")).as("i"),
      allMatch(m.getField("f")).as("f"),
      allMatch(m.getField("ip")).as("ip"),
      allMatch(m.getField("iso")).as("iso"))
  }

  /** Decide the value type from a classifyAggPre result struct. */
  def decide(r: Row): String = {
    val vals = r.getSeq[String](0)
    if (vals.size <= 1) return "const"
    // dict caps: <= 8 distinct values, <= 256 total BYTES (consts.go:65-70)
    if (vals.size <= 8 &&
      vals.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
        .sum <= 256) return "dict"
    if (r.getBoolean(1)) {
      val mx = Option(r.getDecimal(2)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
      if (mx <= 255) "uint8"
      else if (mx <= 65535) "uint16"
      else if (mx <= BigDecimal("4294967295")) "uint32"
      else if (mx <= BigDecimal("18446744073709551615")) "uint64"
      else "string"
    }
    else if (r.getBoolean(3)) "int64"
    else if (r.getBoolean(4)) "float64"
    else if (r.getBoolean(5)) "ipv4"
    else if (r.getBoolean(6)) "iso8601"
    else "string"
  }

  /** Whole-relation classification of several fields in ONE aggregate
    * job. Columns must be null-free (callers normalize with
    * `coalesce(_, "")`, like Compiler.strF). */
  def classify(df: DataFrame, fields: Seq[(String, Column)]): Map[String, String] = {
    if (fields.isEmpty) return Map.empty
    val aggs = fields.map { case (n, _) => classifyAggPre(n).as(s"__vt_$n") }
    val row = addMetaCols(df, fields).agg(aggs.head, aggs.tail: _*)
      .collect().head
    fields.zipWithIndex.map { case ((n, _), i) =>
      n -> decide(row.getStruct(i))
    }.toMap
  }

  // ---------------------------------------------------------------------
  // sidecar file
  // ---------------------------------------------------------------------

  private def sidecarPath(dir: String) = s"$dir/logs/_value_types.json"

  /** part key, e.g. "tenant=0:0/_day=2024-01-05" (matching the on-disk
    * partition directory names). */
  def partKey(tenant: String, day: String): String = s"tenant=$tenant/_day=$day"

  private def parseKey(k: String): (String, String) = {
    val i = k.lastIndexOf("/_day=")
    (k.substring("tenant=".length, i), k.substring(i + "/_day=".length))
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Write per-part verdicts into the sidecar. `overwrite` replaces the
    * whole file (bulk loads, mode=overwrite); otherwise each carried part
    * REPLACES its entry (writers classify whole parts exactly — there is
    * no partial-part merge). Serialized by the caller's store write lock;
    * the write is tmp + rename. */
  def record(dir: String, perPart: Map[String, Map[String, String]],
             overwrite: Boolean): Unit = {
    if (perPart.isEmpty && !overwrite) return
    val base: Map[String, Map[String, String]] =
      if (overwrite) Map.empty else load(dir)
    writeSidecar(dir, base ++ perPart)
  }

  private def writeSidecar(dir: String,
                           all: Map[String, Map[String, String]]): Unit = {
    val node = mapper.createObjectNode()
    all.toSeq.sortBy(_._1).foreach { case (part, fs) =>
      val pn = node.putObject(part)
      fs.toSeq.sortBy(_._1).foreach { case (f, t) => pn.put(f, t) }
    }
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node)
    val tmp = sidecarPath(dir) + s".tmp-${System.nanoTime()}"
    Fs.writeAll(tmp, bytes)
    // rename refuses an existing destination — delete first. Writers are
    // serialized by the store's write lock; a reader hitting the gap just
    // sees no sidecar and classifies by scan (safe fallback).
    Fs.delete(sidecarPath(dir))
    Fs.rename(tmp, sidecarPath(dir))
  }

  // tiny mtime-keyed read cache: the sidecar is consulted per value_type()
  // compile; re-parsing a small JSON per query would still be cheap, the
  // cache just avoids the filesystem round-trip on plan-cache misses
  private val loadCache = scala.collection.mutable.Map.empty[
    String, (Long, Long, Map[String, Map[String, String]])]

  def load(dir: String): Map[String, Map[String, String]] = synchronized {
    val p = sidecarPath(dir)
    val f = new java.io.File(new org.apache.hadoop.fs.Path(p).toUri.getPath)
    if (!f.exists()) return Map.empty
    val (len, mt) = (f.length(), f.lastModified())
    loadCache.get(dir) match {
      case Some((l, m, v)) if l == len && m == mt => v
      case _ =>
        val v =
          try {
            import scala.jdk.CollectionConverters._
            val node = mapper.readTree(Fs.readAll(p))
            node.fields().asScala.map { e =>
              e.getKey -> e.getValue.fields().asScala
                .map(fe => fe.getKey -> fe.getValue.asText()).toMap
            }.toMap
          } catch { case _: Exception => Map.empty[String, Map[String, String]] }
        loadCache(dir) = (len, mt, v)
        v
    }
  }

  // ---------------------------------------------------------------------
  // write-side helpers
  // ---------------------------------------------------------------------

  /** String fields of a store batch worth classifying: top-level string
    * columns minus layout internals (the dynamic `fields` map is not
    * tracked — map-resident fields fall back to classification). */
  def classifiableFields(df: DataFrame): Seq[String] = {
    val internal = Set("tenant", "_day")
    df.schema.fields.collect {
      case f if f.dataType == StringType && !internal(f.name) => f.name
    }.toSeq
  }

  /** Bulk-load path: ONE entries job computes per-(tenant, _day)
    * value-type verdicts AND field-name hit counts for the batch being
    * written — the backfill-path twin of [[compactionStats]] (same
    * distinct-value reduction, same decideStats), replacing two
    * batch-scale aggregations plus a map-explode pass. Returns
    * partKey → (field → type, field → hits). */
  def batchStats(batch: DataFrame):
      Map[String, (Map[String, String], Map[String, FieldNameMeta.FieldStat])] = {
    val fields = classifiableFields(batch)
    val topCols = FieldNameMeta.countableTopCols(batch)
    if (fields.isEmpty && topCols.isEmpty && !hasFieldsMap(batch))
      return Map.empty
    val entries = batch
      .select(col("tenant"), col("_day").cast(StringType).as("__d"),
        explode(entryArray(batch, fields, topCols)).as("e"))
      .select(col("tenant"), col("__d"),
        col("e.field").as("field"), col("e.value").as("value"))
    val counted = entries.groupBy("tenant", "__d", "field", "value")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__m", graft.functions.GoValues.metaCol(col("value")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = counted.groupBy("tenant", "__d", "field")
        .agg(statAggs(col("cnt")).head, statAggs(col("cnt")).tail: _*)
        .collect()
      // complete value dictionaries for the dict-class (part, field)
      // cells — bounded by 8 values × cells, one filtered pass over the
      // persisted distinct-value relation
      val sep = "\u0001" // never appears in tenant/day/field names
      val dictKeys = rows.iterator
        .filter(r => dictEligible(r.getLong(12), r.getLong(4)))
        .map(r => s"${r.getString(0)}$sep${r.getString(1)}$sep${r.getString(2)}")
        .toSeq
      val dicts = scala.collection.mutable.Map
        .empty[(String, String, String), Map[String, Long]]
      // oversized batches (>10k dict cells) skip dict capture rather than
      // build a 10k-entry In filter — the hit-count/nd stats still land
      if (dictKeys.nonEmpty && dictKeys.size <= 10000) {
        counted
          .filter(col("value") =!= "" &&
            concat_ws(sep, col("tenant"), col("__d"), col("field"))
              .isin(dictKeys: _*))
          .select("tenant", "__d", "field", "value", "cnt")
          .collect().groupBy(r =>
            (r.getString(0), r.getString(1), r.getString(2)))
          .foreach { case (k, vs) =>
            dicts(k) = vs.map(r => r.getString(3) -> r.getLong(4)).toMap }
      }
      rows.groupBy(r => partKey(r.getString(0), r.getString(1))).map {
        case (part, rs) =>
          val types = rs.iterator
            .filter(r => fields.contains(r.getString(2)))
            .map(r => r.getString(2) -> decideStats(r, 3)).toMap
          val stats = rs.iterator.filter(_.getLong(11) > 0L).map { r =>
            val key = (r.getString(0), r.getString(1), r.getString(2))
            r.getString(2) -> FieldNameMeta.FieldStat(
              r.getLong(11), r.getLong(12), r.getLong(13), dicts.get(key))
          }.toMap
          part -> (types, stats)
      }
    } finally counted.unpersist()
  }

  /** Streaming-append path, phase 1: the touched-parts set rides the
    * existing write-pass observe() — one tiny collect_set, nothing
    * classified on the flush path. */
  def partsAgg: Column =
    collect_set(concat(lit("tenant="), col("tenant"),
      lit("/_day="), col("_day").cast(StringType))).as("__vt_parts")

  /** Streaming-append path, phase 2: an append makes a part's recorded
    * verdict stale — DROP its entry; value_type() falls back to the
    * memoized scan classification until compaction re-classifies the
    * part exactly. */
  def invalidateParts(dir: String, get: String => Any): Unit = {
    val parts = get("__vt_parts").asInstanceOf[Seq[_]].map(String.valueOf)
    if (parts.isEmpty) return
    val base = load(dir)
    // drop the part verdict AND its per-file verdicts: the append's new
    // file has no verdict, so the file set no longer covers the part
    // anyway, and stale entries would linger forever otherwise
    val pruned = base.filterNot { case (k, _) =>
      parts.exists(p => k == p || k.startsWith(p + "/"))
    }
    if (pruned.size != base.size) writeSidecar(dir, pruned)
  }

  /** Retention hygiene: drop expired parts' verdicts (whole-part AND
    * per-file keys). Queries never consult off-disk parts; this only
    * stops dead keys accumulating across retention cycles. */
  def dropParts(dir: String, parts: Set[String]): Unit = {
    if (parts.isEmpty) return
    val base = load(dir)
    val pruned = base.filterNot { case (k, _) =>
      parts.exists(p => k == p || k.startsWith(p + "/"))
    }
    if (pruned.size != base.size) writeSidecar(dir, pruned)
  }

  /** Compaction path, file granularity: classify every data file of a
    * freshly written part in ONE aggregate job (grouped by
    * input_file_name) — the closest Spark analogue of the reference
    * deciding a type PER BLOCK as its merges write them
    * (filter_value_type.go:67 answers per block; a parquet file is this
    * store's block). Returns fileName → field → type. */
  def classifyFiles(partDf: DataFrame): Map[String, Map[String, String]] = {
    val fields = classifiableFields(partDf)
    if (fields.isEmpty) return Map.empty
    val aggs = fields.map(f => classifyAggPre(f).as(s"__vt_$f"))
    addMetaCols(partDf, fields.map(f => f -> coalesce(col(f), lit(""))))
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect().map { r =>
        val name = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
        name -> fields.zipWithIndex.map { case (f, i) =>
          f -> decide(r.getStruct(1 + i))
        }.toMap
      }.toMap
  }

  /** Fused compaction stats over the freshly rewritten part: ONE
    * rollup(input_file_name) aggregate yields the per-file verdicts,
    * the exact whole-part verdict (the rollup's grand-total row — the
    * same agg state the per-file groups merge into), AND the
    * top-level-column hit counts field_names serves; the dynamic
    * `fields`-map hit counts take one more explode job. Replaces three
    * separate full-part reads (classifyPart + classifyFiles +
    * countsForPart) that made compaction read every partition 4× —
    * measured 617s vs ~140s-class builds for a 20M-row store. */
  def compactionStats(tmpDf: DataFrame):
      (Map[String, String], Map[String, Map[String, String]],
       Map[String, FieldNameMeta.FieldStat]) = {
    // Scale shape: ONE scan explodes every row into (file, field, value)
    // entries (top-level columns rendered like field_names sees them,
    // string fields raw, `fields`-map entries appended — the facets
    // single-scan pattern); a codegen'd HashAggregate reduces to DISTINCT
    // (file, field, value) counts, which persist (spilling if big) and
    // feed both the per-file and the exact whole-part rollups. The parse
    // chain (GoValues.metaCol) then runs once per DISTINCT value, and no
    // typed-imperative aggregate appears anywhere — the previous
    // cappedSet-based shape forced ObjectHashAggregate (no codegen,
    // per-row object overhead) and a row-doubling rollup Expand:
    // measured 4.5s vs 0.65s rewrite on a 167k-row partition; this shape
    // classifies the same partition in well under a second.
    val fields = classifiableFields(tmpDf)
    val topCols = FieldNameMeta.countableTopCols(tmpDf)
    if (topCols.isEmpty && fields.isEmpty && !hasFieldsMap(tmpDf))
      return (Map.empty, Map.empty, Map.empty)
    val entries = tmpDf.withColumn("__f", input_file_name())
      .select(col("__f"), explode(entryArray(tmpDf, fields, topCols)).as("e"))
      .select(col("__f"), col("e.field").as("field"), col("e.value").as("value"))
    val counted = entries.groupBy("__f", "field", "value")
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def withM(df: DataFrame): DataFrame =
        df.withColumn("__m", graft.functions.GoValues.metaCol(col("value")))
      // per-file verdicts: distinct values within each file
      val typed =
        if (fields.isEmpty) null
        else withM(counted.filter(col("field").isin(fields: _*)))
      val fileTypes = Map.newBuilder[String, Map[String, String]]
      if (typed != null) {
        val acc = scala.collection.mutable
          .Map.empty[String, scala.collection.mutable.Map[String, String]]
        typed.groupBy("field", "__f").agg(statAggs(col("cnt")).head,
            statAggs(col("cnt")).tail: _*).collect().foreach { r =>
          val file = r.getString(1)
          acc.getOrElseUpdate(file.substring(file.lastIndexOf('/') + 1),
            scala.collection.mutable.Map.empty)(r.getString(0)) =
              decideStats(r, 2)
        }
        acc.foreach { case (f, m) => fileTypes += f -> m.toMap }
      }
      // whole-part: EXACT distinct across files (re-grouped), then one
      // rollup per field — types for classifiable fields, hit counts for
      // every field (top-level and map keys alike)
      val partDistinct = withM(counted.groupBy("field", "value")
        .agg(sum(col("cnt")).as("cnt")))
      val partRows = partDistinct.groupBy("field")
        .agg(statAggs(col("cnt")).head, statAggs(col("cnt")).tail: _*)
        .collect()
      val partTypes = partRows.iterator
        .filter(r => fields.contains(r.getString(0)))
        .map(r => r.getString(0) -> decideStats(r, 1)).toMap
      // complete value dictionaries for the part's dict-class fields
      // (facets assist) — one filtered pass over the part-distinct rows
      val dictFields = partRows.iterator
        .filter(r => dictEligible(r.getLong(10), r.getLong(2)))
        .map(_.getString(0)).toSeq
      val dicts = scala.collection.mutable.Map.empty[String, Map[String, Long]]
      if (dictFields.nonEmpty && dictFields.size <= 10000) {
        partDistinct
          .filter(col("value") =!= "" && col("field").isin(dictFields: _*))
          .select("field", "value", "cnt").collect()
          .groupBy(_.getString(0)).foreach { case (f, vs) =>
            dicts(f) = vs.map(r => r.getString(1) -> r.getLong(2)).toMap }
      }
      val stats = partRows.iterator
        .filter(_.getLong(9) > 0L)
        .map(r => r.getString(0) -> FieldNameMeta.FieldStat(
          r.getLong(9), r.getLong(10), r.getLong(11),
          dicts.get(r.getString(0))))
        .toMap
      (partTypes, fileTypes.result(), stats)
    } finally counted.unpersist()
  }

  private def hasFieldsMap(df: DataFrame): Boolean =
    df.schema.fields.exists(f =>
      f.name == "fields" && f.dataType.isInstanceOf[MapType])

  /** Per-row (field, value) entry array: top-level columns (string
    * fields raw null-normalized — identical to the whole-part
    * classification input; everything else rendered the way field_names
    * sees it) plus the `fields`-map entries. The facets single-scan
    * pattern, reused by both write-path stats jobs. */
  private def entryArray(df: DataFrame, fields: Seq[String],
                         topCols: Seq[String]): Column = {
    val topEntries = topCols.map { c =>
      val v = if (fields.contains(c)) coalesce(col(c), lit(""))
              else graft.logql.Compiler.strF(df, c)
      struct(lit(c).as("field"), v.as("value"))
    }
    if (hasFieldsMap(df)) concat(array(topEntries: _*),
      transform(map_entries(coalesce(col("fields"),
          map().cast(MapType(StringType, StringType)))),
        e => struct(e.getField("key").as("field"),
                    coalesce(e.getField("value"), lit("")).as("value"))))
    else array(topEntries: _*)
  }

  /** The 9 stat aggregates over distinct-value rows carrying `value`,
    * `cnt`, and the parse-meta struct `__m`. */
  private def statAggs(cnt: Column): Seq[Column] = {
    val m = col("__m")
    Seq(
      count(lit(1)).as("nd"),
      sum(octet_length(col("value")).cast(LongType)).as("bytes"),
      allMatch(m.getField("u")).as("u"),
      max(m.getField("uval")).as("umax"),
      allMatch(m.getField("i")).as("i"),
      allMatch(m.getField("f")).as("f"),
      allMatch(m.getField("ip")).as("ip"),
      allMatch(m.getField("iso")).as("iso"),
      sum(when(col("value") =!= "", cnt).otherwise(lit(0L))).as("hits"),
      // facets-assist stats (FieldNameMeta.FieldStat): distinct and max
      // octet length over NON-empty values — appended so the positional
      // reads above keep their offsets
      sum(when(col("value") =!= "", lit(1L)).otherwise(lit(0L))).as("ndne"),
      coalesce(max(when(col("value") =!= "",
        octet_length(col("value")).cast(LongType))), lit(0L)).as("maxlen"))
  }

  /** Dict-class gate for the facets-assist sidecar: a field whose part
    * holds ≤8 distinct non-empty values totalling ≤256 bytes stores the
    * complete value→rowcount dictionary (values_encoder.go:19-59 gate). */
  private def dictEligible(ndne: Long, bytes: Long): Boolean =
    ndne > 0L && ndne <= 8L && bytes <= 256L

  /** [[decide]] over the flat stats row shape `(nd, bytes, u, umax, i,
    * f, ip, iso, hits)` starting at `off` — count/byte-sum aggregates
    * replace the capped distinct sample (the ≤8-distinct/≤256-byte dict
    * gate needs only those two numbers, consts.go:65-70). */
  private def decideStats(r: Row, off: Int): String = {
    val nd = r.getLong(off)
    val bytes = r.getLong(off + 1)
    if (nd <= 1) return "const"
    if (nd <= 8 && bytes <= 256) return "dict"
    if (r.getBoolean(off + 2)) {
      val mx = Option(r.getDecimal(off + 3))
        .map(BigDecimal(_)).getOrElse(BigDecimal(0))
      if (mx <= 255) "uint8"
      else if (mx <= 65535) "uint16"
      else if (mx <= BigDecimal("4294967295")) "uint32"
      else if (mx <= BigDecimal("18446744073709551615")) "uint64"
      else "string"
    }
    else if (r.getBoolean(off + 4)) "int64"
    else if (r.getBoolean(off + 5)) "float64"
    else if (r.getBoolean(off + 6)) "ipv4"
    else if (r.getBoolean(off + 7)) "iso8601"
    else "string"
  }

  /** Record one compacted part's whole-part verdict PLUS its per-file
    * verdicts (sidecar keys `partKey/fileName`), replacing any stale
    * file entries of that part. Caller holds the store append lock. */
  def recordPart(dir: String, partKey: String,
                 partTypes: Map[String, String],
                 fileTypes: Map[String, Map[String, String]]): Unit = {
    val base = load(dir).filterNot { case (k, _) => k.startsWith(partKey + "/") }
    val fileEntries = fileTypes.map { case (fn, m) => s"$partKey/$fn" -> m }
    writeSidecar(dir, base + (partKey -> partTypes) ++ fileEntries)
  }

  /** Compaction path: classify one partition EXACTLY (one aggregate over
    * data the compactor is already rewriting — the reference's merges
    * decide block types the same way). The caller records the result
    * after its post-swap file-set check. */
  def classifyPart(partDf: DataFrame): Map[String, String] =
    classify(partDf, classifiableFields(partDf)
      .map(f => f -> coalesce(col(f), lit(""))))

  // ---------------------------------------------------------------------
  // query side
  // ---------------------------------------------------------------------

  /** The store dir behind `df`, when df is a single-root scan of a
    * `<dir>/logs` tree that has a sidecar. */
  def storeDirOf(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val roots = df.queryExecution.analyzed.collectLeaves().flatMap {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
      case _ => Nil
    }.distinct
    roots match {
      case Seq(one) if one.endsWith("/logs") =>
        val dir = one.stripSuffix("/logs")
        if (new java.io.File(sidecarPath(dir)).exists()) Some(dir) else None
      case _ => None
    }
  }

  /** How one part answers `fld:value_type(want)`. */
  private sealed trait PartAnswer
  private case object MatchAll extends PartAnswer
  private case object MatchNone extends PartAnswer
  /** Some files of the part match, some don't (file-granularity verdicts
    * from compaction) — the per-file analogue of the reference skipping
    * non-matching BLOCKS by their header (filter_value_type.go:79-87). */
  private final case class MatchFiles(files: Seq[String]) extends PartAnswer

  /** Bound on the file-name in-list a mixed part may contribute: past
    * this the expression tree stops paying for itself — classify by
    * scan instead. */
  private val MaxFilePredicate = 512

  /** Sidecar-backed predicate for `fld:value_type(want)` over `df`, or
    * None when the sidecar can't answer (no sidecar, an on-disk part
    * without a verdict — e.g. dropped by an append's invalidation — or a
    * "mixed" verdict) — callers then classify by scan.
    *
    * Resolution is layered per ON-DISK part (the disk, not the sidecar's
    * own key set, is the part universe — a store whose remaining entries
    * all matched used to compile to lit(true) and admit an appended
    * unclassified part's rows): per-FILE verdicts (compaction-written,
    * the reference's per-block granularity) when they cover the part's
    * current files, else the whole-part verdict. Mixed parts compile to
    * a `_metadata.file_name` in-list under the part's partition
    * predicate. */
  def predicate(df: DataFrame, fld: String, want: String): Option[Column] =
    storeDirOf(df).flatMap { dir =>
      val all = load(dir)
      val diskParts = LogStore.listPartKeys(dir)
      if (all.isEmpty || diskParts.isEmpty) None
      else {
        val (fileE, partE) = all.partition(_._1.endsWith(".parquet"))
        val filesByPart = fileE.toSeq
          .groupBy { case (k, _) => k.substring(0, k.lastIndexOf('/')) }
          .map { case (p, es) =>
            p -> es.map { case (k, m) =>
              k.substring(k.lastIndexOf('/') + 1) -> m
            }.toMap
          }
        def resolve(p: String): Option[PartAnswer] = {
          val byFile = filesByPart.get(p).flatMap { fv =>
            val current = LogStore.listPartFiles(dir, p)
            val covered = current.nonEmpty &&
              current.forall(f => fv.get(f).exists(m =>
                m.get(fld).exists(_ != "mixed")))
            if (!covered) None
            else {
              val matching = current.toSeq.sorted.filter(f => fv(f)(fld) == want)
              Some(
                if (matching.isEmpty) MatchNone
                else if (matching.size == current.size) MatchAll
                else MatchFiles(matching))
            }
          }
          byFile.orElse(partE.get(p).flatMap(_.get(fld)).collect {
            case t if t != "mixed" => if (t == want) MatchAll else MatchNone
          })
        }
        val resolved = diskParts.toSeq.sorted.map(p => p -> resolve(p))
        if (resolved.exists(_._2.isEmpty)) None
        else {
          val answers = resolved.map { case (p, a) => p -> a.get }
          val full = answers.collect { case (p, MatchAll) => p }
          val partial = answers.collect { case (p, MatchFiles(fs)) => p -> fs }
          if (partial.isEmpty && full.isEmpty) Some(lit(false))
          else if (partial.isEmpty && full.size == answers.size) Some(lit(true))
          else if (!df.columns.contains("tenant") || !df.columns.contains("_day"))
            None // partition predicate needs the partition columns
          else if (partial.iterator.map(_._2.size).sum > MaxFilePredicate) None
          else if (partial.nonEmpty && !metadataResolvable(df)) None
          else {
            def partitionPred(keys: Seq[String]): Column = {
              val byTenant = keys.map(parseKey).groupBy(_._1)
              byTenant.map { case (t, ps) =>
                col("tenant") === lit(t) && col("_day").isin(ps.map(_._2): _*)
              }.reduce(_ || _)
            }
            val fullPred =
              if (full.isEmpty) Nil else Seq(partitionPred(full))
            val filePreds = partial.map { case (p, fs) =>
              partitionPred(Seq(p)) && col("_metadata.file_name").isin(fs: _*)
            }
            Some((fullPred ++ filePreds).reduce(_ || _))
          }
        }
      }
    }

  /** `_metadata` resolves only on direct file-source scans (a pending
    * hot-field promotion wraps the read in projections that drop it) —
    * probe with an analysis-only select before compiling it in. */
  private def metadataResolvable(df: DataFrame): Boolean =
    try { df.select(col("_metadata.file_name")); true }
    catch { case _: Exception => false }
}
