package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** min()/max() over the reference's value collation (stats_min.go /
  * stats_max.go + lessString): the winning VALUE STRING across the
  * per-row candidate array. Empty strings PARTICIPATE ("" sorts first) —
  * the caller controls presence semantics (explicit fields contribute
  * "" for missing, wildcards only existing values). An all-empty result
  * renders as an absent field downstream. */
case class MinMaxValueAgg(child: Expression, isMin: Boolean,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft value agg needs array<string>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[String] = Array(null)

  private def better(cur: String, v: String): String =
    if (v == null) cur
    else if (cur == null) v
    else if (isMin) { if (ValueCompare.less(v, cur)) v else cur }
    else { if (ValueCompare.less(cur, v)) v else cur }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i))
          buf(0) = better(buf(0), arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[String], other: Array[String]): Array[String] = {
    buf(0) = better(buf(0), other(0))
    buf
  }

  override def eval(buf: Array[String]): Any =
    if (buf(0) == null) null else UTF8String.fromString(buf(0))

  // a 1-byte presence tag: the legitimate "" value must not collapse
  // into the null (no items yet) state across the shuffle
  override def serialize(buf: Array[String]): Array[Byte] =
    if (buf(0) == null) Array[Byte](0)
    else Array[Byte](1) ++ buf(0).getBytes("UTF-8")

  override def deserialize(bytes: Array[Byte]): Array[String] =
    if (bytes.isEmpty || bytes(0) == 0) Array(null)
    else Array(new String(bytes, 1, bytes.length - 1, "UTF-8"))

  override def withNewMutableAggBufferOffset(o: Int): MinMaxValueAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinMaxValueAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MinMaxValueAgg = copy(child = cs.head)
  override def prettyName: String =
    if (isMin) "graft_min_value" else "graft_max_value"
}

/** row_min(src, ...)/row_max(src, ...): the row JSON whose SOURCE field
  * value wins under the reference collation; rows with an empty source
  * value never win (stats_row_min.go / stats_row_max.go). Children:
  * (sourceValue, rowJson). */
case class RowMinMaxAgg(key: Expression, json: Expression, isMin: Boolean,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(key, json)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType.isInstanceOf[StringType] &&
        json.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft row agg needs two strings")

  override def createAggregationBuffer(): Array[String] = Array(null, null)

  private def consider(buf: Array[String], k: String, j: String): Unit = {
    if (k == null || k.isEmpty || j == null) return
    if (buf(0) == null ||
        (isMin && ValueCompare.less(k, buf(0))) ||
        (!isMin && ValueCompare.less(buf(0), k))) {
      buf(0) = k; buf(1) = j
    }
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val k0 = key.eval(input)
    if (k0 == null) return buf
    val k = k0.toString
    if (k.isEmpty) return buf
    if (buf(0) == null ||
        (isMin && ValueCompare.less(k, buf(0))) ||
        (!isMin && ValueCompare.less(buf(0), k))) {
      // render the row JSON ONLY when the key wins: to_json of the whole
      // row per INPUT row dominated this agg (99.6s for a 20M-row by-day
      // row_max; winners per partition are ~log n on shuffled input).
      // A winning row whose JSON evals null is ignored, as before.
      val j = json.eval(input)
      if (j != null) { buf(0) = k; buf(1) = j.toString }
    }
    buf
  }

  override def merge(buf: Array[String], o: Array[String]): Array[String] = {
    consider(buf, o(0), o(1))
    buf
  }

  override def eval(buf: Array[String]): Any =
    if (buf(1) == null) null else UTF8String.fromString(buf(1))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def w(x: String): Unit = {
      if (x == null) out.writeInt(-1)
      else { val b = x.getBytes("UTF-8"); out.writeInt(b.length); out.write(b) }
    }
    w(buf(0)); w(buf(1)); out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    def r(): String = {
      val n = in.readInt()
      if (n < 0) null
      else { val b = new Array[Byte](n); in.readFully(b); new String(b, "UTF-8") }
    }
    Array(r(), r())
  }

  override def withNewMutableAggBufferOffset(o: Int): RowMinMaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RowMinMaxAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): RowMinMaxAgg =
    copy(key = cs(0), json = cs(1))
  override def prettyName: String =
    if (isMin) "graft_row_min" else "graft_row_max"
}

/** quantile(phi)/median over the reference's sampling histogram
  * (stats_quantile.go): keep the first 10k values plus running min/max
  * under the lessString order, answer sorted[int(phi*n)]; phi<=0 → min,
  * phi>=1 → max, no values → null. "" values participate; the caller
  * controls presence semantics like min/max. */
case class QuantileValueAgg(child: Expression, phi: Double,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_value needs array<string>, got ${t.sql}")
  }

  override def createAggregationBuffer(): QuantileState = new QuantileState

  override def update(st: QuantileState, input: InternalRow): QuantileState = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) st.add(arr.getUTF8String(i).toString)
        i += 1
      }
    }
    st
  }

  override def merge(a: QuantileState, b: QuantileState): QuantileState = {
    a.mergeFrom(b); a
  }

  override def eval(st: QuantileState): Any = {
    val q = st.quantile(phi)
    if (q == null) null else UTF8String.fromString(q)
  }

  override def serialize(st: QuantileState): Array[Byte] = st.toBytes
  override def deserialize(bytes: Array[Byte]): QuantileState =
    QuantileState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileValueAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileValueAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): QuantileValueAgg = copy(child = cs.head)
  override def prettyName: String = "graft_quantile_value"
}

final class QuantileState extends Serializable {
  import QuantileState.MaxSamples
  var samples: scala.collection.mutable.ArrayBuffer[String] =
    scala.collection.mutable.ArrayBuffer.empty
  var min: String = null
  var max: String = null
  var count: Long = 0L

  def add(v: String): Unit = {
    if (count == 0 || ValueCompare.less(v, min)) min = v
    if (count == 0 || ValueCompare.less(max, v)) max = v
    count += 1
    if (samples.size < MaxSamples) samples += v
  }

  def mergeFrom(o: QuantileState): Unit = {
    if (o.count > 0) {
      if (count == 0 || ValueCompare.less(o.min, min)) min = o.min
      if (count == 0 || ValueCompare.less(max, o.max)) max = o.max
      count += o.count
      val room = MaxSamples - samples.size
      if (room > 0) samples ++= o.samples.take(room)
    }
  }

  def quantile(phi: Double): String = {
    if (samples.isEmpty) return null
    if (samples.size == 1) return samples.head
    if (phi <= 0) return min
    if (phi >= 1) return max
    val sorted = samples.sortWith(ValueCompare.less)
    val idx = (phi * sorted.size).toInt
    if (idx >= sorted.size) max else sorted(idx)
  }

  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(count)
    def w(s: String): Unit = {
      if (s == null) out.writeInt(-1)
      else { val b = s.getBytes("UTF-8"); out.writeInt(b.length); out.write(b) }
    }
    w(min); w(max)
    out.writeInt(samples.size)
    samples.foreach(w)
    out.flush()
    bos.toByteArray
  }
}

object QuantileState {
  val MaxSamples = 10000

  def fromBytes(bytes: Array[Byte]): QuantileState = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val st = new QuantileState
    st.count = in.readLong()
    def r(): String = {
      val n = in.readInt()
      if (n < 0) null
      else { val b = new Array[Byte](n); in.readFully(b); new String(b, "UTF-8") }
    }
    st.min = r(); st.max = r()
    val n = in.readInt()
    (0 until n).foreach(_ => st.samples += r())
    st
  }
}

/** Numeric fast path of [[QuantileValueAgg]] for single native-numeric
  * fields: the string agg renders every value through GoFloat and
  * re-parses it in the value collation PER ROW (interpreted — measured
  * 108s for a by-day P99 over 20M rows vs 1s for the typed min/max);
  * for numbers the collation IS numeric order with NaN last (rendered
  * numerics always take the both-numbers branch; "NaN" sorts after
  * every digit/sign-leading string under the natural fallback), which
  * is exactly java.lang.Double.compare's order. Same 10k first-arrival
  * sample, same nearest-rank pick, double output — the string path cast
  * its result back to double for native fields anyway. */
case class QuantileDoubleAgg(child: Expression, phi: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileDoubleState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_double needs double, got ${t.sql}")
  }

  override def createAggregationBuffer(): QuantileDoubleState =
    new QuantileDoubleState

  override def update(st: QuantileDoubleState, input: InternalRow): QuantileDoubleState = {
    val v = child.eval(input)
    if (v != null) st.add(v.asInstanceOf[Double])
    st
  }

  override def merge(a: QuantileDoubleState, b: QuantileDoubleState): QuantileDoubleState = {
    a.mergeFrom(b); a
  }

  override def eval(st: QuantileDoubleState): Any = st.quantile(phi)

  override def serialize(st: QuantileDoubleState): Array[Byte] = st.toBytes
  override def deserialize(bytes: Array[Byte]): QuantileDoubleState =
    QuantileDoubleState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileDoubleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileDoubleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): QuantileDoubleAgg = copy(child = cs.head)
  override def prettyName: String = "graft_quantile_double"
}

/** Mirrors [[QuantileState]] with primitive doubles: first-10k-arrivals
  * sample, running min/max under Double.compare (NaN greatest, like the
  * string collation's natural-order fallback places "NaN"). */
final class QuantileDoubleState extends Serializable {
  import QuantileState.MaxSamples
  var samples: Array[Double] = new Array[Double](64)
  var n: Int = 0
  var min: Double = 0d
  var max: Double = 0d
  var count: Long = 0L

  def add(v: Double): Unit = {
    if (count == 0 || java.lang.Double.compare(v, min) < 0) min = v
    if (count == 0 || java.lang.Double.compare(max, v) < 0) max = v
    count += 1
    if (n < MaxSamples) {
      if (n == samples.length)
        samples = java.util.Arrays.copyOf(samples,
          math.min(samples.length * 2, MaxSamples))
      samples(n) = v
      n += 1
    }
  }

  def mergeFrom(o: QuantileDoubleState): Unit = {
    if (o.count > 0) {
      if (count == 0 || java.lang.Double.compare(o.min, min) < 0) min = o.min
      if (count == 0 || java.lang.Double.compare(max, o.max) < 0) max = o.max
      count += o.count
      var i = 0
      while (i < o.n && n < MaxSamples) {
        if (n == samples.length)
          samples = java.util.Arrays.copyOf(samples,
            math.min(samples.length * 2, MaxSamples))
        samples(n) = o.samples(i)
        n += 1; i += 1
      }
    }
  }

  def quantile(phi: Double): Any = {
    if (n == 0) return null
    if (n == 1) return samples(0)
    if (phi <= 0) return min
    if (phi >= 1) return max
    val sorted = java.util.Arrays.copyOf(samples, n)
    java.util.Arrays.sort(sorted) // NaN last, like the string collation
    val idx = (phi * n).toInt
    if (idx >= n) max else sorted(idx)
  }

  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(count)
    out.writeDouble(min); out.writeDouble(max)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(samples(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object QuantileDoubleState {
  def fromBytes(bytes: Array[Byte]): QuantileDoubleState = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val st = new QuantileDoubleState
    st.count = in.readLong()
    st.min = in.readDouble(); st.max = in.readDouble()
    val k = in.readInt()
    st.samples = new Array[Double](math.max(k, 1))
    var i = 0
    while (i < k) { st.samples(i) = in.readDouble(); i += 1 }
    st.n = k
    st
  }
}

/** Numeric-key fast path of [[RowMinMaxAgg]] (same rationale as
  * [[QuantileDoubleAgg]]): for a native-numeric source field the key
  * collation over rendered numbers is Double.compare's order (NaN last),
  * so the per-row GoFloat render + collation re-parse is skipped; the
  * row JSON still renders through the same to_json child, winners only. */
case class RowMinMaxDoubleAgg(key: Expression, json: Expression, isMin: Boolean,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RowMinMaxDoubleState] {

  override def children: Seq[Expression] = Seq(key, json)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == org.apache.spark.sql.types.DoubleType &&
        json.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft row-double agg needs (double, string)")

  override def createAggregationBuffer(): RowMinMaxDoubleState =
    new RowMinMaxDoubleState

  private def wins(st: RowMinMaxDoubleState, k: Double): Boolean =
    st.json == null ||
      (isMin && java.lang.Double.compare(k, st.key) < 0) ||
      (!isMin && java.lang.Double.compare(st.key, k) < 0)

  override def update(st: RowMinMaxDoubleState, input: InternalRow): RowMinMaxDoubleState = {
    val k0 = key.eval(input)
    if (k0 != null && wins(st, k0.asInstanceOf[Double])) {
      val j = json.eval(input) // winners only, like RowMinMaxAgg
      if (j != null) { st.key = k0.asInstanceOf[Double]; st.json = j.toString }
    }
    st
  }

  override def merge(a: RowMinMaxDoubleState, b: RowMinMaxDoubleState): RowMinMaxDoubleState = {
    if (b.json != null && wins(a, b.key)) { a.key = b.key; a.json = b.json }
    a
  }

  override def eval(st: RowMinMaxDoubleState): Any =
    if (st.json == null) null else UTF8String.fromString(st.json)

  override def serialize(st: RowMinMaxDoubleState): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeDouble(st.key)
    if (st.json == null) out.writeInt(-1)
    else { val b = st.json.getBytes("UTF-8"); out.writeInt(b.length); out.write(b) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RowMinMaxDoubleState = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new RowMinMaxDoubleState
    st.key = in.readDouble()
    val n = in.readInt()
    if (n >= 0) {
      val b = new Array[Byte](n); in.readFully(b)
      st.json = new String(b, "UTF-8")
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): RowMinMaxDoubleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RowMinMaxDoubleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): RowMinMaxDoubleAgg =
    copy(key = cs(0), json = cs(1))
  override def prettyName: String =
    if (isMin) "graft_row_min_double" else "graft_row_max_double"
}

final class RowMinMaxDoubleState extends Serializable {
  var key: Double = 0d
  var json: String = null
}
