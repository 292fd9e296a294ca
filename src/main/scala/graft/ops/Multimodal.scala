package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training pipelines.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction / resize / frame-sampling run as batched
  * per-partition transforms (the Scala analogue of `mapInPandas`). The
  * actual codec step is STUBBED — the container has no image/audio codecs —
  * with a clearly-marked deterministic fake so the Spark-side plumbing
  * (schema, batching, partitioning, output shape) is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),      // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType))))))

  /** STUB decoder. Real deployments replace this with an actual codec
    * (JNI/javacv) — everything around it (batching, schema, nullability)
    * stays identical. Deterministic: features derive from the byte content
    * so tests can assert exact values.
    */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling hash over the bytes
    var i = 0
    while (i < content.length) { h = h * 31 + (content(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(j) = ((h % 2000003L).toFloat / 1000001.5f)
      j += 1
    }
    out
  }

  /** Batched feature extraction: binary column → `Array[Float]` embedding.
    * Runs per-partition in fixed-size batches (the Scala analogue of
    * mapInPandas batch shape — a real codec amortizes JNI/model-call
    * overhead across each batch), preserving partitioning — no shuffle. */
  def extractFeatures(df: DataFrame, contentCol: String,
                      dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec invocation per batch; the stub decodes item-wise
        val feats = batch.map { r =>
          val bytes = r.get(idx) match {
            case b: Array[Byte] => b
            case null => Array.emptyByteArray
            case other => other.toString.getBytes("UTF-8")
          }
          decodeStub(bytes, dim)
        }
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f.toSeq))
      }
    }(enc)
  }

  /** Image resize stub: records the target size in metadata; the pixel
    * transform itself is the stubbed codec step. */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.format").as("format")))

  /** Frame sampling for video rows: explode into `n` frame rows with
    * frame index + timestamp metadata (decode stubbed). */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.filter(col("media_type") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_ts_ms",
        (col("meta.duration_ms") * col("frame_idx") / n).cast(LongType))

  /** Build a media table from text rows (dev helper — treats UTF-8 bytes as
    * the opaque payload so the pipeline is drivable without codecs). */
  def fakeMediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        octet_length(col(textCol)).cast(IntegerType).as("width"),
        lit(480).as("height"),
        (octet_length(col(textCol)) * 10L).as("duration_ms"),
        lit("fake/v1").as("format")).as("meta"))
}
