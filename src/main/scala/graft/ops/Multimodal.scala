package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training pipelines.
  *
  * Media travel as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction / resize / frame-sampling run as batched
  * per-partition transforms (the Scala analogue of `mapInPandas`).
  *
  * The IMAGE codec path is REAL: PNG/JPEG/BMP/GIF decode, pixel-level
  * feature extraction, and resize run through the JDK's ImageIO /
  * BufferedImage (no external dependency). Audio/video decode is STUBBED —
  * the container has no media codecs — with a clearly-marked deterministic
  * fake, so the Spark-side plumbing (schema, batching, partitioning,
  * output shape) stays real and tested for every media type.
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

  // ------------------------------------------------------------ image codec

  /** Real image decode via the JDK ImageIO readers (PNG/JPEG/BMP/GIF/WBMP).
    * None when the bytes are not a decodable image. */
  def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (content == null || content.length == 0) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content)))
    catch { case _: Exception => None }

  /** Real pixel features for a decoded image: global RGB channel means
    * (first 3 entries) followed by a luminance histogram over the
    * remaining `dim - 3` bins — deterministic, resolution-independent. */
  private def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    val bins = math.max(dim - 3, 0)
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        if (bins > 0) {
          val lum = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          val bin = math.min((lum * bins).toInt, bins - 1)
          out(3 + bin) += 1f
        }
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    if (dim > 0) out(0) = (sr / n / 255.0).toFloat
    if (dim > 1) out(1) = (sg / n / 255.0).toFloat
    if (dim > 2) out(2) = (sb / n / 255.0).toFloat
    var i = 3
    while (i < dim) { out(i) /= n; i += 1 }
    out
  }

  /** STUB decoder for non-image media. Real deployments replace this with
    * an actual audio/video codec (JNI/javacv) — everything around it
    * (batching, schema, nullability) stays identical. Deterministic:
    * features derive from the byte content so tests can assert exact
    * values. */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real audio/video codec goes here; deterministic fake below
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
    * Image bytes take the real ImageIO path; anything else falls to the
    * deterministic stub. Runs per-partition in fixed-size batches (the
    * Scala analogue of the mapInPandas batch shape — a real model call
    * amortizes per-batch overhead), preserving partitioning — no shuffle. */
  def extractFeatures(df: DataFrame, contentCol: String,
                      dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec invocation per batch; decode is item-wise
        val feats = batch.map { r =>
          val bytes = r.get(idx) match {
            case b: Array[Byte] => b
            case null => Array.emptyByteArray
            case other => other.toString.getBytes("UTF-8")
          }
          decodeImage(bytes) match {
            case Some(img) => imageFeatures(img, dim)
            case None => decodeStub(bytes, dim)
          }
        }
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f.toSeq))
      }
    }(enc)
  }

  /** Image resize: decodable images are REALLY resampled (bilinear
    * Graphics2D draw into a w×h canvas, re-encoded as PNG) with metadata
    * updated to match; non-image rows keep their bytes and only record the
    * target size in metadata (their codec is the declared stub). */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(df.schema))
    val cIdx = df.schema.fieldIndex("content")
    val mIdx = df.schema.fieldIndex("meta")
    val resized = df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(cIdx) match {
          case b: Array[Byte] => b
          case _ => Array.emptyByteArray
        }
        val vals = r.toSeq.toArray
        // rows without metadata must pass through, not NPE in the executor
        val meta = if (r.isNullAt(mIdx)) null else r.getStruct(mIdx)
        def metaAt(i: Int): Any = if (meta == null) null else meta.get(i)
        decodeImage(bytes) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            vals(cIdx) = bos.toByteArray
            vals(mIdx) = Row(w, h, metaAt(2), "image/png")
          case None =>
            vals(mIdx) = Row(w, h, metaAt(2), metaAt(3))
        }
        Row.fromSeq(vals.toSeq)
      }
    }(enc)
    resized
  }

  /** Frame sampling for video rows: explode into `n` frame rows with
    * frame index + timestamp metadata (frame decode stubbed). */
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

  /** Encode a solid-color w×h PNG in memory (test/dev helper for driving
    * the real image path without fixture files). */
  def testPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
