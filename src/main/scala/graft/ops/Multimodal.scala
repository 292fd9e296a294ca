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
  * BufferedImage (no external dependency). The AUDIO codec path is REAL:
  * WAV/AIFF/AU decode through javax.sound.sampled with waveform +
  * spectral-band features. Only VIDEO decode is STUBBED — the container
  * has no video codecs — with a clearly-marked deterministic fake, so the
  * Spark-side plumbing (schema, batching, partitioning, output shape)
  * stays real and tested for every media type.
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

  // ------------------------------------------------------------ audio codec

  /** Decoded PCM audio: mono-mixed samples in [-1, 1]. */
  final case class AudioClip(samples: Array[Double], sampleRate: Float,
                             channels: Int)

  /** Real audio decode via the JDK sampled-sound stack (WAV/AIFF/AU —
    * javax.sound.sampled ships with the JRE, no external codec needed).
    * Any encoding the JDK can convert (PCM, ULAW, ALAW) is normalized to
    * 16-bit signed PCM and mono-mixed. None when the bytes are not a
    * decodable audio container. */
  def decodeAudio(content: Array[Byte]): Option[AudioClip] =
    if (content == null || content.length == 0) None
    else try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val src = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val f0 = src.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
        f0.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, src)
      val bytes = try pcm.readAllBytes() finally { pcm.close(); src.close() }
      val ch = f0.getChannels
      val frames = bytes.length / (2 * ch)
      val out = new Array[Double](frames)
      var i = 0
      while (i < frames) {
        var s = 0.0
        var c = 0
        while (c < ch) {
          val idx = (i * ch + c) * 2
          s += (((bytes(idx + 1) << 8) | (bytes(idx) & 0xff)).toShort) / 32768.0
          c += 1
        }
        out(i) = s / ch
        i += 1
      }
      Some(AudioClip(out, f0.getSampleRate, ch))
    } catch { case _: Exception => None }

  /** Real waveform features for decoded audio: [rms, peak, zero-crossing
    * rate] followed by `dim - 3` spectral-band amplitudes (Goertzel
    * single-bin DFT at octave-spaced frequencies 200·2^b Hz, so a pure
    * tone lights up exactly one band). Deterministic and
    * duration-independent (all terms normalize by the frame count). */
  private def audioFeatures(clip: AudioClip, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val s = clip.samples
    val n = s.length
    if (n == 0) return out
    var (sumSq, peak) = (0.0, 0.0)
    var zc = 0
    var i = 0
    while (i < n) {
      val v = s(i)
      sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
      i += 1
    }
    if (dim > 0) out(0) = math.sqrt(sumSq / n).toFloat
    if (dim > 1) out(1) = peak.toFloat
    if (dim > 2) out(2) = (zc.toDouble / n).toFloat
    val bands = dim - 3
    var b = 0
    while (b < bands) {
      val freq = 200.0 * (1 << b)
      if (freq < clip.sampleRate / 2) {
        // Goertzel recurrence: power of the single DFT bin nearest freq
        val w = 2.0 * math.Pi * freq / clip.sampleRate
        val coeff = 2.0 * math.cos(w)
        var (s0, s1, s2) = (0.0, 0.0, 0.0)
        var j = 0
        while (j < n) {
          s0 = s(j) + coeff * s1 - s2
          s2 = s1; s1 = s0
          j += 1
        }
        val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
        // normalize so a unit sine at the bin frequency reads ~0.5
        out(3 + b) = (math.sqrt(math.max(power, 0.0)) / n).toFloat
      }
      b += 1
    }
    out
  }

  /** STUB decoder for video media. Real deployments replace this with an
    * actual video codec (JNI/javacv) — everything around it (batching,
    * schema, nullability) stays identical. Deterministic: features derive
    * from the byte content so tests can assert exact values. */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real video codec goes here; deterministic fake below
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
            case None => decodeAudio(bytes) match {
              case Some(clip) => audioFeatures(clip, dim)
              case None => decodeStub(bytes, dim)
            }
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

  /** Encode a mono 16-bit PCM WAV sine tone in memory (test/dev helper for
    * driving the real audio path without fixture files). */
  def testWav(freqHz: Double, sampleRate: Int = 8000, millis: Int = 1000,
              amplitude: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val frames = sampleRate * millis / 1000
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = (amplitude * math.sin(2.0 * math.Pi * freqHz * i / sampleRate) *
        32767.0).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
