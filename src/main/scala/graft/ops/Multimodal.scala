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
  * spectral-band features. The VIDEO path is REAL for MJPEG-in-AVI
  * (RIFF container walk + per-frame JPEG decode), uncompressed BI_RGB
  * streams (raw DIB rows), and MS-RLE BI_RLE8 streams (palettized
  * run-length) — all public formats; inter-frame codecs (H.264 etc.)
  * fall back to a clearly-marked deterministic stub, so the Spark-side
  * plumbing (schema, batching, partitioning, output shape) stays real
  * and tested for every media type regardless of codec availability.
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

  // ------------------------------------------------------------ video codec

  /** Upper bound on decoded-frame pixels (16 Mpx ≈ a 4K×4K frame, 64 MB
    * of INT_RGB raster): container-declared dimensions are
    * attacker-controlled, and a crafted header must fail to None, not
    * allocate an executor-killing image. */
  private val MaxDecodedPixels = 16777216L

  /** Decoded video container: per-frame ENCODED images (JPEG for MJPG,
    * raw DIB rows for BI_RGB) plus container timing. Frames stay encoded
    * until a consumer needs pixels — sampling k of n frames never decodes
    * the other n-k. `compression` is the stream's biCompression value
    * (0 = BI_RGB uncompressed; a fourcc like MJPG otherwise; -1 when no
    * strf was found), `bitCount` its biBitCount. */
  final case class VideoClip(frames: IndexedSeq[Array[Byte]],
                             usPerFrame: Long, width: Int, height: Int,
                             compression: Long = -1L, bitCount: Int = 0,
                             palette: Array[Int] = Array.empty,
                             masks: Array[Long] = Array.empty)

  /** REAL video container decode for MJPEG-in-AVI. The RIFF/AVI chunk
    * layout and the MJPG fourcc are public formats, and every frame payload
    * is a standalone JPEG the JDK's ImageIO already decodes — so unlike
    * inter-frame codecs this path needs no external library. Walks the
    * RIFF tree, collects `##dc`/`##db` stream-data chunks as frames, and
    * reads timing + dimensions from the `avih` main header. None when the
    * bytes are not a RIFF AVI container. */
  def decodeAvi(content: Array[Byte]): Option[VideoClip] = {
    def u32(o: Int): Long =
      (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
      ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (content == null || content.length < 12 || fourcc(0) != "RIFF" ||
        fourcc(8) != "AVI ") return None
    try {
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      var usPerFrame = 0L; var w = 0; var h = 0
      var compression = -1L; var bitCount = 0
      var palette: Array[Int] = Array.empty
      var masks: Array[Long] = Array.empty
      // fccType of the most recent strh: an AVI may list its audio stream
      // first, and parsing that stream's strf (WAVEFORMATEX) as a
      // BITMAPINFOHEADER would capture garbage compression/bitCount —
      // only accept a strf that follows a 'vids' header (or none at all,
      // for minimal writers that skip strh)
      var streamType = ""
      // depth-capped: RIFF nests LISTs a handful deep in real files; a
      // crafted container with thousands of nested LISTs must not blow
      // the stack (StackOverflowError is not an Exception — the catch
      // below would not contain it)
      def walk(from: Int, to: Int, depth: Int = 0): Unit = {
        if (depth > 16) return
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(o)
          val sz = u32(o + 4).toInt
          val body = o + 8
          // sz is attacker-controlled: a value that decodes to -8 or -9
          // would leave the cursor unmoved below and spin this loop
          // forever — a non-recursive hang no depth cap or catch contains
          if (sz < 0) return
          if (body + sz > to) return // truncated chunk: keep what we have
          id match {
            case "LIST" => walk(body + 4, body + sz, depth + 1) // skip the list type
            case "avih" if sz >= 40 =>
              usPerFrame = u32(body)
              w = u32(body + 32).toInt; h = u32(body + 36).toInt
            case "strh" if sz >= 4 => streamType = fourcc(body)
            case "strf" if sz >= 20 && compression == -1L &&
                           (streamType == "vids" || streamType == "") =>
              // video stream format (BITMAPINFOHEADER): biBitCount @12+2,
              // biCompression @16 — 0 means BI_RGB raw bottom-up DIB rows,
              // 1 means BI_RLE8 (palettized run-length, color table after
              // the 40-byte header as RGBQUAD entries)
              bitCount = (u32(body + 12) >> 16).toInt
              compression = u32(body + 16)
              // BI_BITFIELDS (3): three channel masks (R, G, B DWORDs)
              // directly after the 40-byte header (public BMP v3 layout)
              if (compression == 3L && sz >= 52)
                masks = Array(u32(body + 40), u32(body + 44), u32(body + 48))
              if (sz > 40 && bitCount <= 8) {
                val clrUsed = u32(body + 32).toInt
                val n = math.min(if (clrUsed > 0) clrUsed else 1 << bitCount,
                  (sz - 40) / 4)
                palette = Array.tabulate(n) { i =>
                  val o = body + 40 + i * 4 // RGBQUAD: B, G, R, reserved
                  ((content(o + 2) & 0xff) << 16) |
                  ((content(o + 1) & 0xff) << 8) | (content(o) & 0xff)
                }
              }
            case _ if sz > 0 && id.length == 4 && id.charAt(2) == 'd' &&
                      (id.charAt(3) == 'c' || id.charAt(3) == 'b') =>
              frames += java.util.Arrays.copyOfRange(content, body, body + sz)
            case _ => ()
          }
          o = body + sz + (sz & 1) // chunks pad to even offsets
        }
      }
      walk(12, math.min(content.length, 8 + u32(4).toInt))
      Some(VideoClip(frames.result(), usPerFrame, w, h, compression,
        bitCount, palette, masks))
    } catch { case _: Exception => None }
  }

  /** Decode one frame of `clip` to pixels: BI_RGB streams carry raw
    * bottom-up DIB rows (no per-frame header, so ImageIO can't see them —
    * the dimensions come from the container's strf), anything else goes
    * through ImageIO (covers MJPG's per-frame JPEGs). */
  def decodeFrame(clip: VideoClip, frame: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (clip.compression == 0L && (clip.bitCount == 24 || clip.bitCount == 32) &&
        clip.width > 0 && clip.height > 0)
      decodeDib(frame, clip.width, clip.height, clip.bitCount)
    else if (clip.compression == 1L && clip.bitCount == 8 &&
             clip.width > 0 && clip.height > 0 && clip.palette.nonEmpty)
      decodeRle8(frame, clip.width, clip.height, clip.palette)
    else if (clip.compression == 3L && (clip.bitCount == 16 || clip.bitCount == 32) &&
             clip.width > 0 && clip.height > 0 && clip.masks.length == 3)
      decodeBitfields(frame, clip.width, clip.height, clip.bitCount, clip.masks)
    else decodeImage(frame)

  /** Raw DIB frame → image: rows bottom-up, each padded to a 4-byte
    * boundary, pixels little-endian BGR(A) — the on-disk layout Windows
    * bitmaps and BI_RGB AVI streams share (public BITMAPINFOHEADER spec). */
  private def decodeDib(bytes: Array[Byte], w: Int, h: Int,
                        bitCount: Int): Option[java.awt.image.BufferedImage] = {
    val bpp = bitCount / 8
    val stride = ((w * bpp + 3) / 4) * 4
    // Long math: container-declared w*h are attacker-controlled, and an
    // Int-overflowing stride*h lets a tiny frame through to a giant (or
    // negative-size) image allocation
    if (bytes == null || bytes.length.toLong < stride.toLong * h ||
        w.toLong * h > MaxDecodedPixels) return None
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val o = row + x * bpp
        val rgb = ((bytes(o + 2) & 0xff) << 16) |
                  ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  /** BI_BITFIELDS frame → image: bottom-up padded rows of 16- or 32-bit
    * little-endian pixels; each channel is extracted with its mask from
    * the strf header and rescaled to 8 bits by its mask width (the public
    * BMP v3 layout — RGB565 AVIs are the common case). A zero mask yields
    * a zero channel rather than dividing by zero. */
  private def decodeBitfields(bytes: Array[Byte], w: Int, h: Int,
                              bitCount: Int, masks: Array[Long])
      : Option[java.awt.image.BufferedImage] = {
    val bpp = bitCount / 8
    val stride = ((w * bpp + 3) / 4) * 4
    if (bytes == null || bytes.length.toLong < stride.toLong * h ||
        w.toLong * h > MaxDecodedPixels) return None
    // per-channel shift (mask trailing zeros) + max value, precomputed
    val shifts = masks.map(m => if (m == 0) 0 else java.lang.Long.numberOfTrailingZeros(m))
    val maxes = masks.indices.map(i => (masks(i) >>> shifts(i)).toInt).toArray
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val o = row + x * bpp
        var px = 0L
        var b = 0
        while (b < bpp) { px |= (bytes(o + b) & 0xffL) << (8 * b); b += 1 }
        def chan(i: Int): Int =
          if (maxes(i) <= 0) 0
          else ((((px & masks(i)) >>> shifts(i)) * 255L) / maxes(i)).toInt
        img.setRGB(x, y, (chan(0) << 16) | (chan(1) << 8) | chan(2))
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  /** MS-RLE (BI_RLE8) frame → image: bottom-up rows of (count, palette
    * index) byte pairs; count 0 escapes to EOL (0), EOD (1), delta move
    * (2, dx, dy), or an absolute run of `n >= 3` literal indices padded to
    * a word boundary — the public BI_RLE8 spec (Windows BMP/AVI). Pixels
    * the stream never writes (delta skips / early EOD) stay palette[0],
    * matching decoders that clear to the first palette entry. */
  private def decodeRle8(bytes: Array[Byte], w: Int, h: Int,
                         palette: Array[Int]): Option[java.awt.image.BufferedImage] = {
    // unlike the raw-DIB paths the frame length implies nothing about
    // w*h (RLE compresses), so the pixel cap is the only allocation guard
    if (bytes == null || bytes.length < 2 ||
        w.toLong * h > MaxDecodedPixels) return None
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def color(idx: Int): Int = palette(math.min(idx, palette.length - 1))
    val bg = color(0)
    var y0 = 0
    while (y0 < h) { var x0 = 0; while (x0 < w) { img.setRGB(x0, h - 1 - y0, bg); x0 += 1 }; y0 += 1 }
    var x = 0; var y = 0; var o = 0 // (x, y) in bottom-up DIB space
    def put(idx: Int): Unit = {
      if (x < w && y < h) img.setRGB(x, h - 1 - y, color(idx))
      x += 1
    }
    try {
      while (o + 1 < bytes.length) {
        val n = bytes(o) & 0xff; val v = bytes(o + 1) & 0xff; o += 2
        if (n > 0) { var i = 0; while (i < n) { put(v); i += 1 } } // encoded run
        else v match {
          case 0 => x = 0; y += 1                  // end of line
          case 1 => return Some(img)               // end of data
          case 2 =>                                // delta: skip dx right, dy up
            if (o + 1 >= bytes.length) return Some(img)
            x += bytes(o) & 0xff; y += bytes(o + 1) & 0xff; o += 2
          case cnt =>                              // absolute run of cnt indices
            var i = 0
            while (i < cnt && o < bytes.length) { put(bytes(o) & 0xff); o += 1; i += 1 }
            if ((cnt & 1) == 1) o += 1             // pad to word boundary
        }
      }
      Some(img)
    } catch { case _: Exception => None }
  }

  /** Real video features: the element-wise mean of the per-frame image
    * features over every decodable frame — deterministic, frame-count
    * independent. Falls back to None when no frame decodes (the caller
    * then uses the stub, keeping the column shape). */
  private def videoFeatures(clip: VideoClip, dim: Int): Option[Array[Float]] = {
    val acc = new Array[Double](dim)
    var n = 0
    clip.frames.foreach { f =>
      decodeFrame(clip, f).foreach { img =>
        val feat = imageFeatures(img, dim)
        var i = 0
        while (i < dim) { acc(i) += feat(i); i += 1 }
        n += 1
      }
    }
    if (n == 0) None
    else Some(acc.map(v => (v / n).toFloat))
  }

  /** Mean frame features over an MPEG-1 elementary stream's I-frames
    * (ops/Mpeg1.scala — real intra decode: VLC, dequant, IDCT). */
  private def mpegFeatures(v: Mpeg1.Mpeg1Video, dim: Int): Option[Array[Float]] = {
    val acc = new Array[Double](dim)
    var n = 0
    v.frames.foreach { img =>
      val feat = imageFeatures(img, dim)
      var i = 0
      while (i < dim) { acc(i) += feat(i); i += 1 }
      n += 1
    }
    if (n == 0) None else Some(acc.map(x => (x / n).toFloat))
  }

  /** STUB decoder for MODERN video codecs (H.264/H.265/VP9/AV1).
    * MJPEG, BI_RGB, MS-RLE, BI_BITFIELDS, and full MPEG-1 (I, P, AND B
    * pictures with motion compensation) decode for REAL above; real
    * deployments replace this with an actual codec (JNI/javacv) —
    * everything around it (batching, schema, nullability) stays
    * identical. Deterministic: features derive from the byte content so
    * tests can assert exact values. */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real inter-frame video codec goes here; deterministic fake below
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
    * Images (ImageIO), audio (javax.sound), and AVI video — both MJPEG
    * and uncompressed BI_RGB streams — all take real decode paths;
    * anything else falls to the deterministic stub.
    * Runs per-partition in fixed-size batches (the
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
              case None => decodeAvi(bytes)
                .flatMap(videoFeatures(_, dim))
                .orElse(Mpeg1.decode(bytes).flatMap(mpegFeatures(_, dim)))
                .getOrElse(decodeStub(bytes, dim))
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

  /** Frame sampling for video rows: each video explodes into `n` sample
    * rows carrying the sample index, its timestamp, and — when the content
    * is a decodable MJPEG-AVI — the REAL encoded frame bytes (`frame`),
    * picked evenly across the container without decoding unsampled frames.
    * Undecodable video content keeps the previous shape (null `frame`,
    * timestamps interpolated from metadata duration). Runs per-partition,
    * preserving partitioning — no shuffle. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val vids = df.filter(col("media_type") === "video")
    val outSchema = vids.schema
      .add(StructField("frame_idx", IntegerType, nullable = false))
      .add(StructField("frame_ts_ms", LongType))
      .add(StructField("frame", BinaryType))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val cIdx = vids.schema.fieldIndex("content")
    val mIdx = vids.schema.fieldNames.indexOf("meta")
    val durField =
      if (mIdx >= 0)
        vids.schema(mIdx).dataType.asInstanceOf[StructType]
          .fieldNames.indexOf("duration_ms")
      else -1
    vids.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.get(cIdx) match {
          case b: Array[Byte] => b
          case _ => Array.emptyByteArray
        }
        // frame payloads: AVI chunks verbatim; MPEG-1 I-frames re-encoded
        // as PNG on demand — only the n SAMPLED indices pay an encode
        // (a 256-I-frame clip sampled at n=3 must not do 256 encodes),
        // memoized because the index formula can repeat an index
        val clip: Option[(Int, Long, Int => Array[Byte])] =
          decodeAvi(bytes).filter(_.frames.nonEmpty)
            .map(c => (c.frames.length, c.usPerFrame, (i: Int) => c.frames(i)))
            .orElse(Mpeg1.decode(bytes).filter(_.frames.nonEmpty).map { v =>
              val png = scala.collection.mutable.HashMap.empty[Int, Array[Byte]]
              (v.frames.length, v.usPerFrame, (i: Int) =>
                png.getOrElseUpdate(i, {
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(v.frames(i), "png", bos)
                  bos.toByteArray
                }))
            })
        val metaDur: Any =
          if (mIdx < 0 || durField < 0 || r.isNullAt(mIdx)) null
          else r.getStruct(mIdx).get(durField)
        (0 until n).iterator.map { j =>
          clip match {
            case Some((nFrames, usPerFrame, frameAt)) =>
              val src = (j.toLong * nFrames / n).toInt
              Row.fromSeq(r.toSeq :+ j :+ (src * usPerFrame / 1000L)
                :+ frameAt(src))
            case None =>
              val ts: Any = metaDur match {
                case d: Long => d * j / n
                case d: Int => d.toLong * j / n
                case _ => null
              }
              Row.fromSeq(r.toSeq :+ j :+ ts :+ null)
          }
        }
      }
    }(enc)
  }

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

  /** Encode a solid-color w×h JPEG in memory (frame payload for testAvi —
    * JPEG is lossy, but a solid primary color keeps its dominant channel). */
  def testJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Assemble a minimal-but-spec-correct MJPEG AVI in memory: RIFF('AVI '
    * LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' '00dc' × frames)).
    * One solid-color JPEG frame per entry of `frameRgbs`. Drives the real
    * video decode path in tests without any fixture files. */
  def testAvi(frameRgbs: Seq[Int], w: Int = 8, h: Int = 8,
              usPerFrame: Long = 40000L): Array[Byte] =
    assembleAvi(frameRgbs.map(testJpeg(w, h, _)), w, h, usPerFrame,
      handler = "MJPG", compressionFourcc = Some("MJPG"))

  /** BI_RGB (uncompressed) AVI: one solid-color raw DIB frame per entry —
    * bottom-up rows padded to 4 bytes, BGR byte order, biCompression=0.
    * Drives the uncompressed decode path end-to-end without fixtures. */
  def testRgbAvi(frameRgbs: Seq[Int], w: Int = 8, h: Int = 8,
                 usPerFrame: Long = 40000L): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frames = frameRgbs.map { rgb =>
      val f = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = y * stride + x * 3
          f(o) = (rgb & 0xff).toByte            // B
          f(o + 1) = ((rgb >> 8) & 0xff).toByte // G
          f(o + 2) = ((rgb >> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      f
    }
    assembleAvi(frames, w, h, usPerFrame, handler = "DIB ",
      compressionFourcc = None)
  }

  /** MS-RLE (BI_RLE8) AVI: one solid-color frame per entry, each encoded
    * as per-row (w, index) runs + EOL, final EOD, over a palette holding
    * the frame colors — drives the palettized run-length decode path
    * end-to-end without fixtures. Lossless like BI_RGB. */
  def testRle8Avi(frameRgbs: Seq[Int], w: Int = 8, h: Int = 8,
                  usPerFrame: Long = 40000L): Array[Byte] = {
    require(w <= 255, "solid-row RLE run length is one byte")
    val palette = frameRgbs.distinct
    val frames = frameRgbs.map { rgb =>
      val idx = palette.indexOf(rgb)
      val b = new java.io.ByteArrayOutputStream()
      (0 until h).foreach { _ =>
        b.write(w); b.write(idx) // one full-row run
        b.write(0); b.write(0)   // EOL
      }
      b.write(0); b.write(1)     // EOD
      b.toByteArray
    }
    assembleAvi(frames, w, h, usPerFrame, handler = "MRLE",
      compressionFourcc = None, bitCount = 8, compressionValue = 1L,
      palette = palette)
  }

  /** BI_BITFIELDS AVI (RGB565): one solid-color frame per entry, 16-bit
    * little-endian pixels with the standard 0xF800/0x07E0/0x001F channel
    * masks after the header — drives the masked-channel decode path
    * end-to-end without fixtures. Pure-channel colors survive the 5/6-bit
    * quantization exactly (31->255, 63->255), so oracles can pin 1.0. */
  def testBitfieldsAvi(frameRgbs: Seq[Int], w: Int = 8, h: Int = 8,
                       usPerFrame: Long = 40000L): Array[Byte] = {
    val stride = ((w * 2 + 3) / 4) * 4
    val frames = frameRgbs.map { rgb =>
      val r5 = ((rgb >> 16) & 0xff) >> 3
      val g6 = ((rgb >> 8) & 0xff) >> 2
      val b5 = (rgb & 0xff) >> 3
      val px = (r5 << 11) | (g6 << 5) | b5
      val f = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = y * stride + x * 2
          f(o) = (px & 0xff).toByte
          f(o + 1) = ((px >> 8) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      f
    }
    assembleAvi(frames, w, h, usPerFrame, handler = "DIB ",
      compressionFourcc = None, bitCount = 16, compressionValue = 3L,
      bitfieldMasks = Seq(0xF800L, 0x07E0L, 0x001FL))
  }

  private def assembleAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                          usPerFrame: Long, handler: String,
                          compressionFourcc: Option[String],
                          bitCount: Int = 24,
                          compressionValue: Long = 0L,
                          palette: Seq[Int] = Nil,
                          bitfieldMasks: Seq[Long] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def build(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); f(b); b.toByteArray
    }
    def bu32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
      b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
    }
    val avih = build { b =>
      bu32(b, usPerFrame); bu32(b, 0); bu32(b, 0); bu32(b, 0)
      bu32(b, frames.length.toLong); bu32(b, 0); bu32(b, 1); bu32(b, 0)
      bu32(b, w.toLong); bu32(b, h.toLong)
      (0 until 4).foreach(_ => bu32(b, 0)) // dwReserved
    }
    val strh = build { b =>
      b.write("vids".getBytes("US-ASCII")); b.write(handler.getBytes("US-ASCII"))
      bu32(b, 0); bu32(b, 0); bu32(b, 0)       // flags, prio+lang, initial
      bu32(b, usPerFrame); bu32(b, 1000000L)   // scale/rate = frame period
      bu32(b, 0); bu32(b, frames.length.toLong)
      bu32(b, 0); bu32(b, 0); bu32(b, 0)       // bufSize, quality, sampleSize
      bu32(b, (w.toLong << 16) | h.toLong)     // rcFrame (packed, unused)
      bu32(b, 0)
    }
    val strf = build { b => // BITMAPINFOHEADER (+ RGBQUAD color table)
      bu32(b, 40); bu32(b, w.toLong); bu32(b, h.toLong)
      bu32(b, (bitCount.toLong << 16) | 1L)    // biPlanes=1, biBitCount
      compressionFourcc match {                // biCompression (numeric
        case Some(fc) => b.write(fc.getBytes("US-ASCII")) // or fourcc)
        case None => bu32(b, compressionValue)
      }
      bu32(b, w.toLong * h * (bitCount / 8).max(1))
      bu32(b, 0); bu32(b, 0)
      bu32(b, palette.size.toLong); bu32(b, 0) // biClrUsed, biClrImportant
      bitfieldMasks.foreach(bu32(b, _))        // BI_BITFIELDS R/G/B masks
      palette.foreach { rgb =>                 // RGBQUAD: B, G, R, reserved
        b.write(rgb & 0xff); b.write((rgb >> 8) & 0xff)
        b.write((rgb >> 16) & 0xff); b.write(0)
      }
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = build { b =>
      b.write("LIST".getBytes("US-ASCII")); bu32(b, (body.length + 4).toLong)
      b.write(kind.getBytes("US-ASCII")); b.write(body)
    }
    def rawChunk(id: String, body: Array[Byte]): Array[Byte] = build { b =>
      b.write(id.getBytes("US-ASCII")); bu32(b, body.length.toLong)
      b.write(body)
      if ((body.length & 1) == 1) b.write(0)
    }
    val strl = list("strl", rawChunk("strh", strh) ++ rawChunk("strf", strf))
    val hdrl = list("hdrl", rawChunk("avih", avih) ++ strl)
    val movi = list("movi",
      frames.flatMap(f => rawChunk("00dc", f)).toArray)
    val payload = hdrl ++ movi
    ascii("RIFF"); u32((payload.length + 4).toLong); ascii("AVI ")
    bos.write(payload)
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
