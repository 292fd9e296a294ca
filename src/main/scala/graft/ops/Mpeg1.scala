package graft.ops

import java.awt.image.BufferedImage
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM MPEG-1 video (ISO/IEC 11172-2) INTRA-frame codec.
  *
  * Decodes I-pictures of an MPEG-1 video elementary stream — sequence
  * header (incl. loadable intra quantizer matrix), GOP/picture headers,
  * slice layer, intra macroblocks with DC prediction, the dct_coeff VLC
  * (common codes through the 13-bit group plus FULL escape coding — the
  * rarer 14-16-bit tail codes abort the frame rather than misdecode;
  * every run/level also has an escape encoding, so cooperating encoders
  * lose nothing), dequantization with mismatch control, inverse zigzag,
  * 8×8 IDCT, 4:2:0 upsample and BT.601-style YCbCr→RGB. P/B pictures
  * are skipped (their motion compensation is the declared stub boundary,
  * like H.264 in Multimodal): frame sampling over I-frames is exactly
  * what a training-data pipeline wants from a video corpus anyway.
  *
  * The companion [[encodeIntra]] writes a spec-shaped I-only elementary
  * stream (used by tests/oracles as the deterministic fixture, the same
  * pattern as Multimodal.testAvi): solid blocks carry only the DC
  * coefficient, whose reconstruction is exact through the IDCT, so the
  * decoder's output channel means are pinned, not approximate.
  */
object Mpeg1 {

  final case class Mpeg1Video(frames: IndexedSeq[BufferedImage],
                              usPerFrame: Long)

  /** Allocation bounds for attacker-controlled header dimensions: one
    * frame ≤ 2048×2048 pixels (covers 1080p; a 12-bit header maxes at
    * 4095×4095 ≈ 67 MB/frame, which a few-KB crafted stream must not
    * command), whole stream ≤ 16M pixels (~64 MB of RGB). */
  private val MaxFramePixels: Long = 2048L * 2048L
  private val MaxTotalPixels: Long = 16L * 1024L * 1024L

  // ------------------------------------------------------------ bit I/O

  private final class BitReader(data: Array[Byte], startBit: Long, endBit: Long) {
    var pos: Long = startBit
    def bitsLeft: Long = endBit - pos
    private def bitAt(p: Long): Int =
      if (p >= endBit) 0 // zero-fill past the end (start-code probing)
      else (data((p >>> 3).toInt) >> (7 - (p & 7)).toInt) & 1
    def read(n: Int): Int = {
      if (pos + n > endBit) throw new IllegalStateException("bitstream underrun")
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bitAt(pos); pos += 1; i += 1 }
      v
    }
    def peek(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bitAt(pos + i); i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) { bytes.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (nAcc != 0) put(0, 1)
    def startCode(code: Int): Unit = { align(); put(0, 8); put(0, 8); put(1, 8); put(code, 8) }
    def result(): Array[Byte] = { align(); bytes.toByteArray }
  }

  // ------------------------------------------------------------- tables

  /** Default intra quantizer matrix (11172-2 §2.4.3.2), raster order. */
  private val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** Zigzag scan: position i of the coefficient stream → raster index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** picture_rate code → microseconds per frame (11172-2 table 2-D.4). */
  private val RateUs: Array[Long] = Array(0L, 41708L, 41667L, 40000L,
    33367L, 33333L, 20000L, 16683L, 16667L)

  /** macroblock_address_increment (table B.1), code string → increment. */
  private val AddrIncTable: Map[String, Int] = Map(
    "1" -> 1, "011" -> 2, "010" -> 3, "0011" -> 4, "0010" -> 5,
    "00011" -> 6, "00010" -> 7, "0000111" -> 8, "0000110" -> 9,
    "00001011" -> 10, "00001010" -> 11, "00001001" -> 12, "00001000" -> 13,
    "00000111" -> 14, "00000110" -> 15,
    "0000010111" -> 16, "0000010110" -> 17, "0000010101" -> 18,
    "0000010100" -> 19, "0000010011" -> 20, "0000010010" -> 21,
    "00000100011" -> 22, "00000100010" -> 23, "00000100001" -> 24,
    "00000100000" -> 25, "00000011111" -> 26, "00000011110" -> 27,
    "00000011101" -> 28, "00000011100" -> 29, "00000011011" -> 30,
    "00000011010" -> 31, "00000011001" -> 32, "00000011000" -> 33)
  private val AddrEscape = "00000001000" // +33, then another code
  private val AddrStuffing = "00000001111" // discarded

  /** dct_coeff run/level codes WITHOUT the trailing sign bit (table B.5,
    * through the 13-bit group; '10' = EOB and the escape '000001' are
    * handled separately). */
  private val AcTable: Map[String, (Int, Int)] = Map(
    "11" -> ((0, 1)), "011" -> ((1, 1)),
    "0100" -> ((0, 2)), "0101" -> ((2, 1)),
    "00101" -> ((0, 3)), "00111" -> ((3, 1)), "00110" -> ((4, 1)),
    "000110" -> ((1, 2)), "000111" -> ((5, 1)), "000101" -> ((6, 1)),
    "000100" -> ((7, 1)),
    "0000110" -> ((0, 4)), "0000100" -> ((2, 2)), "0000111" -> ((8, 1)),
    "0000101" -> ((9, 1)),
    "00100110" -> ((0, 5)), "00100001" -> ((0, 6)), "00100101" -> ((1, 3)),
    "00100100" -> ((3, 2)), "00100111" -> ((10, 1)), "00100011" -> ((11, 1)),
    "00100010" -> ((12, 1)), "00100000" -> ((13, 1)),
    "0000001010" -> ((0, 7)), "0000001100" -> ((1, 4)),
    "0000001011" -> ((2, 3)), "0000001111" -> ((4, 2)),
    "0000001001" -> ((5, 2)), "0000001110" -> ((14, 1)),
    "0000001101" -> ((15, 1)), "0000001000" -> ((16, 1)),
    "000000011101" -> ((0, 8)), "000000011000" -> ((0, 9)),
    "000000010011" -> ((0, 10)), "000000010000" -> ((0, 11)),
    "000000011011" -> ((1, 5)), "000000010100" -> ((2, 4)),
    "000000011100" -> ((3, 3)), "000000010010" -> ((4, 3)),
    "000000011110" -> ((6, 2)), "000000010101" -> ((7, 2)),
    "000000010001" -> ((8, 2)), "000000011111" -> ((17, 1)),
    "000000011010" -> ((18, 1)), "000000011001" -> ((19, 1)),
    "000000010111" -> ((20, 1)), "000000010110" -> ((21, 1)),
    "0000000011010" -> ((0, 12)), "0000000011001" -> ((0, 13)),
    "0000000011000" -> ((0, 14)), "0000000010111" -> ((0, 15)),
    "0000000010110" -> ((1, 6)), "0000000010101" -> ((1, 7)),
    "0000000010100" -> ((2, 5)), "0000000010011" -> ((3, 4)),
    "0000000010010" -> ((5, 3)), "0000000010001" -> ((9, 2)),
    "0000000010000" -> ((10, 2)), "0000000011111" -> ((22, 1)),
    "0000000011110" -> ((23, 1)), "0000000011101" -> ((24, 1)),
    "0000000011100" -> ((25, 1)), "0000000011011" -> ((26, 1)))

  // prefix-decoded views: length → (value → payload)
  private def byLength[V](m: Map[String, V]): Map[Int, Map[Int, V]] =
    m.groupBy(_._1.length).view.mapValues(_.map { case (k, v) =>
      Integer.parseInt(k, 2) -> v }.toMap).toMap
  private val AddrByLen = byLength(AddrIncTable)
  private val AcByLen = byLength(AcTable)

  private def decodePrefix[V](br: BitReader, byLen: Map[Int, Map[Int, V]],
                              maxLen: Int): Option[V] = {
    var len = 1
    while (len <= maxLen) {
      byLen.get(len).flatMap(_.get(br.peek(len))) match {
        case Some(v) => br.read(len); return Some(v)
        case None => len += 1
      }
    }
    None
  }

  // --------------------------------------------------------------- IDCT

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** f(x,y) = 1/4 ΣΣ C(u)C(v) F(u,v) cos.. — direct separable form. */
  private def idct8x8(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows: over u for each (v fixed) — first pass over x
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          s += cu * in(v * 8 + u) * CosTab(u * 8 + x)
          u += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          val cv = if (vv == 0) 0.70710678118654752 else 1.0
          s += cv * tmp(vv * 8 + x) * CosTab(vv * 8 + y)
          vv += 1
        }
        val p = math.round(s / 4.0).toInt
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------ decoder

  def decode(content: Array[Byte], maxFrames: Int = 256): Option[Mpeg1Video] = {
    if (content == null || content.length < 12 ||
        content(0) != 0 || content(1) != 0 || content(2) != 1 ||
        (content(3) & 0xff) != 0xB3) return None
    try {
      // start-code scan (byte level; codes are byte-aligned by spec)
      val codes = ArrayBuffer[(Int, Int)]() // (code, offset AFTER the 4 bytes)
      var i = 0
      while (i + 3 < content.length) {
        if (content(i) == 0 && content(i + 1) == 0 && content(i + 2) == 1) {
          codes += (((content(i + 3) & 0xff), i + 4)); i += 4
        } else i += 1
      }
      var w = 0; var h = 0; var usPerFrame = 33333L
      var intraQ = DefaultIntraQ
      var mbW = 0; var mbH = 0
      var yPlane: Array[Int] = null
      var cbPlane: Array[Int] = null
      var crPlane: Array[Int] = null
      var picIsIntra = false
      var picOk = false
      val frames = ArrayBuffer[BufferedImage]()

      def emit(): Unit = if (picIsIntra && picOk && yPlane != null &&
                             frames.size < maxFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yy = yPlane(y * (mbW * 16) + x)
            val cb = cbPlane((y / 2) * (mbW * 8) + (x / 2))
            val cr = crPlane((y / 2) * (mbW * 8) + (x / 2))
            def cl(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
            val r = cl(yy + 1.402 * (cr - 128))
            val g = cl(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
            val b = cl(yy + 1.772 * (cb - 128))
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        frames += img
      }

      var ci = 0
      while (ci < codes.length) {
        val (code, off) = codes(ci)
        val end = if (ci + 1 < codes.length) codes(ci + 1)._2 - 4 else content.length
        val br = new BitReader(content, off.toLong * 8, end.toLong * 8)
        code match {
          case 0xB3 =>
            val nw = br.read(12); val nh = br.read(12)
            // header dimensions are attacker-controlled (these bytes flow
            // straight from corpus rows via extractFeatures): bound the
            // per-frame AND whole-stream pixel allocation like decodeAvi
            // bounds its containers — a few-KB stream must not command
            // gigabytes of BufferedImages. Keep-what-we-have, like bad
            // slices: a corrupt trailing header must not discard frames
            // already decoded
            if (nw.toLong * nh > MaxFramePixels) {
              emit() // flush the pending picture before going dead
              picOk = false; picIsIntra = false; mbW = 0; mbH = 0
            } else { w = nw; h = nh; mbW = (w + 15) / 16; mbH = (h + 15) / 16 }
            br.read(4) // pel aspect
            val rate = br.read(4)
            if (rate >= 1 && rate <= 8) usPerFrame = RateUs(rate)
            br.read(18); br.read(1); br.read(10); br.read(1)
            if (br.read(1) == 1) { // load_intra_quantizer_matrix, zigzag order
              val q = new Array[Int](64)
              var k = 0
              while (k < 64) { q(Zigzag(k)) = br.read(8); k += 1 }
              intraQ = q
            }
          case 0x00 => // picture header: emit the previous picture first
            emit()
            picOk = false
            br.read(10) // temporal reference
            val ptype = br.read(3)
            picIsIntra = ptype == 1
            val pixelBudgetLeft =
              frames.size < maxFrames &&
                (frames.size.toLong + 1) * w * h <= MaxTotalPixels
            if (picIsIntra && mbW > 0 && pixelBudgetLeft) {
              yPlane = new Array[Int](mbW * 16 * mbH * 16)
              cbPlane = new Array[Int](mbW * 8 * mbH * 8)
              crPlane = new Array[Int](mbW * 8 * mbH * 8)
            } else picIsIntra = false // over budget: skip, keep what we have
          case sc if sc >= 0x01 && sc <= 0xAF =>
            if (picIsIntra && mbW > 0) {
              // a bad slice (unsupported VLC tail, malformed bits) aborts
              // THIS picture only — earlier frames already decoded stay,
              // later pictures still get their chance
              try {
                decodeSlice(br, sc, mbW, mbH, intraQ, yPlane, cbPlane, crPlane)
                picOk = true
              } catch {
                case e: Exception =>
                  if (sys.props.contains("graft.mpeg1.debug")) e.printStackTrace()
                  picOk = false; picIsIntra = false
              }
            }
          case _ => () // GOP, user data, extensions, sequence end
        }
        ci += 1
      }
      emit() // last picture
      if (frames.isEmpty || w <= 0 || h <= 0) None
      else Some(Mpeg1Video(frames.toIndexedSeq, usPerFrame))
    } catch {
      case e: Exception =>
        if (sys.props.contains("graft.mpeg1.debug")) e.printStackTrace()
        None
    }
  }

  private def decodeSlice(br: BitReader, sliceCode: Int, mbW: Int, mbH: Int,
                          intraQ: Array[Int], yP: Array[Int],
                          cbP: Array[Int], crP: Array[Int]): Unit = {
    var qScale = br.read(5)
    // extra_information_slice: '1'-flagged bytes, then a consumed '0'
    while (br.peek(1) == 1) { br.read(9) }
    br.read(1)
    var dcY = 1024; var dcCb = 1024; var dcCr = 1024
    var mbAddr = (sliceCode - 1) * mbW - 1
    val coeffs = new Array[Int](64)
    val pix = new Array[Int](64)

    def decodeBlock(isLuma: Boolean, pred: Int): Int = {
      java.util.Arrays.fill(coeffs, 0)
      // DC size (tables B.2/B.3)
      val size =
        if (isLuma) {
          br.peek(2) match {
            case 0 => br.read(2); 1
            case 1 => br.read(2); 2
            case _ =>
              if (br.peek(3) == 4) { br.read(3); 0 }
              else if (br.peek(3) == 5) { br.read(3); 3 }
              else if (br.peek(3) == 6) { br.read(3); 4 }
              else {
                // 1110=5, 11110=6, 111110=7, 1111110=8
                var ones = 3; br.read(3)
                while (ones < 7 && br.read(1) == 1) ones += 1
                ones + 2
              }
          }
        } else {
          br.peek(2) match {
            case 0 => br.read(2); 0
            case 1 => br.read(2); 1
            case 2 => br.read(2); 2
            case _ =>
              // 110=3, 1110=4, 11110=5, 111110=6, 1111110=7, 11111110=8
              var ones = 2; br.read(2)
              while (ones < 8 && br.read(1) == 1) ones += 1
              ones + 1
          }
        }
      val diff =
        if (size == 0) 0
        else {
          val v = br.read(size)
          if ((v >> (size - 1)) != 0) v else v - ((1 << size) - 1)
        }
      val reconDc = pred + diff * 8
      coeffs(0) = reconDc
      // AC run/level until EOB
      var idx = 0
      var done = false
      while (!done) {
        if (br.peek(2) == 2) { br.read(2); done = true } // '10' EOB
        else if (br.peek(6) == 1) { // '000001' escape
          br.read(6)
          val run = br.read(6)
          val l8 = br.read(8)
          val level =
            if (l8 == 0) br.read(8)
            else if (l8 == 128) br.read(8) - 256
            else if (l8 > 128) l8 - 256
            else l8
          idx += run + 1
          if (idx > 63 || level == 0) throw new IllegalStateException("bad escape")
          coeffs(Zigzag(idx)) = dequantIntra(level, qScale, intraQ(Zigzag(idx)))
        } else decodePrefix(br, AcByLen, 13) match {
          case Some((run, lvl)) =>
            val sign = br.read(1)
            val level = if (sign == 1) -lvl else lvl
            idx += run + 1
            if (idx > 63) throw new IllegalStateException("coeff overflow")
            coeffs(Zigzag(idx)) = dequantIntra(level, qScale, intraQ(Zigzag(idx)))
          case None =>
            // a 14-16-bit tail code (see scaladoc): abort the frame loudly
            throw new IllegalStateException("unsupported dct_coeff VLC tail")
        }
      }
      idct8x8(coeffs, pix)
      reconDc
    }

    def place(plane: Array[Int], stride: Int, px: Int, py: Int): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          plane((py + y) * stride + (px + x)) = pix(y * 8 + x)
          x += 1
        }
        y += 1
      }
    }

    var more = br.bitsLeft > 23 && br.peek(23) != 0
    while (more) {
      // address increment: stuffing discarded, escapes accumulate
      var inc = 0
      var reading = true
      while (reading) {
        if (br.peek(11) == Integer.parseInt(AddrStuffing, 2)) br.read(11)
        else if (br.peek(11) == Integer.parseInt(AddrEscape, 2)) {
          br.read(11); inc += 33
        } else decodePrefix(br, AddrByLen, 11) match {
          case Some(v) => inc += v; reading = false
          case None => throw new IllegalStateException("bad addr increment")
        }
      }
      mbAddr += inc
      if (inc > 1) { dcY = 1024; dcCb = 1024; dcCr = 1024 } // skipped MBs reset DC pred
      if (mbAddr >= mbW * mbH) throw new IllegalStateException("mb overflow")
      // macroblock_type, I-pictures (table B.2a): 1=intra, 01=intra+quant
      if (br.read(1) == 0) {
        if (br.read(1) != 1) throw new IllegalStateException("bad mb type")
        qScale = br.read(5)
      }
      val mbX = mbAddr % mbW
      val mbY = mbAddr / mbW
      var b = 0
      while (b < 4) {
        dcY = decodeBlock(isLuma = true, dcY)
        place(yP, mbW * 16, mbX * 16 + (b % 2) * 8, mbY * 16 + (b / 2) * 8)
        b += 1
      }
      dcCb = decodeBlock(isLuma = false, dcCb)
      place(cbP, mbW * 8, mbX * 8, mbY * 8)
      dcCr = decodeBlock(isLuma = false, dcCr)
      place(crP, mbW * 8, mbX * 8, mbY * 8)
      more = br.bitsLeft > 23 && br.peek(23) != 0
    }
  }

  /** Intra AC reconstruction (11172-2 §2.4.4.1): scale, then mismatch
    * control (even values step toward zero), then clamp. */
  private def dequantIntra(level: Int, qScale: Int, q: Int): Int = {
    var v = (2 * level * qScale * q) / 16
    if ((v & 1) == 0) v = if (v > 0) v - 1 else if (v < 0) v + 1 else 0
    math.max(-2048, math.min(2047, v))
  }

  // ------------------------------------------------------------ encoder

  /** Deterministic I-only MPEG-1 elementary stream of solid-color frames
    * (the video-fixture pattern of Multimodal.testAvi): one slice per
    * picture, every macroblock intra with DC-only blocks, so the decode
    * is exact. Dimensions must be multiples of 16.
    *
    * `acPlantLuma`: optionally plant one escape-coded AC (run, level)
    * after each luma DC — the test hook that drives the escape parse,
    * zigzag placement, dequantization, and IDCT through a coefficient
    * pattern whose expected pixels a test can derive independently. */
  def encodeIntra(frameRgbs: Seq[Int], w: Int = 16, h: Int = 16,
                  acPlantLuma: Option[(Int, Int)] = None): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0,
      s"dimensions must be multiples of 16, got ${w}x$h")
    val bw = new BitWriter
    bw.startCode(0xB3)
    bw.put(w, 12); bw.put(h, 12)
    bw.put(1, 4) // pel_aspect_ratio: square
    bw.put(5, 4) // picture_rate: 30 fps
    bw.put(0x3FFFF, 18); bw.put(1, 1) // bit_rate (variable) + marker
    bw.put(0, 10); bw.put(0, 1) // vbv_buffer_size, constrained flag
    bw.put(0, 1); bw.put(0, 1) // no loaded quantizer matrices
    bw.startCode(0xB8) // GOP
    bw.put(0, 25); bw.put(1, 1); bw.put(0, 1)
    val mbW = w / 16; val mbH = h / 16
    frameRgbs.zipWithIndex.foreach { case (rgb, idx) =>
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      val yV = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
      val cbV = math.max(0, math.min(255, math.round(128 + 0.564 * (b - yV)).toInt))
      val crV = math.max(0, math.min(255, math.round(128 + 0.713 * (r - yV)).toInt))
      bw.startCode(0x00) // picture
      bw.put(idx & 0x3FF, 10); bw.put(1, 3); bw.put(0xFFFF, 16)
      bw.put(0, 1) // extra_bit_picture = 0
      bw.startCode(0x01) // single slice, vertical position 1
      bw.put(8, 5) // quantizer_scale
      bw.put(0, 1) // extra_bit_slice = 0
      def putDc(diff: Int, luma: Boolean): Unit = {
        val mag = math.abs(diff)
        val size = 32 - Integer.numberOfLeadingZeros(mag) // 0 when diff == 0
        if (luma) size match {
          case 0 => bw.put(4, 3) // '100'
          case 1 => bw.put(0, 2)
          case 2 => bw.put(1, 2)
          case 3 => bw.put(5, 3)
          case 4 => bw.put(6, 3)
          case n => bw.put((1 << (n - 1)) - 2, n - 1) // 1110, 11110, ...
        } else size match {
          case 0 => bw.put(0, 2)
          case 1 => bw.put(1, 2)
          case 2 => bw.put(2, 2)
          case n => bw.put((1 << n) - 2, n) // 110, 1110, ...
        }
        if (size > 0) {
          val bits = if (diff > 0) diff else diff + (1 << size) - 1
          bw.put(bits, size)
        }
      }
      var mb = 0
      while (mb < mbW * mbH) {
        bw.put(1, 1) // address increment 1
        bw.put(1, 1) // macroblock_type: intra
        var blk = 0
        while (blk < 6) {
          val first = mb == 0 && (blk == 0 || blk == 4 || blk == 5)
          val diff =
            if (!first) 0
            else if (blk == 0) yV - 128
            else if (blk == 4) cbV - 128
            else crV - 128
          putDc(diff, luma = blk < 4)
          if (blk < 4) acPlantLuma.foreach { case (run, level) =>
            require(run >= 0 && run < 63 && level != 0 &&
              level >= -127 && level <= 127 && level != -128,
              s"unplantable escape ($run, $level)")
            bw.put(1, 6) // escape '000001'
            bw.put(run, 6)
            bw.put(level & 0xff, 8)
          }
          bw.put(2, 2) // EOB '10'
          blk += 1
        }
        mb += 1
      }
    }
    bw.startCode(0xB7) // sequence end
    bw.result()
  }
}
