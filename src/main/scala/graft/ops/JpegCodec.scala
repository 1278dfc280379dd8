package graft.ops

import java.io.ByteArrayOutputStream

import graft.ops.PixelCodec.Image

/** Pure-JVM JPEG (ITU-T T.81) — the flagship LOSSY format a
  * real multimodal corpus is full of, implemented from the spec with
  * no codec library:
  *
  *  - **Decoder**: sequential baseline (SOF0/SOF1) AND progressive
  *    (SOF2, r13) DCT, 8-bit, grayscale or 3-component YCbCr with
  *    sampling factors 1..2 (4:4:4, 4:2:2, 4:2:0), canonical Huffman
  *    per F.2.2.3 (mincode/maxcode/valptr), byte-stuffing-aware bit
  *    reader, restart markers, dequant + reference double IDCT +
  *    level shift, nearest-neighbor chroma upsample, integer JFIF
  *    YCbCr->RGB. Progressive decoding covers the full G.2 scan
  *    algebra: interleaved/non-interleaved DC-first and DC-refine,
  *    spectral-band AC-first with EOB runs, and AC successive-
  *    approximation refinement with correction bits (what every
  *    ImageIO/libjpeg default progressive script emits), and (r14)
  *    ARITHMETIC streams — sequential (SOF9) AND progressive (SOF10)
  *    with DAC conditioning, the T.81 Annex D QM coder + Annex F/G
  *    models (see [[JpegArith]]); 12-bit streams return None (loud
  *    fallback, like every codec here). The 12-bit None is a
  *    PERMANENT decline, not a backlog item: 12-bit precision is
  *    DICOM/medical-imaging territory (near-absent in web corpora),
  *    and no independent 12-bit implementation exists in this
  *    environment to cross-validate against (libjpeg62-turbo here is
  *    compiled 8-bit-only; offline) — a from-spec path validated
  *    only against itself would sit below the evidence bar every
  *    other codec entry meets. See README's codec paragraph.
  *  - **Encoder**: baseline, grayscale or 4:4:4 color, caller-chosen
  *    quant table, single-length canonical Huffman tables (all 12 DC
  *    categories at 4 bits, all 162 AC symbols at 8 bits — legal,
  *    decodable by any baseline decoder, and free of the spec's
  *    example-table transcription risk); plus a PROGRESSIVE encoder
  *    (spectral selection: one interleaved DC scan, one AC band scan
  *    per component) so the progressive decode path sits under the
  *    same exact constant-block oracle gate as baseline.
  *
  * JPEG is lossy, so the GIF/WAV "round-trip == identity" gating
  * trick does not apply in general — EXCEPT on images that are
  * CONSTANT PER 8x8 BLOCK: there every AC coefficient is exactly 0,
  * the DC coefficient is 8*(v-128) (an exact double), and with a DC
  * quant step of 8 the quantize/dequantize/IDCT chain reproduces v
  * exactly. mm_jpeg_roundtrip builds exactly such images, so the
  * whole container + Huffman + bit stream + DC prediction machinery
  * sits under the driver's exact hash gate; the AC/IDCT/color path is
  * cross-checked against the JDK's independent ImageIO codec in
  * JpegCodecSpec (tolerance bounds documented there — IDCT and chroma
  * upsampling legitimately differ by a few LSBs across conformant
  * implementations).
  */
object JpegCodec {

  private[ops] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** All-8s quant table: DC step 8 makes constant-block images
    * round-trip EXACTLY (see object doc); AC steps are irrelevant on
    * such images (coefficients are 0). */
  val QuantExact: Array[Int] = Array.fill(64)(8)

  /** A plain mid-quality table for general encoding. */
  val QuantDefault: Array[Int] = Array.tabulate(64)(i => 16 + (i / 8) * 2)

  private val CosT: Array[Double] = Array.tabulate(8 * 8)(k =>
    math.cos((2 * (k / 8) + 1) * (k % 8) * math.Pi / 16))
  private def cosT(x: Int, u: Int): Double = CosT(x * 8 + u)
  private def cScale(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2) else 1.0

  // ----------------------------------------------------------- encoder

  /** The 162 baseline AC (run, size) symbols: 0x00 EOB, 0xF0 ZRL, and
    * run 0..15 x size 1..10. */
  private val AcSymbols: Array[Int] = {
    val b = Array.newBuilder[Int]
    b += 0x00
    for (run <- 0 to 15; size <- 1 to 10) b += ((run << 4) | size)
    b += 0xf0
    b.result()
  }

  private final class BitWriter(o: ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, width: Int): Unit = {
      acc = (acc << width) | (code & ((1L << width) - 1)); n += width
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xff).toInt
        o.write(b)
        if (b == 0xff) o.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1-bits per the spec
      val b = (((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff).toInt
      o.write(b)
      if (b == 0xff) o.write(0x00)
      n = 0
    }
  }

  private def magnitude(v: Int): Int = {
    var t = 0; var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Encode one 8x8 block of quantized coefficients (natural order)
    * against the single-length tables. DC is differential. */
  private def encodeBlock(bw: BitWriter, coef: Array[Int],
      dcPred: Int): Int = {
    val diff = coef(0) - dcPred
    val t = magnitude(diff)
    bw.put(dcCode(t), 4)
    if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.put(acCode(0xf0), 8); run -= 16 }
        val s = magnitude(v)
        bw.put(acCode((run << 4) | s), 8)
        bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acCode(0x00), 8) // EOB
    coef(0)
  }

  // single-length canonical tables: DC cats 0..11 are the 4-bit codes
  // 0..11; AC symbol i (in AcSymbols order) is the 8-bit code i
  private def dcCode(cat: Int): Int = cat
  private val acIndex: Map[Int, Int] = AcSymbols.zipWithIndex.toMap
  private def acCode(sym: Int): Int = acIndex(sym)

  private def fdctQuant(px: Array[Int], quant: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += (px(y * 8 + x) - 128) * cosT(x, u) * cosT(y, v)
            y += 1
          }
          x += 1
        }
        val f = 0.25 * cScale(u) * cScale(v) * s
        out(v * 8 + u) = math.round(f / quant(v * 8 + u)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  private def writeMarkerSegment(o: ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    o.write(0xff); o.write(marker)
    val len = body.length + 2
    o.write((len >> 8) & 0xff); o.write(len & 0xff)
    o.write(body, 0, body.length)
  }

  private def dhtBody(clazz: Int, id: Int, counts: Array[Int],
      vals: Array[Int]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write((clazz << 4) | id)
    counts.foreach(b.write)
    vals.foreach(b.write)
    b.toByteArray
  }

  /** Baseline JPEG encode: channels 1 (grayscale) or 3 (RGB,
    * converted to YCbCr, no subsampling — 4:4:4). `quant` applies to
    * every component. */
  def encodeJpeg(img: Image, quant: Array[Int] = QuantDefault): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      "JPEG encoder takes grey or RGB")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255))
    val o = new ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8) // SOI
    // DQT: table 0, 8-bit precision, zigzag order
    writeMarkerSegment(o, 0xdb,
      (Array(0x00) ++ Array.tabulate(64)(k => quant(Zigzag(k))))
        .map(_.toByte))
    // SOF0
    val nComp = img.channels
    val sof = new ByteArrayOutputStream()
    sof.write(8)
    sof.write((img.height >> 8) & 0xff); sof.write(img.height & 0xff)
    sof.write((img.width >> 8) & 0xff); sof.write(img.width & 0xff)
    sof.write(nComp)
    var c = 0
    while (c < nComp) {
      sof.write(c + 1); sof.write(0x11); sof.write(0) // 1x1, quant 0
      c += 1
    }
    writeMarkerSegment(o, 0xc0, sof.toByteArray)
    // DHT: DC table 0 = 12 four-bit codes; AC table 0 = 162 8-bit codes
    val dcCounts = Array.tabulate(16)(l => if (l == 3) 12 else 0)
    writeMarkerSegment(o, 0xc4, dhtBody(0, 0, dcCounts, (0 to 11).toArray))
    val acCounts = Array.tabulate(16)(l => if (l == 7) AcSymbols.length else 0)
    writeMarkerSegment(o, 0xc4, dhtBody(1, 0, acCounts, AcSymbols))
    // SOS
    val sos = new ByteArrayOutputStream()
    sos.write(nComp)
    c = 0
    while (c < nComp) { sos.write(c + 1); sos.write(0x00); c += 1 }
    sos.write(0); sos.write(63); sos.write(0)
    writeMarkerSegment(o, 0xda, sos.toByteArray)
    // entropy-coded data: 8x8 MCUs (no subsampling), edge-replicated
    val bw = new BitWriter(o)
    val mx = (img.width + 7) / 8
    val my = (img.height + 7) / 8
    val preds = new Array[Int](nComp)
    // component planes (YCbCr for color, the grey plane otherwise)
    val planes: Array[Array[Int]] = encodePlanes(img)
    var by = 0
    while (by < my) {
      var bx = 0
      while (bx < mx) {
        var ci = 0
        while (ci < nComp) {
          val block = new Array[Int](64)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val sx = math.min(bx * 8 + xx, img.width - 1)
              val sy = math.min(by * 8 + yy, img.height - 1)
              block(yy * 8 + xx) = planes(ci)(sy * img.width + sx)
              xx += 1
            }
            yy += 1
          }
          preds(ci) = encodeBlock(bw, fdctQuant(block, quant), preds(ci))
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** PROGRESSIVE JPEG encode (spectral selection, no successive
    * approximation): scan 1 is the interleaved DC band (Ss=Se=0),
    * then one full AC band scan (Ss=1, Se=63) per component — the
    * simplest legal progression order (T.81 G.1.1.1.1), exercising
    * the decoder's DC-interleaved, non-interleaved AC, and EOB-run
    * machinery. Same single-length tables, same quant contract as
    * [[encodeJpeg]]: on constant-per-block images with [[QuantExact]]
    * the decode is EXACT, which is what puts SOF2 under the driver's
    * hash gate. Grayscale or 4:4:4 color. */
  def encodeJpegProgressive(img: Image,
      quant: Array[Int] = QuantDefault): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      "JPEG encoder takes grey or RGB")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255))
    val o = new ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8) // SOI
    writeMarkerSegment(o, 0xdb,
      (Array(0x00) ++ Array.tabulate(64)(k => quant(Zigzag(k))))
        .map(_.toByte))
    val nComp = img.channels
    val sof = new ByteArrayOutputStream()
    sof.write(8)
    sof.write((img.height >> 8) & 0xff); sof.write(img.height & 0xff)
    sof.write((img.width >> 8) & 0xff); sof.write(img.width & 0xff)
    sof.write(nComp)
    var c = 0
    while (c < nComp) {
      sof.write(c + 1); sof.write(0x11); sof.write(0)
      c += 1
    }
    writeMarkerSegment(o, 0xc2, sof.toByteArray) // SOF2: progressive
    val dcCounts = Array.tabulate(16)(l => if (l == 3) 12 else 0)
    writeMarkerSegment(o, 0xc4, dhtBody(0, 0, dcCounts, (0 to 11).toArray))
    val acCounts = Array.tabulate(16)(l => if (l == 7) AcSymbols.length else 0)
    writeMarkerSegment(o, 0xc4, dhtBody(1, 0, acCounts, AcSymbols))
    // quantized coefficients for every block of every component,
    // MCU-grid order (4:4:4: MCU grid == block grid)
    val mx = (img.width + 7) / 8
    val my = (img.height + 7) / 8
    val planes: Array[Array[Int]] = encodePlanes(img)
    val blocks: Array[Array[Array[Int]]] =
      Array.tabulate(nComp, my * mx) { (ci, b) =>
        val bx = b % mx; val by = b / mx
        val block = new Array[Int](64)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sx = math.min(bx * 8 + xx, img.width - 1)
            val sy = math.min(by * 8 + yy, img.height - 1)
            block(yy * 8 + xx) = planes(ci)(sy * img.width + sx)
            xx += 1
          }
          yy += 1
        }
        fdctQuant(block, quant)
      }
    // scan 1: interleaved DC band
    locally {
      val sos = new ByteArrayOutputStream()
      sos.write(nComp)
      var ci = 0
      while (ci < nComp) { sos.write(ci + 1); sos.write(0x00); ci += 1 }
      sos.write(0); sos.write(0); sos.write(0) // Ss=0 Se=0 AhAl=0
      writeMarkerSegment(o, 0xda, sos.toByteArray)
      val bw = new BitWriter(o)
      val preds = new Array[Int](nComp)
      var b = 0
      while (b < my * mx) {
        var k = 0
        while (k < nComp) {
          val dc = blocks(k)(b)(0)
          val diff = dc - preds(k)
          preds(k) = dc
          val t = magnitude(diff)
          bw.put(dcCode(t), 4)
          if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          k += 1
        }
        b += 1
      }
      bw.flush()
    }
    // one AC band scan per component (non-interleaved by spec)
    var ci = 0
    while (ci < nComp) {
      val sos = new ByteArrayOutputStream()
      sos.write(1); sos.write(ci + 1); sos.write(0x00)
      sos.write(1); sos.write(63); sos.write(0) // Ss=1 Se=63 AhAl=0
      writeMarkerSegment(o, 0xda, sos.toByteArray)
      val bw = new BitWriter(o)
      var b = 0
      while (b < my * mx) {
        val coef = blocks(ci)(b)
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { bw.put(acCode(0xf0), 8); run -= 16 }
            val s = magnitude(v)
            bw.put(acCode((run << 4) | s), 8)
            bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acCode(0x00), 8) // EOB (run length 1)
        b += 1
      }
      bw.flush()
      ci += 1
    }
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  /** Component planes for encoding: grey passthrough, or JFIF YCbCr. */
  private def encodePlanes(img: Image): Array[Array[Int]] =
    if (img.channels == 1)
      Array(Array.tabulate(img.width * img.height)(k => img.pixels(k) & 0xff))
    else {
      val y = new Array[Int](img.width * img.height)
      val cb = new Array[Int](img.width * img.height)
      val cr = new Array[Int](img.width * img.height)
      var k = 0
      while (k < img.width * img.height) {
        val r = img.pixels(k * 3) & 0xff
        val g = img.pixels(k * 3 + 1) & 0xff
        val b = img.pixels(k * 3 + 2) & 0xff
        y(k) = clamp8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
        cb(k) = clamp8(math.round(128 - 0.168736 * r - 0.331264 * g +
          0.5 * b).toInt)
        cr(k) = clamp8(math.round(128 + 0.5 * r - 0.418688 * g -
          0.081312 * b).toInt)
        k += 1
      }
      Array(y, cb, cr)
    }

  // ----------------------------------------------------------- decoder

  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    // F.2.2.3 canonical decode tables
    val minc = new Array[Int](17)
    val maxc = new Array[Int](17)
    val valp = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valp(l) = k; minc(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxc(l) = code - 1
        } else maxc(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valp(l) + code - minc(l))
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var sawEoi = false
    /** next bit, or -1 on exhausted/EOI. Handles 0xFF00 stuffing;
      * a real marker ends the stream. */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= p.length) return -1
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= p.length) return -1
          val m = p(pos) & 0xff
          if (m == 0x00) { pos += 1 } // stuffed 0xFF
          else { sawEoi = m == 0xd9; pos -= 1; return -1 }
          b = 0xff
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(t: Int): Int = {
      var v = 0; var i = 0
      while (i < t) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16 && (h.maxc(l) < 0 || code > h.maxc(l))) {
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      if (l > 16) -1 else h.value(l, code)
    }
    /** Align to a byte boundary and consume an RSTn marker. */
    def restart(): Boolean = {
      n = 0
      if (pos + 1 >= p.length) return false
      if ((p(pos) & 0xff) != 0xff) return false
      val m = p(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcT = 0; var acT = 0
  }

  /** Decode a baseline JPEG. Returns grey (channels=1) for single-
    * component streams, RGB (channels=3) for YCbCr. None on anything
    * outside the supported envelope. */
  def decodeJpeg(p: Array[Byte]): Option[Image] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    // UNTRUSTED BYTES: a decoder in the sniff path must return None
    // for anything structurally broken, never crash the task — a
    // corrupt stream can index table selectors past their arrays,
    // declare absurd dimensions, or truncate mid-segment. Anything
    // the explicit validations miss lands here as a structural
    // exception and degrades to "not a decodable JPEG".
    try decodeJpegChecked(p)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeJpegChecked(p: Array[Byte]): Option[Image] = {
    val quants = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    // arithmetic conditioning (DAC): T.81 defaults until a DAC says
    // otherwise — L=0/U=1 for DC tables, Kx=5 for AC tables
    val dcCondL = Array.fill(4)(0)
    val dcCondU = Array.fill(4)(1)
    val acCondK = Array.fill(4)(5)
    var arithSeq = false
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var progressive = false
    // progressive coefficient store: per component, the MCU-padded
    // block grid x 64 QUANTIZED coefficients, accumulated across
    // scans and reconstructed at EOI
    var coefs: Array[Array[Int]] = null
    var i = 2
    while (i + 2 <= p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val marker = p(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 }
      else if (marker == 0xd9) {
        // EOI: for a progressive stream this is where the picture is
        // complete — dequantize + IDCT + assemble; for baseline it
        // means EOI before SOS (broken)
        return if (progressive && coefs != null)
          reconstructProgressive(comps, quants, coefs, width, height)
        else None
      }
      else if (i + 4 > p.length) return None
      else {
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > p.length) return None
        val at = i + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var q = at
            while (q < i + 2 + len) {
              val pq = (p(q) & 0xff) >> 4
              val tq = p(q) & 0x0f
              if (pq != 0 || tq > 3) return None // 8-bit only
              if (q + 1 + 64 > i + 2 + len) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = p(q + 1 + k) & 0xff; k += 1 }
              quants(tq) = t
              q += 65
            }
          case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca =>
            // baseline / ext. sequential / progressive(huff) /
            // sequential(arith) / progressive(arith)
            if ((p(at) & 0xff) != 8) return None
            progressive = marker == 0xc2 || marker == 0xca
            arithSeq = marker == 0xc9 || marker == 0xca
            height = ((p(at + 1) & 0xff) << 8) | (p(at + 2) & 0xff)
            width = ((p(at + 3) & 0xff) << 8) | (p(at + 4) & 0xff)
            // dimension sanity: a crafted 65535x65535 header would
            // otherwise drive a multi-GB plane allocation before any
            // pixel data is even validated
            if (width <= 0 || height <= 0 ||
                width.toLong * height > (1L << 26)) return None
            val n = p(at + 5) & 0xff
            if (n != 1 && n != 3) return None
            comps = Array.tabulate(n) { c =>
              val o = at + 6 + c * 3
              val hv = p(o + 1) & 0xff
              Comp(p(o) & 0xff, hv >> 4, hv & 0x0f, p(o + 2) & 0xff)
            }
            if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2))
              return None
          case 0xc4 => // DHT: one or more tables
            var q = at
            while (q < i + 2 + len) {
              val clazz = (p(q) & 0xff) >> 4
              val id = p(q) & 0x0f
              if (id > 3) return None
              val counts = Array.tabulate(16)(l => p(q + 1 + l) & 0xff)
              val total = counts.sum
              if (q + 17 + total > i + 2 + len) return None
              val vals = Array.tabulate(total)(k => p(q + 17 + k) & 0xff)
              val h = new Huff(counts, vals)
              if (clazz == 0) dcTabs(id) = h else acTabs(id) = h
              q += 17 + total
            }
          case 0xcc => // DAC: arithmetic conditioning, (class/id, value)*
            var q = at
            while (q + 1 < i + 2 + len) {
              val clazz = (p(q) & 0xff) >> 4
              val id = p(q) & 0x0f
              if (id > 3) return None
              val v = p(q + 1) & 0xff
              if (clazz == 0) {
                dcCondL(id) = v & 0x0f
                dcCondU(id) = v >> 4
                if (dcCondU(id) < dcCondL(id) || dcCondU(id) > 15) return None
              } else {
                if (v < 1 || v > 63) return None
                acCondK(id) = v
              }
              q += 2
            }
          case 0xdd =>
            restartInterval = ((p(at) & 0xff) << 8) | (p(at + 1) & 0xff)
          case 0xda => // SOS: assign tables, then the entropy data
            if (comps == null || width <= 0 || height <= 0) return None
            val ns = p(at) & 0xff
            if (!progressive) {
              if (ns != comps.length) return None
              var c = 0
              while (c < ns) {
                val id = p(at + 1 + c * 2) & 0xff
                val tt = p(at + 2 + c * 2) & 0xff
                val comp = comps.find(_.id == id).getOrElse(return None)
                comp.dcT = tt >> 4; comp.acT = tt & 0x0f
                c += 1
              }
              return if (arithSeq)
                decodeScanArith(p, i + 2 + len, comps, quants,
                  dcCondL, dcCondU, acCondK, width, height, restartInterval)
              else decodeScan(p, i + 2 + len, comps, quants, dcTabs,
                acTabs, width, height, restartInterval)
            }
            // PROGRESSIVE scan: any subset of components (interleaved
            // only for the DC band), spectral band [Ss, Se],
            // successive approximation Ah -> Al
            if (ns < 1 || ns > comps.length) return None
            val scanIdx = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val id = p(at + 1 + c * 2) & 0xff
              val tt = p(at + 2 + c * 2) & 0xff
              val ci = comps.indexWhere(_.id == id)
              if (ci < 0) return None
              comps(ci).dcT = tt >> 4; comps(ci).acT = tt & 0x0f
              scanIdx(c) = ci
              c += 1
            }
            val ss = p(at + 1 + ns * 2) & 0xff
            val se = p(at + 2 + ns * 2) & 0xff
            val ahal = p(at + 3 + ns * 2) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f
            // scan-algebra sanity (T.81 G.1): DC band is [0,0] and may
            // interleave; AC bands start past 0 and are one component
            if (ss == 0 && se != 0) return None
            if (ss > 0 && (se < ss || se > 63 || ns != 1)) return None
            if (al > 13 || (ah != 0 && ah != al + 1)) return None
            if (coefs == null) {
              val maxH = comps.map(_.h).max
              val maxV = comps.map(_.v).max
              val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
              val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
              coefs = comps.map(cm =>
                new Array[Int](mcusX * cm.h * mcusY * cm.v * 64))
            }
            val end =
              if (arithSeq)
                decodeProgressiveScanArith(p, i + 2 + len, comps, scanIdx,
                  dcCondL, dcCondU, acCondK, ss, se, ah, al,
                  restartInterval, coefs, width, height)
              else decodeProgressiveScan(p, i + 2 + len, comps, scanIdx,
                dcTabs, acTabs, ss, se, ah, al, restartInterval, coefs,
                width, height)
            if (end < 0) return None
            // resync to the next REAL marker (pad bits / RSTs behind
            // us) and neutralize the loop's own segment advance
            i = nextMarker(p, end) - (2 + len)
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  /** Position of the next real marker at or past `from` (skips
    * entropy bytes, stuffed 0xFF00, fill 0xFFs, and RSTn). Returns
    * p.length when none remains. */
  private def nextMarker(p: Array[Byte], from: Int): Int = {
    var j = math.max(from, 0)
    while (j + 1 < p.length) {
      if ((p(j) & 0xff) != 0xff) j += 1
      else {
        val m = p(j + 1) & 0xff
        if (m == 0x00) j += 2 // stuffed data byte
        else if (m == 0xff) j += 1 // fill byte
        else if (m >= 0xd0 && m <= 0xd7) j += 2 // restart marker
        else return j
      }
    }
    p.length
  }

  private def decodeScan(p: Array[Byte], start: Int, comps: Array[Comp],
      quants: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      width: Int, height: Int, restartInterval: Int): Option[Image] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // per-component planes at component resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    comps.foreach { c =>
      if (quants(c.tq) == null) return None
    }
    val br = new BitReader(p, start)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val dcT = dcTabs(comp.dcT); val acT = acTabs(comp.acT)
        if (dcT == null || acT == null) return None
        val q = quants(comp.tq)
        var v = 0
        while (v < comp.v) {
          var h = 0
          while (h < comp.h) {
            // one 8x8 block
            java.util.Arrays.fill(coef, 0)
            val t = br.decode(dcT)
            if (t < 0 || t > 11) return None
            val diffBits = if (t == 0) 0 else br.bits(t)
            if (diffBits < 0) return None
            preds(ci) += extend(diffBits, t)
            coef(0) = preds(ci) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decode(acT)
              if (rs < 0) return None
              if (rs == 0x00) eob = true
              else if (rs == 0xf0) k += 16
              else {
                k += rs >> 4
                val s = rs & 0x0f
                if (k > 63) return None
                val vb = br.bits(s)
                if (vb < 0) return None
                coef(Zigzag(k)) = extend(vb, s) * q(Zigzag(k))
                k += 1
              }
            }
            idctInto(coef, planes(ci), planeW(ci),
              (mx * comp.h + h) * 8, (my * comp.v + v) * 8)
            h += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assemble(comps, planes, planeW, width, height, maxH, maxV)
  }

  /** Dequantized 8x8 natural-order coefficients -> pixels into a
    * component plane at (ox, oy). Shared by the Huffman and
    * arithmetic sequential scan paths (the progressive path
    * reconstructs at EOI with its own level-shift bookkeeping). */
  private def idctInto(coef: Array[Int], plane: Array[Int], pw: Int,
      ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var w = 0
          while (w < 8) {
            val f = coef(w * 8 + u)
            if (f != 0)
              s += cScale(u) * cScale(w) * f * cosT(x, u) * cosT(y, w)
            w += 1
          }
          u += 1
        }
        plane((oy + y) * pw + ox + x) =
          clamp8(math.round(0.25 * s).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  /** SEQUENTIAL ARITHMETIC scan (SOF9): the same MCU walk as
    * [[decodeScan]] with the entropy layer swapped for the T.81 QM
    * coder + Annex F statistical models ([[JpegArith]]). Statistics
    * areas are per conditioning-table id; a restart marker re-inits
    * the coder AND zeroes every statistics area, context, and DC
    * predictor (T.81 F.2.1.3.1). */
  private def decodeScanArith(p: Array[Byte], start: Int,
      comps: Array[Comp], quants: Array[Array[Int]],
      dcCondL: Array[Int], dcCondU: Array[Int], acCondK: Array[Int],
      width: Int, height: Int, restartInterval: Int): Option[Image] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    comps.foreach { c =>
      if (quants(c.tq) == null) return None
      if (c.dcT > 3 || c.acT > 3) return None
    }
    val dec = new JpegArith.Decoder(p, start)
    val dcStats = Array.fill(4)(new JpegArith.Stats)
    val acStats = Array.fill(4)(new JpegArith.Stats)
    val fixedBin = JpegArith.freshFixedBin
    // per-component (conditioning context, DC predictor)
    val ctx = Array.fill(comps.length)(Array(0, 0))
    val coefZig = new Array[Int](64)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // position after the RSTn marker; full model reset
        var j = dec.pos
        var found = -1
        while (found < 0 && j + 1 < p.length) {
          if ((p(j) & 0xff) != 0xff) j += 1
          else {
            val m = p(j + 1) & 0xff
            if (m == 0x00) j += 2 // stuffed entropy byte
            else if (m == 0xff) j += 1 // fill
            else if (m >= 0xd0 && m <= 0xd7) found = j + 2
            else return None // a non-restart marker mid-scan
          }
        }
        if (found < 0) return None
        dec.restartAt(found)
        dcStats.foreach(_.reset()); acStats.foreach(_.reset())
        ctx.foreach(a => { a(0) = 0; a(1) = 0 })
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val q = quants(comp.tq)
        val cond = JpegArith.Conditioning(
          dcCondL(comp.dcT), dcCondU(comp.dcT), acCondK(comp.acT))
        var v = 0
        while (v < comp.v) {
          var h = 0
          while (h < comp.h) {
            java.util.Arrays.fill(coefZig, 0)
            coefZig(0) = JpegArith.decodeDc(dec, dcStats(comp.dcT),
              ctx(ci), cond)
            JpegArith.decodeAc(dec, acStats(comp.acT), fixedBin, cond,
              coefZig)
            var k = 0
            while (k < 64) { coef(Zigzag(k)) = coefZig(k) * q(Zigzag(k)); k += 1 }
            idctInto(coef, planes(ci), planeW(ci),
              (mx * comp.h + h) * 8, (my * comp.v + v) * 8)
            h += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assemble(comps, planes, planeW, width, height, maxH, maxV)
  }

  /** SEQUENTIAL ARITHMETIC encode (SOF9 + DAC): [[encodeJpeg]]'s MCU
    * walk with the entropy layer swapped for the QM coder — default
    * T.81 conditioning (DC L=0/U=1, AC Kx=5), one conditioning table
    * pair, no subsampling. */
  def encodeJpegArith(img: Image,
      quant: Array[Int] = QuantDefault,
      restartInterval: Int = 0): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      "JPEG encoder takes grey or RGB")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255))
    require(restartInterval >= 0 && restartInterval <= 0xffff)
    val o = new ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8) // SOI
    writeMarkerSegment(o, 0xdb,
      (Array(0x00) ++ Array.tabulate(64)(k => quant(Zigzag(k))))
        .map(_.toByte))
    val nComp = img.channels
    val sof = new ByteArrayOutputStream()
    sof.write(8)
    sof.write((img.height >> 8) & 0xff); sof.write(img.height & 0xff)
    sof.write((img.width >> 8) & 0xff); sof.write(img.width & 0xff)
    sof.write(nComp)
    var c = 0
    while (c < nComp) {
      sof.write(c + 1); sof.write(0x11); sof.write(0)
      c += 1
    }
    writeMarkerSegment(o, 0xc9, sof.toByteArray) // SOF9
    // DAC: DC table 0 -> (U=1)<<4|(L=0); AC table 0 -> Kx=5
    writeMarkerSegment(o, 0xcc,
      Array(0x00, 0x10, 0x10, 0x05).map(_.toByte))
    if (restartInterval > 0)
      writeMarkerSegment(o, 0xdd, Array(
        ((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    val sos = new ByteArrayOutputStream()
    sos.write(nComp)
    c = 0
    while (c < nComp) { sos.write(c + 1); sos.write(0x00); c += 1 }
    sos.write(0); sos.write(63); sos.write(0)
    writeMarkerSegment(o, 0xda, sos.toByteArray)
    val enc = new JpegArith.Encoder(o)
    val dcStats = new JpegArith.Stats
    val acStats = new JpegArith.Stats
    val fixedBin = JpegArith.freshFixedBin
    val cond = JpegArith.Conditioning()
    val ctx = Array.fill(nComp)(Array(0, 0))
    val mx = (img.width + 7) / 8
    val my = (img.height + 7) / 8
    val planes: Array[Array[Int]] = encodePlanes(img)
    val coefZig = new Array[Int](64)
    var mcu = 0
    val nMcus = mx * my
    var rst = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // T.81 restart: terminate the code stream, emit RSTn, reset
        // the coder AND every statistics area / context / predictor
        // (the decoder's restartBoundary mirror)
        enc.finish()
        o.write(0xff); o.write(0xd0 + rst)
        rst = (rst + 1) & 7
        dcStats.reset(); acStats.reset()
        ctx.foreach(a => { a(0) = 0; a(1) = 0 })
      }
      val bx = mcu % mx
      val by = mcu / mx
      var ci = 0
      while (ci < nComp) {
        val block = new Array[Int](64)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sx = math.min(bx * 8 + xx, img.width - 1)
            val sy = math.min(by * 8 + yy, img.height - 1)
            block(yy * 8 + xx) = planes(ci)(sy * img.width + sx)
            xx += 1
          }
          yy += 1
        }
        val qc = fdctQuant(block, quant)
        var k = 0
        while (k < 64) { coefZig(k) = qc(Zigzag(k)); k += 1 }
        JpegArith.encodeDc(enc, dcStats, ctx(ci), cond, coefZig(0))
        JpegArith.encodeAc(enc, acStats, fixedBin, cond, coefZig)
        ci += 1
      }
      mcu += 1
    }
    enc.finish()
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  /** Assemble decoded component planes into the output image: sample
    * each plane at component resolution (nearest) and, for color,
    * apply the integer JFIF YCbCr->RGB. Shared by the baseline and
    * progressive reconstruction paths. */
  private def assemble(comps: Array[Comp], planes: Array[Array[Int]],
      planeW: Array[Int], width: Int, height: Int,
      maxH: Int, maxV: Int): Option[Image] = {
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)((y * comps(0).v / maxV) * planeW(0) +
            x * comps(0).h / maxH)
          val cb = planes(1)((y * comps(1).v / maxV) * planeW(1) +
            x * comps(1).h / maxH)
          val cr = planes(2)((y * comps(2).v / maxV) * planeW(2) +
            x * comps(2).h / maxH)
          val k = (y * width + x) * 3
          out(k) = clamp8(math.round(yy + 1.402 * (cr - 128)).toInt).toByte
          out(k + 1) = clamp8(math.round(yy - 0.344136 * (cb - 128) -
            0.714136 * (cr - 128)).toInt).toByte
          out(k + 2) = clamp8(math.round(yy + 1.772 * (cb - 128)).toInt).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, 3, out))
    }
  }

  /** Decode one PROGRESSIVE scan's entropy data into the coefficient
    * store (T.81 G.2; correction-bit refinement per the G.1.2.3
    * successive-approximation rules). Returns the byte position where
    * entropy data ended, or -1 on malformed input.
    *
    *  - interleaved scans (ns > 1, DC band only): MCU order, h x v
    *    blocks per component per MCU, restart interval in MCUs;
    *  - non-interleaved scans: the component's OWN block grid
    *    (ceil(compDim/8), NOT the MCU-padded grid), row-major,
    *    restart interval in blocks;
    *  - stored values are QUANTIZED coefficients, assembled across
    *    scans by the successive-approximation shifts. */
  private def decodeProgressiveScan(p: Array[Byte], start: Int,
      comps: Array[Comp], scanIdx: Array[Int],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
      coefs: Array[Array[Int]], width: Int, height: Int): Int = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val br = new BitReader(p, start)
    val preds = new Array[Int](comps.length)
    var eobrun = 0

    def blockOff(ci: Int, bx: Int, by: Int): Int =
      (by * (mcusX * comps(ci).h) + bx) * 64

    def dcFirst(ci: Int, off: Int): Boolean = {
      val dcT = dcTabs(comps(ci).dcT)
      if (dcT == null) return false
      val t = br.decode(dcT)
      if (t < 0 || t > 11) return false
      val vb = if (t == 0) 0 else br.bits(t)
      if (vb < 0) return false
      preds(ci) += extend(vb, t)
      coefs(ci)(off) = preds(ci) << al
      true
    }
    def dcRefine(ci: Int, off: Int): Boolean = {
      val b = br.bit()
      if (b < 0) return false
      if (b == 1) coefs(ci)(off) |= 1 << al
      true
    }
    def acFirst(ci: Int, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val acT = acTabs(comps(ci).acT)
      if (acT == null) return false
      var k = ss
      while (k <= se) {
        val rs = br.decode(acT)
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val eb = br.bits(r)
              if (eb < 0) return false
              eobrun += eb
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val vb = br.bits(s)
          if (vb < 0) return false
          coefs(ci)(off + Zigzag(k)) = extend(vb, s) << al
          k += 1
        }
      }
      true
    }
    def acRefine(ci: Int, off: Int): Boolean = {
      val acT = acTabs(comps(ci).acT)
      if (acT == null) return false
      val p1 = 1 << al
      val m1 = -1 << al
      val arr = coefs(ci)
      def correct(k: Int): Boolean = {
        val idx = off + Zigzag(k)
        if (arr(idx) != 0) {
          val b = br.bit()
          if (b < 0) return false
          if (b == 1 && (arr(idx) & p1) == 0)
            arr(idx) += (if (arr(idx) >= 0) p1 else m1)
        }
        true
      }
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = br.decode(acT)
          if (rs < 0) return false
          var r = rs >> 4; val s = rs & 0x0f
          var newVal = 0
          if (s != 0) {
            if (s != 1) return false // refinement emits size-1 only
            val b = br.bit()
            if (b < 0) return false
            newVal = if (b == 1) p1 else m1
          } else if (r != 15) {
            eobrun = 1 << r
            if (r > 0) {
              val eb = br.bits(r)
              if (eb < 0) return false
              eobrun += eb
            }
            atEob = true
          }
          if (!atEob) {
            // advance over r ZERO-HISTORY positions, appending a
            // correction bit to every already-nonzero coefficient;
            // `placed` marks the zero slot a new coefficient lands in
            var placed = false
            while (k <= se && !placed) {
              val idx = off + Zigzag(k)
              if (arr(idx) != 0) {
                val b = br.bit()
                if (b < 0) return false
                if (b == 1 && (arr(idx) & p1) == 0)
                  arr(idx) += (if (arr(idx) >= 0) p1 else m1)
                k += 1
              } else if (r == 0) placed = true
              else { r -= 1; k += 1 }
            }
            if (newVal != 0) {
              if (!placed) return false // no zero slot in band: corrupt
              arr(off + Zigzag(k)) = newVal
              k += 1
            } else if (placed) {
              k += 1 // ZRL: step past its 16th zero
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          if (!correct(k)) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    def codeBlock(ci: Int, off: Int): Boolean =
      if (ss == 0) {
        if (ah == 0) dcFirst(ci, off) else dcRefine(ci, off)
      } else {
        if (ah == 0) acFirst(ci, off) else acRefine(ci, off)
      }

    if (scanIdx.length > 1) {
      // interleaved DC scan: MCU order
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart()) return -1
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var c = 0
        while (c < scanIdx.length) {
          val ci = scanIdx(c)
          var v = 0
          while (v < comps(ci).v) {
            var h = 0
            while (h < comps(ci).h) {
              if (!codeBlock(ci,
                  blockOff(ci, mx * comps(ci).h + h, my * comps(ci).v + v)))
                return -1
              h += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved: the component's OWN (unpadded) block grid
      val ci = scanIdx(0)
      val compW = (width * comps(ci).h + maxH - 1) / maxH
      val compH = (height * comps(ci).v + maxV - 1) / maxV
      val bW = (compW + 7) / 8
      val bH = (compH + 7) / 8
      var b = 0
      val nB = bW * bH
      while (b < nB) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          if (!br.restart()) return -1
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
        if (!codeBlock(ci, blockOff(ci, b % bW, b / bW))) return -1
        b += 1
      }
    }
    br.pos
  }

  /** PROGRESSIVE ARITHMETIC scan (SOF10, r14): the same scan walk as
    * [[decodeProgressiveScan]] with the T.81 G-annex arithmetic
    * procedures — DC first = the sequential DC model over the
    * scaled-down values (result shifted by Al into the coefficient
    * store), DC refine = one fixed-bin bit per block, AC first = the
    * sequential AC model over Ss..Se with << Al, AC refine =
    * correction bits (st+2) on already-nonzero coefficients plus
    * newly-significant decisions (st+1, fixed-bin sign) with the EOB
    * flag consulted only past the PREVIOUS scan's end-of-block index.
    * Statistics re-init per scan and at every restart (T.81's
    * contract); pinned against libjpeg progressive-arithmetic
    * fixtures in JpegArithSpec. */
  private def decodeProgressiveScanArith(p: Array[Byte], start: Int,
      comps: Array[Comp], scanIdx: Array[Int],
      dcCondL: Array[Int], dcCondU: Array[Int], acCondK: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
      coefs: Array[Array[Int]], width: Int, height: Int): Int = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val dec = new JpegArith.Decoder(p, start)
    val dcStats = Array.fill(4)(new JpegArith.Stats)
    val acStats = Array.fill(4)(new JpegArith.Stats)
    val fixedBin = JpegArith.freshFixedBin
    val ctx = Array.fill(comps.length)(Array(0, 0))

    def blockOff(ci: Int, bx: Int, by: Int): Int =
      (by * (mcusX * comps(ci).h) + bx) * 64

    def condOf(ci: Int) = JpegArith.Conditioning(
      dcCondL(comps(ci).dcT), dcCondU(comps(ci).dcT),
      acCondK(comps(ci).acT))

    def dcFirst(ci: Int, off: Int): Boolean = {
      val pred = JpegArith.decodeDc(dec, dcStats(comps(ci).dcT),
        ctx(ci), condOf(ci))
      coefs(ci)(off) = pred << al
      true
    }
    def dcRefine(ci: Int, off: Int): Boolean = {
      if (dec.decode(fixedBin, 0) == 1) coefs(ci)(off) |= 1 << al
      true
    }
    def acFirst(ci: Int, off: Int): Boolean = {
      val st = acStats(comps(ci).acT).ac
      val kx = condOf(ci).acKx
      val arr = coefs(ci)
      var k = ss
      var done = false
      while (!done && k <= se) {
        var base = 3 * (k - 1)
        if (dec.decode(st, base) == 1) done = true // EOB
        else {
          while (dec.decode(st, base + 1) == 0) {
            k += 1
            if (k > se) return false
            base = 3 * (k - 1)
          }
          val sign = dec.decode(fixedBin, 0)
          var m = dec.decode(st, base + 2)
          var bits = base + 2 + 14
          if (m != 0 && dec.decode(st, base + 2) != 0) {
            m = 2
            var x = if (k <= kx) 189 else 217
            while (dec.decode(st, x) == 1) {
              m <<= 1
              if (m == 0x8000) return false
              x += 1
            }
            bits = x + 14
          }
          var v = m
          while ({ m >>= 1; m != 0 }) if (dec.decode(st, bits) == 1) v |= m
          v += 1
          arr(off + Zigzag(k)) = (if (sign == 1) -v else v) << al
          k += 1
        }
      }
      true
    }
    def acRefine(ci: Int, off: Int): Boolean = {
      val st = acStats(comps(ci).acT).ac
      val p1 = 1 << al
      val m1 = -1 << al
      val arr = coefs(ci)
      // previous scan's end-of-block index: last nonzero in Ss..Se
      var kex = se
      while (kex > 0 && arr(off + Zigzag(kex)) == 0) kex -= 1
      var k = ss
      while (k <= se) {
        var base = 3 * (k - 1)
        if (k > kex && dec.decode(st, base) == 1) return true // EOB
        var settled = false
        while (!settled) {
          val idx = off + Zigzag(k)
          if (arr(idx) != 0) {
            // correction bit for an already-significant coefficient
            if (dec.decode(st, base + 2) == 1)
              arr(idx) += (if (arr(idx) < 0) m1 else p1)
            settled = true
          } else if (dec.decode(st, base + 1) == 1) {
            // newly significant: fixed-bin sign
            arr(idx) = if (dec.decode(fixedBin, 0) == 1) m1 else p1
            settled = true
          } else {
            k += 1
            if (k > se) return false
            base = 3 * (k - 1)
          }
        }
        k += 1
      }
      true
    }
    def codeBlock(ci: Int, off: Int): Boolean =
      if (ss == 0) {
        if (ah == 0) dcFirst(ci, off) else dcRefine(ci, off)
      } else {
        if (ah == 0) acFirst(ci, off) else acRefine(ci, off)
      }
    def restartBoundary(): Boolean = {
      var j = dec.pos
      var found = -1
      while (found < 0 && j + 1 < p.length) {
        if ((p(j) & 0xff) != 0xff) j += 1
        else {
          val m = p(j + 1) & 0xff
          if (m == 0x00) j += 2
          else if (m == 0xff) j += 1
          else if (m >= 0xd0 && m <= 0xd7) found = j + 2
          else return false
        }
      }
      if (found < 0) return false
      dec.restartAt(found)
      dcStats.foreach(_.reset()); acStats.foreach(_.reset())
      ctx.foreach(a => { a(0) = 0; a(1) = 0 })
      true
    }

    if (scanIdx.length > 1) {
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0 &&
            !restartBoundary()) return -1
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var c = 0
        while (c < scanIdx.length) {
          val ci = scanIdx(c)
          var v = 0
          while (v < comps(ci).v) {
            var h = 0
            while (h < comps(ci).h) {
              if (!codeBlock(ci,
                  blockOff(ci, mx * comps(ci).h + h, my * comps(ci).v + v)))
                return -1
              h += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
      }
    } else {
      val ci = scanIdx(0)
      val compW = (width * comps(ci).h + maxH - 1) / maxH
      val compH = (height * comps(ci).v + maxV - 1) / maxV
      val bW = (compW + 7) / 8
      val bH = (compH + 7) / 8
      var b = 0
      val nB = bW * bH
      while (b < nB) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0 &&
            !restartBoundary()) return -1
        if (!codeBlock(ci, blockOff(ci, b % bW, b / bW))) return -1
        b += 1
      }
    }
    dec.pos
  }

  /** EOI of a progressive stream: dequantize the accumulated
    * coefficients, IDCT every block of the MCU-padded grid, assemble
    * exactly like the baseline path. */
  private def reconstructProgressive(comps: Array[Comp],
      quants: Array[Array[Int]], coefs: Array[Array[Int]],
      width: Int, height: Int): Option[Image] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    comps.foreach(c => if (quants(c.tq) == null) return None)
    val deq = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quants(comps(ci).tq)
      val bW = mcusX * comps(ci).h
      val bH = mcusY * comps(ci).v
      var b = 0
      while (b < bW * bH) {
        val off = b * 64
        var k = 0
        while (k < 64) { deq(k) = coefs(ci)(off + k) * q(k); k += 1 }
        val ox = (b % bW) * 8
        val oy = (b / bW) * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var s = 0.0
            var u = 0
            while (u < 8) {
              var w = 0
              while (w < 8) {
                val f = deq(w * 8 + u)
                if (f != 0)
                  s += cScale(u) * cScale(w) * f * cosT(x, u) * cosT(y, w)
                w += 1
              }
              u += 1
            }
            planes(ci)((oy + y) * planeW(ci) + ox + x) =
              clamp8(math.round(0.25 * s).toInt + 128)
            x += 1
          }
          y += 1
        }
        b += 1
      }
      ci += 1
    }
    assemble(comps, planes, planeW, width, height, maxH, maxV)
  }
}
