package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.JpegCodec.{decodeJpeg, encodeJpeg, encodeJpegProgressive, QuantDefault, QuantExact}
import graft.ops.PixelCodec.Image

/** JPEG codec behavior in three tiers:
  *
  *  1. EXACT: constant-per-8x8-block images with the DC-step-8 quant
  *     table round-trip bit-for-bit (the arithmetic behind the
  *     mm_jpeg_roundtrip hash gate — derivation in JpegCodec's doc) —
  *     through BOTH the baseline and the progressive (SOF2) paths.
  *  2. BOUNDED: general images round-trip within the quantization
  *     error bound, and cross-implementation against the JDK's
  *     ImageIO codec within a few LSBs — baseline JPEG IDCTs are
  *     allowed to differ by ±1 (T.81 annex A accuracy), chroma
  *     upsampling differs more (ours nearest, ImageIO's smoothed),
  *     so the color tolerance is wider and tested on smooth content.
  *     ImageIO's PROGRESSIVE writer (successive approximation, the
  *     default 10-scan script) cross-validates the refinement paths.
  *  3. LOUD: truncated / foreign / structurally-inconsistent streams
  *     return None.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def grey(w: Int, h: Int)(f: (Int, Int) => Int): Image =
    Image(w, h, 1, Array.tabulate(w * h)(k => f(k % w, k / w).toByte))

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max

  test("constant-per-block images round-trip EXACTLY with the DC-step-8 table") {
    // 24x18: partial bottom blocks exercise edge replication; 8x8 and
    // 16x16 are the clean cases; per-block values sweep the range
    for ((w, h) <- Seq((8, 8), (16, 16), (24, 18), (40, 24))) {
      val img = grey(w, h)((x, y) => ((x / 8) * 41 + (y / 8) * 113 + 7) % 256)
      val back = decodeJpeg(encodeJpeg(img, QuantExact)).get
      assert(back.width === w && back.height === h && back.channels === 1)
      assert(back.pixels.toSeq === img.pixels.toSeq, s"${w}x$h")
    }
    // extremes: v = 0 and v = 255 blocks (DC diff categories up to 11)
    val hard = grey(32, 8)((x, _) => if ((x / 8) % 2 == 0) 0 else 255)
    assert(decodeJpeg(encodeJpeg(hard, QuantExact)).get.pixels.toSeq ===
      hard.pixels.toSeq)
  }

  test("general grey images: round-trip within the quantization bound") {
    // smooth gradient: AC energy is small, so with the default table
    // the reconstruction stays within a few levels of the source
    val img = grey(32, 24)((x, y) => 60 + x * 3 + y * 2)
    val back = decodeJpeg(encodeJpeg(img, QuantDefault)).get
    assert(back.width === 32 && back.height === 24)
    val d = maxAbsDiff(back.pixels, img.pixels)
    assert(d <= 12, s"smooth-gradient reconstruction off by $d levels")
  }

  test("ImageIO decodes our JPEGs within the baseline IDCT tolerance") {
    val img = grey(24, 16)((x, y) => 40 + x * 5 + y * 7)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodeJpeg(img, QuantExact)))
    assert(read !== null, "ImageIO could not parse our JPEG stream")
    assert(read.getWidth === 24 && read.getHeight === 16)
    val ours = decodeJpeg(encodeJpeg(img, QuantExact)).get
    var worst = 0
    for (y <- 0 until 16; x <- 0 until 24) {
      // raw raster sample: getRGB on a TYPE_BYTE_GRAY image routes
      // through a grayscale->sRGB colorspace conversion and would
      // compare tone curves, not decoded samples
      val theirs = read.getRaster.getSample(x, y, 0)
      worst = math.max(worst, math.abs(theirs - ours.px(x, y)))
    }
    assert(worst <= 1, s"ImageIO vs ours differ by $worst (> IDCT bound)")
  }

  test("we decode ImageIO's JPEGs (grey exact-ish, smooth color bounded)") {
    import java.awt.image.BufferedImage
    // grey: no chroma, only IDCT differences -> tight bound
    val bi = new BufferedImage(20, 14, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 20)
      bi.getRaster.setSample(x, y, 0, 30 + x * 4 + y * 9)
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bo))
    val ours = decodeJpeg(bo.toByteArray).get
    assert(ours.width === 20 && ours.height === 14 && ours.channels === 1)
    var worst = 0
    for (y <- 0 until 14; x <- 0 until 20)
      worst = math.max(worst,
        math.abs(bi.getRaster.getSample(x, y, 0) - ours.px(x, y)))
    assert(worst <= 3, s"grey ImageIO stream decoded $worst levels off")
    // smooth color (ImageIO writes subsampled YCbCr): wider bound —
    // chroma upsampling legitimately differs across decoders
    val ci = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      ci.setRGB(x, y, ((60 + x * 3) << 16) | ((80 + y * 4) << 8) | 100)
    val co = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(ci, "jpg", co))
    val oc = decodeJpeg(co.toByteArray).get
    assert(oc.width === 24 && oc.height === 16 && oc.channels === 3)
    var worstC = 0
    for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3) {
      val theirs = (ci.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      worstC = math.max(worstC, math.abs(theirs - oc.px(x, y, c)))
    }
    assert(worstC <= 16,
      s"smooth color stream reconstructed $worstC levels off")
  }

  test("our 4:4:4 color encode round-trips and ImageIO reads it") {
    val img = Image(16, 16, 3, Array.tabulate(16 * 16 * 3) { k =>
      val (p, c) = (k / 3, k % 3)
      (50 + (p % 16) * 4 + (p / 16) * 3 + c * 20).toByte
    })
    val bytes = encodeJpeg(img, QuantExact)
    val back = decodeJpeg(bytes).get
    assert(back.channels === 3)
    // quant step 8 on smooth content: small reconstruction error plus
    // the two color-space conversions' rounding
    assert(maxAbsDiff(back.pixels, img.pixels) <= 8)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(read !== null)
    assert(read.getWidth === 16 && read.getHeight === 16)
    var worst = 0
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      worst = math.max(worst, math.abs(
        ((read.getRGB(x, y) >> (16 - 8 * c)) & 0xff) - back.px(x, y, c)))
    assert(worst <= 4, s"ImageIO reads our color JPEG $worst levels off")
  }

  test("the perceptual-hash sniff accepts JPEG payloads") {
    val img = grey(16, 16)((x, y) => 30 + x * 9 + y * 4)
    val row = graft.functions.ImageExprs.phash(
      encodeJpeg(img, QuantDefault), strict = true)
    assert(row !== null)
    // and the hash equals the hash of the decoded pixels directly
    val viaDecode = graft.functions.ImageExprs.phash(
      PixelCodec.encodePng(decodeJpeg(encodeJpeg(img, QuantDefault)).get),
      strict = true)
    assert(row === viaDecode)
  }

  test("corrupt-but-JPEG-magic streams return None, never crash") {
    // the sniff path feeds untrusted bytes: out-of-range table
    // selectors, truncated segments, and absurd dimensions must all
    // degrade to None (lenient contract), not throw from a task
    val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
    // truncated SOF right after the marker
    assert(JpegCodec.decodeJpeg(
      soi ++ Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x02)).isEmpty)
    // SOF declaring 65535x65535 (plane allocation bomb)
    val hugeSof = soi ++ Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11,
      8, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 1,
      1, 0x11, 0, 0xff.toByte, 0xd9.toByte) // + EOI
    assert(JpegCodec.decodeJpeg(hugeSof).isEmpty)
    // random bytes after the magic
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val junk = new Array[Byte](200); rnd.nextBytes(junk)
      JpegCodec.decodeJpeg(soi ++ junk) // must not throw
    }
    // a VALID stream with one flipped byte mid-scan: None or a
    // decoded image, never an exception
    val img = PixelCodec.Image(24, 16, 1,
      Array.tabulate(24 * 16)(i => (i % 251).toByte))
    val ok = JpegCodec.encodeJpeg(img)
    (4 until ok.length by 7).foreach { at =>
      val bad = ok.clone; bad(at) = (bad(at) ^ 0x5a).toByte
      JpegCodec.decodeJpeg(bad) // must not throw
    }
  }

  test("decoder returns None on foreign, truncated, and inconsistent streams") {
    val img = grey(16, 16)((x, y) => x * 16 + y)
    val good = encodeJpeg(img, QuantDefault)
    assert(decodeJpeg(good.take(2)) === None)
    assert(decodeJpeg(good.take(good.length / 2)) === None)
    assert(decodeJpeg(PixelCodec.encodePng(img)) === None)
    // flip SOF0 -> SOF2: the BASELINE scan header (Ss=0, Se=63) is
    // illegal progressive scan algebra — must reject, not garble
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(decodeJpeg(prog) === None)
  }

  test("progressive: constant-per-block images round-trip EXACTLY") {
    for ((w, h) <- Seq((8, 8), (16, 16), (24, 18), (40, 24))) {
      val img = grey(w, h)((x, y) => ((x / 8) * 41 + (y / 8) * 113 + 7) % 256)
      val bytes = encodeJpegProgressive(img, QuantExact)
      // it really is a progressive stream (SOF2 present)
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2))
      val back = decodeJpeg(bytes).get
      assert(back.width === w && back.height === h && back.channels === 1)
      assert(back.pixels.toSeq === img.pixels.toSeq, s"${w}x$h")
    }
    // color, with extremes (DC categories up to 11)
    val color = Image(16, 16, 3, Array.tabulate(16 * 16 * 3) { k =>
      val p = k / 3
      (if (((p % 16) / 8 + (p / 16) / 8) % 2 == 0) 64 else 192).toByte
    })
    val back = decodeJpeg(encodeJpegProgressive(color, QuantExact)).get
    assert(back.channels === 3)
    // constant blocks in RGB are constant in YCbCr too; the only loss
    // is the two color conversions' rounding (same bound as baseline)
    assert(maxAbsDiff(back.pixels,
      decodeJpeg(encodeJpeg(color, QuantExact)).get.pixels) === 0)
  }

  test("progressive and baseline encodes of one image decode IDENTICALLY") {
    // both encoders quantize the same coefficients; spectral selection
    // only reorders the bits on the wire — the reconstruction must be
    // bit-identical, which pins the whole progressive scan plumbing
    // (DC interleave, AC bands, EOB runs) against the baseline path
    val img = grey(40, 24)((x, y) => (x * 7 + y * 13 + (x * y) % 31) % 256)
    val viaProg = decodeJpeg(encodeJpegProgressive(img, QuantDefault)).get
    val viaBase = decodeJpeg(encodeJpeg(img, QuantDefault)).get
    assert(viaProg.pixels.toSeq === viaBase.pixels.toSeq)
    val rgb = Image(24, 16, 3, Array.tabulate(24 * 16 * 3)(k =>
      ((k * 37) % 256).toByte))
    assert(decodeJpeg(encodeJpegProgressive(rgb, QuantDefault)).get
      .pixels.toSeq ===
      decodeJpeg(encodeJpeg(rgb, QuantDefault)).get.pixels.toSeq)
  }

  test("we decode ImageIO's PROGRESSIVE JPEGs (successive approximation)") {
    import java.awt.image.BufferedImage
    def progBytes(bi: BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bo = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      writer.dispose(); ios.close()
      bo.toByteArray
    }
    // grey: the default script uses DC/AC successive approximation —
    // the refinement (correction-bit) decode paths are all on the line
    val bi = new BufferedImage(20, 14, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 20)
      bi.getRaster.setSample(x, y, 0, 30 + x * 4 + y * 9)
    val bytes = progBytes(bi)
    assert(bytes.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2),
      "ImageIO did not emit a progressive stream — test void")
    val ours = decodeJpeg(bytes).get
    assert(ours.width === 20 && ours.height === 14 && ours.channels === 1)
    var worst = 0
    for (y <- 0 until 14; x <- 0 until 20)
      worst = math.max(worst,
        math.abs(bi.getRaster.getSample(x, y, 0) - ours.px(x, y)))
    assert(worst <= 3, s"grey progressive stream decoded $worst levels off")
    // smooth color (subsampled chroma + refinement): wider bound, as
    // in the baseline cross-check
    val ci = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      ci.setRGB(x, y, ((60 + x * 3) << 16) | ((80 + y * 4) << 8) | 100)
    val cb = progBytes(ci)
    val oc = decodeJpeg(cb).get
    assert(oc.width === 24 && oc.height === 16 && oc.channels === 3)
    var worstC = 0
    for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3) {
      val theirs = (ci.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      worstC = math.max(worstC, math.abs(theirs - oc.px(x, y, c)))
    }
    assert(worstC <= 16,
      s"smooth color progressive stream reconstructed $worstC levels off")
  }

  test("ImageIO reads our progressive streams within the IDCT bound") {
    val img = grey(24, 16)((x, y) => 40 + x * 5 + y * 7)
    val bytes = encodeJpegProgressive(img, QuantExact)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(read !== null, "ImageIO could not parse our progressive stream")
    val ours = decodeJpeg(bytes).get
    var worst = 0
    for (y <- 0 until 16; x <- 0 until 24)
      worst = math.max(worst,
        math.abs(read.getRaster.getSample(x, y, 0) - ours.px(x, y)))
    assert(worst <= 1, s"ImageIO vs ours differ by $worst on progressive")
  }

  test("corrupt progressive streams return None, never crash") {
    val img = grey(24, 16)((x, y) => (x * 11 + y * 17) % 256)
    val ok = encodeJpegProgressive(img, QuantDefault)
    (4 until ok.length by 7).foreach { at =>
      val bad = ok.clone; bad(at) = (bad(at) ^ 0x5a).toByte
      JpegCodec.decodeJpeg(bad) // must not throw
    }
    assert(decodeJpeg(ok.take(ok.length / 2)) === None)
  }
}
