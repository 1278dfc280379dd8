package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PixelCodec._

/** Codec proofs from three independent directions:
  *  1. paper-derived bytes: a hand-filtered PNG decoded against pixel
  *     values worked out by hand from the spec's filter definitions;
  *  2. round-trip: decode(encode(img)) == img across sizes, channel
  *     counts, and (via the encoder's row-cycling) ALL five filters;
  *  3. cross-codec: the JDK's ImageIO reads our PNGs/BMPs and we read
  *     ImageIO's -- two implementations agreeing on the same bytes.
  */
class PixelCodecSpec extends AnyFunSuite {

  /** Deterministic "random" pixels, no RNG (kept replayable). */
  private def mkImage(w: Int, h: Int, ch: Int, seed: Int): Image = {
    val px = Array.tabulate(w * h * ch) { i =>
      ((i * 31 + seed * 131 + (i * i) % 97) % 256).toByte
    }
    Image(w, h, ch, px)
  }

  test("paper-derived PNG: hand-built stream with Sub and Up filters decodes to hand-computed pixels") {
    // 3x2 greyscale. Row 0 uses filter 1 (Sub): stored deltas
    // [10, 5, 251] -> pixels 10, 15, (15+251) mod 256 = 10.
    // Row 1 uses filter 2 (Up): stored deltas [20, 250, 3] ->
    // pixels (10+20)=30, (15+250) mod 256 = 9, (10+3)=13.
    val raw = Array[Int](
      1, 10, 5, 251,
      2, 20, 250, 3).map(_.toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) zo.write(buf, 0, d.deflate(buf))
    d.end()
    // hand-assemble the container: sig + IHDR(3x2, grey) + IDAT(zo) +
    // IEND with CRCs -- nothing from the encoder under test
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def wChunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit = {
        o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
        o.write((v >>> 8) & 0xff); o.write(v & 0xff)
      }
      w32(data.length)
      val t = typ.getBytes("US-ASCII")
      o.write(t, 0, 4); o.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      w32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def be(v: Int): Unit = {
      ihdr.write((v >>> 24) & 0xff); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff)
    }
    be(3); be(2); ihdr.write(8); ihdr.write(0)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    wChunk("IHDR", ihdr.toByteArray)
    wChunk("IDAT", zo.toByteArray)
    wChunk("IEND", Array.emptyByteArray)
    val img = decodePng(o.toByteArray).get
    assert(img.width === 3 && img.height === 2 && img.channels === 1)
    assert(img.pixels.map(_ & 0xff).toSeq === Seq(10, 15, 10, 30, 9, 13))
  }

  test("PNG round-trip across sizes and channel counts exercises all five filters") {
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (9, 8), (24, 18), (37, 11))) {
      val img = mkImage(w, h, ch, seed = ch * 100 + w)
      val back = decodePng(encodePng(img)).get
      assert(back.width === w && back.height === h && back.channels === ch)
      assert(back.pixels.toSeq === img.pixels.toSeq, s"ch=$ch ${w}x$h")
      // filter-0-only stream decodes to the same pixels
      val plain = decodePng(encodePng(img, filterMix = false)).get
      assert(plain.pixels.toSeq === img.pixels.toSeq)
    }
  }

  test("ImageIO reads our PNGs; we read ImageIO's (grey and RGB)") {
    import java.awt.image.BufferedImage
    // ours -> ImageIO
    val rgb = mkImage(13, 7, 3, seed = 5)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodePng(rgb)))
    assert(read.getWidth === 13 && read.getHeight === 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      val argb = read.getRGB(x, y)
      assert(((argb >> 16) & 0xff) === rgb.px(x, y, 0), s"R $x,$y")
      assert(((argb >> 8) & 0xff) === rgb.px(x, y, 1), s"G $x,$y")
      assert((argb & 0xff) === rgb.px(x, y, 2), s"B $x,$y")
    }
    // ImageIO -> ours (ImageIO picks its own filters/compression)
    val bi = new BufferedImage(11, 9, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 11)
      bi.setRGB(x, y, ((x * 23 + y * 57) % 256 << 16) |
        ((x * 7 + y * 3) % 256 << 8) | (x * 91 + y * 13) % 256)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bo)
    val ours = decodePng(bo.toByteArray).get
    assert(ours.width === 11 && ours.height === 9)
    for (y <- 0 until 9; x <- 0 until 11) {
      val argb = bi.getRGB(x, y)
      assert(ours.px(x, y, 0) === ((argb >> 16) & 0xff), s"R $x,$y")
      assert(ours.px(x, y, 1) === ((argb >> 8) & 0xff), s"G $x,$y")
      assert(ours.px(x, y, 2) === (argb & 0xff), s"B $x,$y")
    }
  }

  test("BMP round-trip, ImageIO cross-reads, and padding-relevant widths") {
    for (w <- Seq(3, 4, 5, 6)) { // 3*w mod 4 covers all pad values
      val img = mkImage(w, 5, 3, seed = w)
      val back = decodeBmp(encodeBmp(img)).get
      assert(back.pixels.toSeq === img.pixels.toSeq, s"w=$w")
      val read = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(encodeBmp(img)))
      assert(read.getWidth === w && read.getHeight === 5)
      for (y <- 0 until 5; x <- 0 until w)
        assert((read.getRGB(x, y) & 0xffffff) ===
          ((img.px(x, y, 0) << 16) | (img.px(x, y, 1) << 8) |
            img.px(x, y, 2)), s"w=$w $x,$y")
    }
    // ImageIO-written BMP decodes with ours
    val bi = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6)
      bi.setRGB(x, y, (x * 40 % 256 << 16) | (y * 60 % 256 << 8) | 7)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "bmp", bo)
    val ours = decodeBmp(bo.toByteArray).get
    for (y <- 0 until 4; x <- 0 until 6)
      assert(((ours.px(x, y, 0) << 16) | (ours.px(x, y, 1) << 8) |
        ours.px(x, y, 2)) === (bi.getRGB(x, y) & 0xffffff), s"$x,$y")
  }

  test("GIF round-trip: grey images incl. code-width growth and the 4096 reset") {
    // small images keep 9-bit codes; the high-entropy 120x100 pushes
    // the LZW dictionary through widths 10..12 AND past 4096 entries,
    // exercising the clear-and-reset path on both coder sides
    for ((w, h) <- Seq((1, 1), (9, 8), (24, 18), (64, 64), (120, 100))) {
      val img = mkImage(w, h, 1, seed = w * 31 + h)
      val back = decodeGif(encodeGif(img)).get
      assert(back.width === w && back.height === h && back.channels === 1)
      assert(back.pixels.toSeq === img.pixels.toSeq, s"${w}x$h")
    }
    // a constant image: long runs drive the KwKwK decoder case, and
    // the compression must be REAL (LZW payload far smaller than raw;
    // 781 bytes = fixed header + 256-entry palette)
    val flat = Image(50, 40, 1, Array.fill(2000)(77.toByte))
    assert(decodeGif(encodeGif(flat)).get.pixels.toSeq === flat.pixels.toSeq)
    assert(encodeGif(flat).length - 781 < 2000 / 4,
      s"flat image should LZW-compress, got ${encodeGif(flat).length} bytes")
  }

  test("ImageIO reads our GIFs; we read ImageIO's") {
    import java.awt.image.{BufferedImage, IndexColorModel}
    val img = mkImage(21, 13, 1, seed = 9)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodeGif(img)))
    assert(read.getWidth === 21 && read.getHeight === 13)
    for (y <- 0 until 13; x <- 0 until 21)
      assert((read.getRGB(x, y) & 0xff) === img.px(x, y), s"$x,$y")
    // ImageIO-written GIF (explicit lossless grey-ramp palette so the
    // writer cannot quantize) decodes with ours
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new IndexColorModel(8, 256, ramp, ramp, ramp)
    val bi = new BufferedImage(17, 11, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 11; x <- 0 until 17)
      bi.getRaster.setSample(x, y, 0, (x * 37 + y * 101) % 256)
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bo))
    val ours = decodeGif(bo.toByteArray).get
    assert(ours.width === 17 && ours.height === 11)
    for (y <- 0 until 11; x <- 0 until 17)
      assert(ours.px(x, y, 0) === (x * 37 + y * 101) % 256, s"$x,$y")
  }

  test("GIF decoder rejects foreign and truncated streams, never throws") {
    val img = mkImage(10, 6, 1, seed = 3)
    val good = encodeGif(img)
    assert(decodeGif(good.take(12)) === None)
    assert(decodeGif(good.take(good.length / 2)) === None)
    assert(decodeGif(encodePng(img)) === None)
    assert(decodeGif(encodeBmp(mkImage(10, 6, 3, seed = 3))) === None)
    // corrupting the LZW stream body must fail loudly, not garble:
    // byte 0xFF mid-stream yields codes beyond the table
    val corrupt = good.clone()
    corrupt(781 + 10 + 2 + 4) = 0xff.toByte
    assert(decodeGif(corrupt).forall(_.pixels.length === 60))
  }

  test("G.711 mu-law: paper vectors, quantize idempotence, error bound, container") {
    import PixelCodec.{ulawDecode, ulawEncode}
    // hand vectors from the segment algebra: 0 encodes to 0xFF (sign 0,
    // segment 0, mantissa 0, complemented) and decodes back to exactly 0
    assert(ulawEncode(0) === 0xff)
    assert(ulawDecode(0xff) === 0)
    assert(ulawDecode(0x7f) === 0) // negative zero: the one duplicate code
    // byte identity: decoding to the segment midpoint and re-encoding
    // returns the same byte for every code except negative zero
    for (u <- 0 until 256 if u != 0x7f)
      assert(ulawEncode(ulawDecode(u)) === u, s"byte $u")
    // quantize idempotence + the segment-step error bound (the top
    // segment quantizes in steps of 1024; clip adds up to 643 at the
    // extremes -> 1024 bounds everything)
    for (s <- -32768 to 32767 by 17) {
      val once = ulawDecode(ulawEncode(s))
      assert(ulawDecode(ulawEncode(once)) === once, s"idempotence at $s")
      assert(math.abs(once - s) <= 1024, s"error at $s: ${once - s}")
      assert((s >= 0) === (once >= 0) || once == 0, s"sign flip at $s")
    }
    // monotone non-decreasing reconstruction over the positive range
    var prev = -1
    for (s <- 0 to 32767 by 7) {
      val d = ulawDecode(ulawEncode(s))
      assert(d >= prev, s"non-monotone at $s")
      prev = d
    }
    // the WAV container round-trips the RECONSTRUCTED samples exactly
    val samples = Array.tabulate(997)(t =>
      ((t * 31 + 7) % 65536 - 32768).toShort)
    val (back, rate) = PixelCodec.decodeWavUlaw(
      PixelCodec.encodeWavUlaw(samples, 8000)).get
    assert(rate === 8000 && back.length === 997)
    assert(back.toSeq === samples.map(s =>
      ulawDecode(ulawEncode(s.toInt)).toShort).toSeq)
    // PCM16 WAV bytes are not a mu-law stream and vice versa
    assert(PixelCodec.decodeWavUlaw(
      PixelCodec.encodeWav(samples, 8000)) === None)
    assert(PixelCodec.decodeWav(
      PixelCodec.encodeWavUlaw(samples, 8000)) === None)
  }

  test("WAV round-trip incl. odd-length-tolerant chunk walk") {
    val samples = Array.tabulate(1000)(t =>
      (((t * 37 + 11) % 65536) - 32768).toShort)
    val (back, rate) = decodeWav(encodeWav(samples, 16000)).get
    assert(rate === 16000)
    assert(back.toSeq === samples.toSeq)
    // foreign chunk before fmt/data still parses: splice a LIST chunk
    val wav = encodeWav(samples.take(10), 8000)
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(wav, 0, 12)
    spliced.write("LIST".getBytes("US-ASCII"))
    spliced.write(Array[Byte](3, 0, 0, 0)); spliced.write(Array[Byte](1, 2, 3))
    spliced.write(0) // word-align pad
    spliced.write(wav, 12, wav.length - 12)
    val out = spliced.toByteArray
    // fix RIFF size
    val total = out.length - 8
    out(4) = (total & 0xff).toByte; out(5) = ((total >> 8) & 0xff).toByte
    out(6) = ((total >> 16) & 0xff).toByte
    out(7) = ((total >> 24) & 0xff).toByte
    val (b2, r2) = decodeWav(out).get
    assert(r2 === 8000 && b2.toSeq === samples.take(10).toSeq)
  }

  test("decoders return None on foreign/truncated bytes, never throw") {
    val junk = Seq(
      Array.emptyByteArray,
      "not an image at all".getBytes("UTF-8"),
      encodePng(mkImage(5, 5, 3, 1)).take(20),
      encodeBmp(mkImage(5, 5, 3, 1)).take(30),
      encodeWav(Array[Short](1, 2, 3), 8000).take(16))
    junk.foreach { b =>
      assert(decodePng(b).isEmpty)
      assert(decodeBmp(b).isEmpty)
      assert(decodeWav(b).isEmpty)
    }
  }

  test("resizeArea: paper-checked boxes, incl. the non-uniform 24x18 -> 5x4 partition") {
    // 4x2 -> 2x1: each dst pixel averages a 2x2 box, truncating
    val img = Image(4, 2, 1,
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val r = resizeArea(img, 2, 1)
    assert(r.pixels.map(_ & 0xff).toSeq === Seq((10 + 20 + 50 + 60) / 4,
      (30 + 40 + 70 + 80) / 4))
    // non-uniform: col boxes under c*5/24 have sizes 5,5,4,5,5;
    // row boxes under r*4/18 have sizes 5,4,5,4
    val big = mkImage(24, 18, 1, seed = 9)
    val nz = resizeArea(big, 5, 4)
    for (dy <- 0 until 4; dx <- 0 until 5) {
      val cells = for {
        y <- 0 until 18 if y * 4 / 18 == dy
        x <- 0 until 24 if x * 5 / 24 == dx
      } yield big.px(x, y)
      assert(nz.px(dx, dy) === cells.sum / cells.size, s"$dx,$dy")
    }
  }

  test("aHash/dHash: paper bits and halves packing") {
    // dHash: 9x8 ramp rows -> every comparison p(x+1) > p(x) true ->
    // all 64 bits set -> lo = hi = 0xFFFFFFFF
    val ramp = Image(9, 8, 1,
      Array.tabulate(72)(i => ((i % 9) * 10).toByte))
    assert(dHash(ramp) === ((0xffffffffL, 0xffffffffL)))
    // aHash: one bright pixel -> only its bit is set (64*255 > 255+63*0)
    val spot = Image(8, 8, 1,
      Array.tabulate(64)(i => if (i == 37) 255.toByte else 0.toByte))
    val (lo, hi) = aHash(spot)
    assert(lo === 0L && hi === (1L << (37 - 32)))
    // uniform image: 64*p > 64*p is false -> zero hash (tie discipline)
    val flat = Image(8, 8, 1, Array.fill(64)(100.toByte))
    assert(aHash(flat) === ((0L, 0L)))
  }

  test("APNG round-trip: multi-frame, both channel shapes, filter-cycled") {
    for (ch <- Seq(1, 3)) {
      val frames = (0 until 4).map(f => mkImage(12, 10, ch, seed = f * 7 + ch))
      val back = decodeApng(encodeApng(frames)).get
      assert(back.size === 4)
      back.zip(frames).zipWithIndex.foreach { case ((b, orig), f) =>
        assert(b.width === 12 && b.height === 10 && b.channels === ch)
        assert(b.pixels.toSeq === orig.pixels.toSeq, s"frame $f ch=$ch")
      }
    }
    // a plain PNG decodes as one frame through the same entry point
    val still = mkImage(5, 4, 3, seed = 2)
    val one = decodeApng(encodePng(still)).get
    assert(one.size === 1 && one.head.pixels.toSeq === still.pixels.toSeq)
  }

  test("APNG compatibility guarantee: ImageIO reads frame 0 as a static PNG") {
    val frames = (0 until 3).map(f => mkImage(8, 6, 3, seed = f + 40))
    val bytes = encodeApng(frames)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(read.getWidth === 8 && read.getHeight === 6)
    for (y <- 0 until 6; x <- 0 until 8) {
      val argb = read.getRGB(x, y)
      assert(((argb >> 16) & 0xff) === frames.head.px(x, y, 0), s"$x,$y")
      assert((argb & 0xff) === frames.head.px(x, y, 2), s"$x,$y")
    }
  }

  test("APNG decoder rejects out-of-subset and corrupt streams") {
    val frames = (0 until 3).map(f => mkImage(6, 6, 1, seed = f))
    val good = encodeApng(frames)
    // break an fdAT sequence number: find the fdAT chunk and bump it
    val broken = good.clone()
    var i = 8
    var done = false
    while (!done && i + 8 <= broken.length) {
      val len = ((broken(i) & 0xff) << 24) | ((broken(i + 1) & 0xff) << 16) |
        ((broken(i + 2) & 0xff) << 8) | (broken(i + 3) & 0xff)
      val typ = new String(broken, i + 4, 4, "US-ASCII")
      if (typ == "fdAT") { broken(i + 11) = 99.toByte; done = true }
      else i += 12 + len
    }
    assert(done && decodeApng(broken).isEmpty)
    // truncation
    assert(decodeApng(good.take(good.length / 2)).isEmpty)
  }

  test("toGray: fixed-point BT.601 weights, paper-checked") {
    val img = Image(2, 1, 3, Array[Byte](255.toByte, 0, 0, 10, 20, 30))
    val g = toGray(img)
    assert(g.px(0, 0) === (77 * 255) / 256)
    assert(g.px(1, 0) === (77 * 10 + 150 * 20 + 29 * 30) / 256)
  }
}
