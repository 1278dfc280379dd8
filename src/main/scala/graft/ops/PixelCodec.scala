package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media codecs for the multimodal path -- REAL pixel and
  * sample decode, no external libraries (`java.util.zip` carries the
  * PNG compression; everything else is byte arithmetic):
  *
  *  - PNG (ISO/IEC 15948): 8-bit greyscale / grey+alpha / RGB / RGBA,
  *    all five scanline filters (None / Sub / Up / Average / Paeth,
  *    spec 9.2) on both encode and decode, multi-IDAT tolerant, CRC
  *    written on encode. The encoder cycles filter types across rows
  *    so every decoder path is exercised by round-trip data.
  *  - BMP (BITMAPINFOHEADER): 24-bit uncompressed, bottom-up rows,
  *    4-byte row padding.
  *  - GIF (87a/89a): LZW implemented from the spec -- variable code
  *    widths 9..12, dictionary reset at 4096, KwKwK case, 255-byte
  *    sub-blocks; global/local palettes, extensions skipped.
  *  - WAV (RIFF): PCM mono 16-bit little-endian, chunk-walk tolerant
  *    of extra chunks (LIST etc).
  *
  * Plus the exact-integer pixel ops the oracle gates build on -- box
  * average resize, aHash, dHash -- written so the same arithmetic is
  * expressible in ANSI SQL (integer division, no floats), which is
  * what lets a DuckDB oracle check a Spark decode of real PNG bytes
  * bit-for-bit (see MultimodalOps pixel queries).
  *
  * Decoders return Option: truncated or foreign payloads yield None
  * so a partition task can fall back instead of dying. Cross-checked
  * against the JDK's own ImageIO codec in both directions by
  * PixelCodecSpec.
  */
object PixelCodec {

  /** Row-major, channel-interleaved 8-bit image. channels: 1 = grey,
    * 2 = grey+alpha, 3 = RGB, 4 = RGBA. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    def px(x: Int, y: Int, c: Int = 0): Int =
      pixels((y * width + x) * channels + c) & 0xff
  }

  // ------------------------------------------------------------------ PNG

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

  private def w32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }

  private def chunk(o: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    w32(o, data.length)
    val t = typ.getBytes("US-ASCII")
    o.write(t, 0, 4)
    o.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    w32(o, crc.getValue.toInt)
  }

  /** PNG spec 9.4: predictor closest to p = a + b - c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    case n => throw new IllegalArgumentException(s"channels $n")
  }

  /** Filter + deflate an image's scanlines into a complete zlib
    * stream (the payload of an IDAT -- or of one frame's fdAT run in
    * an APNG, which the spec requires to be its own datastream). */
  private def filterCompress(img: Image, filterMix: Boolean): Array[Byte] = {
    val bpp = img.channels
    val stride = img.width * bpp
    val raw = new Array[Byte]((stride + 1) * img.height)
    val prior = new Array[Byte](stride)
    var y = 0
    while (y < img.height) {
      val f = if (filterMix) y % 5 else 0
      val ro = y * (stride + 1)
      raw(ro) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xff else 0
        val up = prior(x) & 0xff
        val ul = if (x >= bpp) prior(x - bpp) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(ro + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      System.arraycopy(img.pixels, y * stride, prior, 0, stride)
      y += 1
    }
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val zo = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zo.write(buf, 0, d.deflate(buf))
    d.end()
    zo.toByteArray
  }

  /** Inverse of [[filterCompress]]: inflate a complete zlib stream
    * and undo the per-row filters. None on truncated/corrupt data. */
  private def inflateDefilter(data: Array[Byte], w: Int, h: Int,
      channels: Int): Option[Array[Byte]] = {
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    inf.setInput(data)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (off < raw.length) return None
    val out = new Array[Byte](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      val ro = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val enc = raw(ro + x) & 0xff
        val left = if (x >= bpp) out(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) out((y - 1) * stride + x - bpp) & 0xff
          else 0
        val cur = f match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + (left + up) / 2
          case 4 => enc + paeth(left, up, ul)
          case _ => return None
        }
        out(y * stride + x) = (cur & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  private def ihdrBytes(w: Int, h: Int, channels: Int): Array[Byte] = {
    val ihdr = new ByteArrayOutputStream()
    w32(ihdr, w); w32(ihdr, h)
    ihdr.write(8); ihdr.write(colorType(channels))
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    ihdr.toByteArray
  }

  /** Encode as a spec-conformant PNG. Rows cycle through the five
    * filter types (row r uses filter r mod 5) so round-trip tests
    * exercise every de-filter path; `filterMix = false` writes
    * filter 0 everywhere (the simplest valid stream). */
  def encodePng(img: Image, filterMix: Boolean = true): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(PngSig, 0, 8)
    chunk(o, "IHDR", ihdrBytes(img.width, img.height, img.channels))
    chunk(o, "IDAT", filterCompress(img, filterMix))
    chunk(o, "IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** Decode any 8-bit-depth non-interlaced grey / grey+alpha / RGB /
    * RGBA PNG (palette and 16-bit streams return None). Concatenates
    * multiple IDAT chunks; ancillary chunks are skipped. */
  def decodePng(p: Array[Byte]): Option[Image] = {
    if (p.length < 8 || !java.util.Arrays.equals(p, 0, 8, PngSig, 0, 8))
      return None
    var i = 8
    var w = 0; var h = 0; var channels = 0
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= p.length) {
      val len = be32(p, i)
      if (len < 0 || i + 12 + len > p.length) return None
      val typ = new String(p, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(p, i + 8); h = be32(p, i + 12)
          val bitDepth = p(i + 16) & 0xff
          val ct = p(i + 17) & 0xff
          val interlace = p(i + 20) & 0xff
          if (bitDepth != 8 || interlace != 0) return None
          channels = ct match {
            case 0 => 1; case 4 => 2; case 2 => 3; case 6 => 4
            case _ => return None
          }
          if (w <= 0 || h <= 0) return None
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary
      }
      i += 12 + len
    }
    if (w == 0 || idat.size == 0) return None
    inflateDefilter(idat.toByteArray, w, h, channels)
      .map(Image(w, h, channels, _))
  }

  // ----------------------------------------------------------------- APNG

  /** Animated PNG (the public APNG extension, now part of the PNG
    * spec third edition): full-frame subset -- every frame the
    * canvas size, x/y offset 0, dispose OP_NONE, blend OP_SOURCE, the
    * first frame part of the animation (fcTL before IDAT). Each
    * frame's data is its own complete zlib stream, frame 0 in IDAT,
    * later frames in fdAT chunks carrying the shared fcTL/fdAT
    * sequence numbering the spec mandates. The output is also a valid
    * STATIC PNG whose image is frame 0 -- APNG's compatibility
    * guarantee, pinned in the spec via ImageIO. */
  def encodeApng(frames: Seq[Image], delayNum: Int = 1,
      delayDen: Int = 10, filterMix: Boolean = true): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val f0 = frames.head
    require(frames.forall(f => f.width == f0.width &&
      f.height == f0.height && f.channels == f0.channels),
      "full-frame subset: all frames share the canvas geometry")
    val o = new ByteArrayOutputStream()
    o.write(PngSig, 0, 8)
    chunk(o, "IHDR", ihdrBytes(f0.width, f0.height, f0.channels))
    val actl = new ByteArrayOutputStream()
    w32(actl, frames.length); w32(actl, 0) // loop forever
    chunk(o, "acTL", actl.toByteArray)
    var seq = 0
    def fctl(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      w32(b, seq); seq += 1
      w32(b, f0.width); w32(b, f0.height); w32(b, 0); w32(b, 0)
      b.write((delayNum >>> 8) & 0xff); b.write(delayNum & 0xff)
      b.write((delayDen >>> 8) & 0xff); b.write(delayDen & 0xff)
      b.write(0); b.write(0) // dispose OP_NONE, blend OP_SOURCE
      b.toByteArray
    }
    chunk(o, "fcTL", fctl())
    chunk(o, "IDAT", filterCompress(f0, filterMix))
    frames.drop(1).foreach { fr =>
      chunk(o, "fcTL", fctl())
      val fdat = new ByteArrayOutputStream()
      w32(fdat, seq); seq += 1
      val z = filterCompress(fr, filterMix)
      fdat.write(z, 0, z.length)
      chunk(o, "fdAT", fdat.toByteArray)
    }
    chunk(o, "IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** Decode the full-frame APNG subset [[encodeApng]] writes (plus
    * any conformant stream of that shape): frames in fcTL order,
    * frame 0 from IDAT, later frames from their fdAT runs (multiple
    * fdAT chunks per frame concatenate into one zlib stream). A plain
    * PNG (no acTL) decodes as a single frame. None on sub-frame
    * geometry (offsets / partial frames are out of the subset), bad
    * sequence numbers, or any static-PNG failure. */
  def decodeApng(p: Array[Byte]): Option[Seq[Image]] = {
    if (p.length < 8 || !java.util.Arrays.equals(p, 0, 8, PngSig, 0, 8))
      return None
    var i = 8
    var w = 0; var h = 0; var channels = 0
    var nFrames = -1
    var expectSeq = 0
    // frame assembly state: stream per started frame, in fcTL order
    val streams = scala.collection.mutable.ArrayBuffer
      .empty[ByteArrayOutputStream]
    var sawIdatFrame = false
    var sawEnd = false
    while (!sawEnd && i + 8 <= p.length) {
      val len = be32(p, i)
      if (len < 0 || i + 12 + len > p.length) return None
      val typ = new String(p, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(p, i + 8); h = be32(p, i + 12)
          val bitDepth = p(i + 16) & 0xff
          val ct = p(i + 17) & 0xff
          val interlace = p(i + 20) & 0xff
          if (bitDepth != 8 || interlace != 0) return None
          channels = ct match {
            case 0 => 1; case 4 => 2; case 2 => 3; case 6 => 4
            case _ => return None
          }
          if (w <= 0 || h <= 0) return None
        case "acTL" =>
          if (len < 8) return None
          nFrames = be32(p, i + 8)
          if (nFrames <= 0) return None
        case "fcTL" =>
          if (len < 26) return None
          if (be32(p, i + 8) != expectSeq) return None
          expectSeq += 1
          val (fw, fh) = (be32(p, i + 12), be32(p, i + 16))
          val (fx, fy) = (be32(p, i + 20), be32(p, i + 24))
          if (fw != w || fh != h || fx != 0 || fy != 0) return None
          streams += new ByteArrayOutputStream()
        case "IDAT" =>
          if (nFrames >= 0 && streams.isEmpty)
            return None // animated but first frame not in the animation
          if (streams.isEmpty) streams += new ByteArrayOutputStream()
          streams.head.write(p, i + 8, len)
          sawIdatFrame = true
        case "fdAT" =>
          if (len < 4 || streams.size < 2) return None
          if (be32(p, i + 8) != expectSeq) return None
          expectSeq += 1
          streams.last.write(p, i + 12, len - 4)
        case "IEND" => sawEnd = true
        case _ => ()
      }
      i += 12 + len
    }
    if (w == 0 || !sawIdatFrame) return None
    if (nFrames >= 0 && streams.size != nFrames) return None
    val frames = streams.map { st =>
      if (st.size == 0) return None
      inflateDefilter(st.toByteArray, w, h, channels) match {
        case Some(px) => Image(w, h, channels, px)
        case None => return None
      }
    }
    Some(frames.toSeq)
  }

  // ------------------------------------------------------------------ BMP

  private def le32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def rdLe32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
  private def rdLe16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  /** 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, BGR,
    * 4-byte row padding). Requires a 3-channel image. */
  def encodeBmp(img: Image): Array[Byte] = {
    require(img.channels == 3, "BMP path is 24-bit RGB")
    val rowBytes = img.width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * img.height
    val o = new ByteArrayOutputStream()
    o.write('B'); o.write('M')
    le32(o, 54 + dataSize); le32(o, 0); le32(o, 54)
    le32(o, 40); le32(o, img.width); le32(o, img.height)
    le16(o, 1); le16(o, 24); le32(o, 0); le32(o, dataSize)
    le32(o, 2835); le32(o, 2835); le32(o, 0); le32(o, 0)
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        o.write(img.px(x, y, 2)); o.write(img.px(x, y, 1))
        o.write(img.px(x, y, 0))
        x += 1
      }
      var k = 0
      while (k < pad) { o.write(0); k += 1 }
      y -= 1
    }
    o.toByteArray
  }

  /** Decode 24-bit uncompressed BMP; anything else returns None.
    * Handles both bottom-up (positive height) and top-down rows. */
  def decodeBmp(p: Array[Byte]): Option[Image] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOff = rdLe32(p, 10)
    val hdrSize = rdLe32(p, 14)
    if (hdrSize < 40) return None
    val w = rdLe32(p, 18)
    val hRaw = rdLe32(p, 22)
    val planes = rdLe16(p, 26)
    val bits = rdLe16(p, 28)
    val compression = rdLe32(p, 30)
    if (w <= 0 || hRaw == 0 || planes != 1 || bits != 24 ||
        compression != 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val rowBytes = w * 3
    val padded = rowBytes + (4 - rowBytes % 4) % 4
    if (dataOff.toLong + padded.toLong * h > p.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val ro = dataOff + srcRow * padded
      var x = 0
      while (x < w) {
        out((y * w + x) * 3) = p(ro + x * 3 + 2)     // R
        out((y * w + x) * 3 + 1) = p(ro + x * 3 + 1) // G
        out((y * w + x) * 3 + 2) = p(ro + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, 3, out))
  }

  // ------------------------------------------------------------------ WAV

  /** PCM mono 16-bit little-endian WAV. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes("US-ASCII")); le32(o, 36 + dataSize)
    o.write("WAVE".getBytes("US-ASCII"))
    o.write("fmt ".getBytes("US-ASCII")); le32(o, 16)
    le16(o, 1); le16(o, 1); le32(o, sampleRate)
    le32(o, sampleRate * 2); le16(o, 2); le16(o, 16)
    o.write("data".getBytes("US-ASCII")); le32(o, dataSize)
    samples.foreach { s => le16(o, s & 0xffff) }
    o.toByteArray
  }

  /** Decode PCM mono 16-bit WAV -> (samples, sampleRate). Walks the
    * chunk list, tolerating extra chunks before/after fmt and data;
    * non-PCM, multi-channel, or non-16-bit streams return None. */
  def decodeWav(p: Array[Byte]): Option[(Array[Short], Int)] = {
    if (p.length < 44 ||
        new String(p, 0, 4, "US-ASCII") != "RIFF" ||
        new String(p, 8, 4, "US-ASCII") != "WAVE") return None
    var i = 12
    var rate = 0; var ok = false
    var data: Array[Short] = null
    while (i + 8 <= p.length) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = rdLe32(p, i + 4)
      if (len < 0 || i + 8 + len > p.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = rdLe16(p, i + 8)
          val nCh = rdLe16(p, i + 10)
          rate = rdLe32(p, i + 12)
          val bps = rdLe16(p, i + 22)
          ok = fmt == 1 && nCh == 1 && bps == 16 && rate > 0
        case "data" =>
          val n = len / 2
          val arr = new Array[Short](n)
          var k = 0
          while (k < n) {
            arr(k) = rdLe16(p, i + 8 + k * 2).toShort
            k += 1
          }
          data = arr
        case _ => ()
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (ok && data != null) Some((data, rate)) else None
  }

  // ----------------------------------------------------------- G.711 u-law

  /** ITU-T G.711 mu-law — COMPRESSED telephony audio (WAV format tag
    * 7): 16-bit PCM quantized to 8 log-scaled bits per sample. Unlike
    * ADPCM it is STATELESS — each sample's quantize/reconstruct is a
    * pure integer bit formula — which is what makes a real lossy
    * audio codec exactly gateable cross-engine: the DuckDB oracle
    * applies the same clip/bias/segment/mantissa algebra per sample
    * (mm_audio_ulaw) and the hashes must agree bit-for-bit. */
  def ulawEncode(s: Int): Int = {
    val sign = if (s < 0) 0x80 else 0
    var m = if (s < 0) -s else s
    if (m > 32635) m = 32635 // clip (the all-segments-full ceiling)
    m += 132                 // bias puts the MSB in segment range
    val exp = 24 - Integer.numberOfLeadingZeros(m) // 0..7 for 132..32767
    val mant = (m >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  /** Segment midpoint reconstruction, the exact inverse algebra the
    * oracle mirrors: ((mant*8 + 132) << exp) - 132, negated on the
    * sign bit. */
  def ulawDecode(u: Int): Int = {
    val c = (~u) & 0xff
    val e = (c >> 4) & 7
    val t = ((((c & 0x0f) << 3) + 132) << e) - 132
    if ((c & 0x80) != 0) -t else t
  }

  /** Mono mu-law WAV (format tag 7, 8 bits per sample). */
  def encodeWavUlaw(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length
    val o = new ByteArrayOutputStream()
    o.write("RIFF".getBytes("US-ASCII")); le32(o, 36 + dataSize)
    o.write("WAVE".getBytes("US-ASCII"))
    o.write("fmt ".getBytes("US-ASCII")); le32(o, 16)
    le16(o, 7); le16(o, 1); le32(o, sampleRate)
    le32(o, sampleRate); le16(o, 1); le16(o, 8)
    o.write("data".getBytes("US-ASCII")); le32(o, dataSize)
    samples.foreach(s => o.write(ulawEncode(s.toInt)))
    o.toByteArray
  }

  /** Decode a mono mu-law WAV to reconstructed 16-bit samples; same
    * chunk-walk tolerance as [[decodeWav]]. Non-mu-law streams return
    * None. */
  def decodeWavUlaw(p: Array[Byte]): Option[(Array[Short], Int)] = {
    if (p.length < 44 ||
        new String(p, 0, 4, "US-ASCII") != "RIFF" ||
        new String(p, 8, 4, "US-ASCII") != "WAVE") return None
    var i = 12
    var rate = 0; var ok = false
    var data: Array[Short] = null
    while (i + 8 <= p.length) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = rdLe32(p, i + 4)
      if (len < 0 || i + 8 + len > p.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = rdLe16(p, i + 8)
          val nCh = rdLe16(p, i + 10)
          rate = rdLe32(p, i + 12)
          val bps = rdLe16(p, i + 22)
          ok = fmt == 7 && nCh == 1 && bps == 8 && rate > 0
        case "data" =>
          data = Array.tabulate(len)(k => ulawDecode(p(i + 8 + k) & 0xff).toShort)
        case _ => ()
      }
      i += 8 + len + (len & 1)
    }
    if (ok && data != null) Some((data, rate)) else None
  }

  // ------------------------------------------------------------------ GIF

  /** GIF (CompuServe 87a/89a) — the first genuinely COMPRESSED
    * container on this codec path whose coder is implemented from the
    * spec rather than delegated (PNG rides `java.util.zip`): variable
    * code-width LZW, dictionary reset at 4096 entries, little-endian
    * bit packing, 255-byte data sub-blocks. LZW is LOSSLESS, so
    * `decodeGif(encodeGif(img)) == img` exactly — which is what lets
    * a DuckDB oracle that recomputes only the pixel SYNTHESIS formula
    * hash-gate a Spark pipeline that pushed real GIF bytes through
    * both coders (mm_gif_roundtrip).
    *
    * Encoder: 8-bit grey (a 256-grey ramp global palette; use
    * [[toGray]] first for color). Decoder: first image block of an
    * 87a/89a stream, global or local color table, extension blocks
    * skipped, interlaced streams de-permuted (spec appendix E);
    * out-of-range codes and truncations return None (loud fallback,
    * like every codec here). Output is grey
    * (channels=1) when the palette is a pure grey ramp, RGB
    * otherwise. Cross-checked against the JDK's ImageIO GIF plugin
    * in both directions by PixelCodecSpec. */
  def encodeGif(img: Image): Array[Byte] = {
    require(img.channels == 1, "GIF encoder is 8-bit grey (toGray first)")
    val o = new ByteArrayOutputStream()
    o.write("GIF89a".getBytes("US-ASCII"))
    le16(o, img.width); le16(o, img.height)
    o.write(0xf7) // global color table, 8-bit resolution, 256 entries
    o.write(0)    // background color index
    o.write(0)    // pixel aspect ratio: unspecified
    var g = 0
    while (g < 256) { o.write(g); o.write(g); o.write(g); g += 1 }
    o.write(0x2c) // image descriptor
    le16(o, 0); le16(o, 0); le16(o, img.width); le16(o, img.height)
    o.write(0)    // no local table, not interlaced
    o.write(8)    // LZW minimum code size
    val lzw = lzwEncode(img.pixels, 8)
    var i = 0
    while (i < lzw.length) {
      val n = math.min(255, lzw.length - i)
      o.write(n); o.write(lzw, i, n); i += n
    }
    o.write(0)    // block terminator
    o.write(0x3b) // trailer
    o.toByteArray
  }

  /** GIF LZW, encode side. Width starts at minCode+1; the encoder
    * widens when the NEXT code to assign passes the current width
    * (next == (1 << width) + 1 — it runs one dictionary entry AHEAD
    * of the decoder, which widens at next == (1 << width)); at 4096
    * entries it emits CLEAR and resets rather than deferring. */
  private def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var width = minCode + 1
    var next = eoi + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, k: Int): Long = (prefix.toLong << 8) | k
    put(clear)
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xff
      val hit = dict.get(key(cur, k))
      if (hit != null) cur = hit.intValue()
      else {
        put(cur)
        dict.put(key(cur, k), Integer.valueOf(next))
        next += 1
        if (next == (1 << width) + 1 && width < 12) width += 1
        if (next == 4096) {
          put(clear)
          dict.clear(); next = eoi + 1; width = minCode + 1
        }
        cur = k
      }
      i += 1
    }
    put(cur)
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** GIF LZW, decode side: prefix/suffix table, KwKwK handling, widen
    * at next == (1 << width). Returns None on truncation or a code
    * beyond the table (corrupt stream) instead of guessing. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outPos = 0
    var width = minCode + 1
    var next = eoi + 1
    var acc = 0L; var nbits = 0; var pos = 0
    def read(): Int = {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8
      }
      if (nbits < width) -1
      else {
        val c = (acc & ((1L << width) - 1)).toInt
        acc >>>= width; nbits -= width; c
      }
    }
    def firstByte(code0: Int): Byte = {
      var code = code0
      while (code >= eoi + 1) code = prefix(code)
      code.toByte
    }
    var prev = -1
    var done = false
    while (!done) {
      val c = read()
      if (c == -1) return None // truncated before EOI
      else if (c == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
      else if (c == eoi) done = true
      else if (prev == -1) {
        if (c >= clear) return None // first data code must be a root
        if (outPos >= expected) return None
        out(outPos) = c.toByte; outPos += 1
        prev = c
      } else {
        var sp = 0
        var fb: Byte = 0
        if (c < next && c < clear) { // root code
          fb = c.toByte
          stack(sp) = fb; sp += 1
        } else if (c < next && c >= eoi + 1) { // table code
          var code = c
          while (code >= eoi + 1) {
            stack(sp) = suffix(code); sp += 1; code = prefix(code)
          }
          fb = code.toByte
          stack(sp) = fb; sp += 1
        } else if (c == next) { // KwKwK: string(prev) + firstByte(prev)
          fb = firstByte(prev)
          stack(sp) = fb; sp += 1 // pops LAST
          var code = prev
          while (code >= eoi + 1) {
            stack(sp) = suffix(code); sp += 1; code = prefix(code)
          }
          stack(sp) = code.toByte; sp += 1
        } else return None // beyond the table: corrupt
        if (outPos + sp > expected) return None
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = fb; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = c
      }
    }
    if (outPos != expected) None else Some(out)
  }

  /** Decode the first image of a GIF87a/89a stream; see [[encodeGif]]
    * for the supported envelope. */
  def decodeGif(p: Array[Byte]): Option[Image] = {
    if (p.length < 13) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val gPacked = p(10) & 0xff
    var i = 13
    var palette: Array[Int] = null
    def readPalette(at: Int, n: Int): Option[Array[Int]] =
      if (at + 3 * n > p.length) None
      else Some(Array.tabulate(n)(j =>
        ((p(at + 3 * j) & 0xff) << 16) | ((p(at + 3 * j + 1) & 0xff) << 8) |
          (p(at + 3 * j + 2) & 0xff)))
    if ((gPacked & 0x80) != 0) {
      val n = 2 << (gPacked & 7)
      palette = readPalette(i, n).getOrElse(return None)
      i += 3 * n
    }
    while (i < p.length) {
      (p(i) & 0xff) match {
        case 0x21 => // extension: label byte, then sub-blocks to a 0
          i += 2
          while (i < p.length && (p(i) & 0xff) != 0) i += 1 + (p(i) & 0xff)
          i += 1
        case 0x2c =>
          if (i + 10 > p.length) return None
          val w = rdLe16(p, i + 5); val h = rdLe16(p, i + 7)
          val iPacked = p(i + 9) & 0xff
          i += 10
          var pal = palette
          if ((iPacked & 0x80) != 0) {
            val n = 2 << (iPacked & 7)
            pal = readPalette(i, n).getOrElse(return None)
            i += 3 * n
          }
          val interlaced = (iPacked & 0x40) != 0
          if (pal == null || w <= 0 || h <= 0) return None
          if (i >= p.length) return None
          val minCode = p(i) & 0xff; i += 1
          if (minCode < 2 || minCode > 8) return None
          val dataBuf = new ByteArrayOutputStream()
          while (i < p.length && (p(i) & 0xff) != 0) {
            val n = p(i) & 0xff
            if (i + 1 + n > p.length) return None
            dataBuf.write(p, i + 1, n); i += 1 + n
          }
          val raw = lzwDecode(dataBuf.toByteArray, minCode, w * h) match {
            case Some(a) => a
            case None => return None
          }
          // interlace (spec appendix E): rows arrive in four passes
          // (start 0 step 8; 4/8; 2/4; 1/2) -- de-permute to raster
          val idx =
            if (!interlaced) raw
            else {
              val out = new Array[Byte](w * h)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < h) {
                  System.arraycopy(raw, src * w, out, y * w, w)
                  src += 1; y += step
                }
              }
              out
            }
          val isGrey = pal.forall(c =>
            ((c >> 16) & 0xff) == ((c >> 8) & 0xff) &&
              ((c >> 8) & 0xff) == (c & 0xff))
          if (isGrey) {
            val outG = new Array[Byte](w * h)
            var k = 0
            while (k < w * h) {
              val pi = idx(k) & 0xff
              if (pi >= pal.length) return None
              outG(k) = (pal(pi) & 0xff).toByte
              k += 1
            }
            return Some(Image(w, h, 1, outG))
          } else {
            val outC = new Array[Byte](w * h * 3)
            var k = 0
            while (k < w * h) {
              val pi = idx(k) & 0xff
              if (pi >= pal.length) return None
              val c = pal(pi)
              outC(k * 3) = ((c >> 16) & 0xff).toByte
              outC(k * 3 + 1) = ((c >> 8) & 0xff).toByte
              outC(k * 3 + 2) = (c & 0xff).toByte
              k += 1
            }
            return Some(Image(w, h, 3, outC))
          }
        case 0x3b => return None // trailer before any image block
        case _ => return None
      }
    }
    None
  }

  // ------------------------------------------------------ exact pixel ops

  /** Integer luminance: (77 R + 150 G + 29 B) >> 8 -- the fixed-point
    * BT.601 weights. Identity on 1-channel input; alpha is ignored. */
  def toGray(img: Image): Image =
    if (img.channels == 1) img
    else {
      val out = new Array[Byte](img.width * img.height)
      var i = 0
      while (i < out.length) {
        val base = i * img.channels
        val v =
          if (img.channels == 2) img.pixels(base) & 0xff
          else (77 * (img.pixels(base) & 0xff) +
            150 * (img.pixels(base + 1) & 0xff) +
            29 * (img.pixels(base + 2) & 0xff)) >> 8
        out(i) = v.toByte
        i += 1
      }
      Image(img.width, img.height, 1, out)
    }

  /** Box-average downscale in exact integer arithmetic: destination
    * (x, y) averages the source box whose columns map to x under
    * `c * dw / sw` (floor) -- i.e. the floor-partition of source
    * coords -- with truncating division for the mean. Deterministic
    * and closed-form in SQL (`group by c*dw//sw, r*dh//sh`), which is
    * how the oracle checks it. Upscale is out of scope (require
    * dw <= w, dh <= h). */
  def resizeArea(img: Image, dw: Int, dh: Int): Image = {
    require(dw >= 1 && dh >= 1 && dw <= img.width && dh <= img.height)
    val ch = img.channels
    val sums = new Array[Long](dw * dh * ch)
    val counts = new Array[Int](dw * dh)
    var y = 0
    while (y < img.height) {
      val dy = y * dh / img.height
      var x = 0
      while (x < img.width) {
        val dx = x * dw / img.width
        val di = dy * dw + dx
        counts(di) += 1
        var c = 0
        while (c < ch) {
          sums(di * ch + c) += img.px(x, y, c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](dw * dh * ch)
    var i = 0
    while (i < dw * dh) {
      var c = 0
      while (c < ch) {
        out(i * ch + c) = (sums(i * ch + c) / counts(i)).toByte
        c += 1
      }
      i += 1
    }
    Image(dw, dh, ch, out)
  }

  /** Average hash over an 8x8 grey image: bit (y*8+x) set iff
    * 64 * p(x, y) > sum(p) -- the scaled comparison avoids the mean
    * division so ties resolve identically everywhere. Returned as
    * (lo, hi) 32-bit halves in positive longs: 64-bit packing would
    * make bit 63 a sign bit and diverge between engines. */
  def aHash(gray8x8: Image): (Long, Long) = {
    require(gray8x8.width == 8 && gray8x8.height == 8 &&
      gray8x8.channels == 1)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += gray8x8.pixels(i) & 0xff; i += 1 }
    var lo = 0L; var hi = 0L
    i = 0
    while (i < 64) {
      if (64L * (gray8x8.pixels(i) & 0xff) > sum) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (lo, hi)
  }

  /** Difference hash over a 9x8 grey image: bit (y*8+x) set iff
    * p(x+1, y) > p(x, y). Same (lo, hi) halves packing as [[aHash]]. */
  def dHash(gray9x8: Image): (Long, Long) = {
    require(gray9x8.width == 9 && gray9x8.height == 8 &&
      gray9x8.channels == 1)
    var lo = 0L; var hi = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray9x8.px(x + 1, y) > gray9x8.px(x, y)) {
          val b = y * 8 + x
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
        x += 1
      }
      y += 1
    }
    (lo, hi)
  }
}
