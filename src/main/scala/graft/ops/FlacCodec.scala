package graft.ops

/** FLAC codec implemented from the format specification (RFC 9639 /
  * xiph.org FLAC format) — no codec library, pure JVM, usable inside
  * executor tasks like the PNG/GIF/JPEG/WAV codecs in
  * [[PixelCodec]]/[[JpegCodec]].
  *
  * '''Decoder''' covers the full FLAC *subset* for ≤16-bit streams:
  * STREAMINFO + skipped metadata blocks, fixed and variable blocking
  * strategies (UTF-8-style coded frame/sample numbers), all block-size
  * and sample-rate header codes, CONSTANT / VERBATIM / FIXED(0–4) /
  * LPC(1–32) subframes, wasted bits, both Rice residual methods
  * (4- and 5-bit parameters) with escape partitions, and all four
  * channel assignments (independent, left/side, right/side,
  * mid/side). STRICT: header CRC-8, frame CRC-16, and the STREAMINFO
  * MD5 of the decoded stream are all verified — corrupt bytes fail
  * loudly, because a silently-wrong sample in a 100 TB corpus is a
  * poisoned training row.
  *
  * '''Encoder''' targets the streamable subset: 16-bit mono/stereo,
  * fixed 4096-sample blocks, independent channels, per-block best
  * FIXED predictor (order 0–2 by absolute-residual sum, CONSTANT when
  * flat), single-partition Rice residuals with escape fallback. Every
  * produced stream round-trips through the decoder bit-exactly — the
  * lossless gate the oracle rides (encode ∘ decode = identity), the
  * same trick as the gzip/GIF gates.
  *
  * Layout notes pinned by spec section: frame sync 0b11111111111110;
  * Rice quotients are unary as q zeros then a one; side channels
  * carry one extra bit; mid is floor((l+r)/2) reconstructed via
  * `mid2 = (mid<<1)|(side&1); l=(mid2+side)>>1; r=(mid2-side)>>1`. */
object FlacCodec {

  // ------------------------------------------------------------ CRCs
  // CRC-8 poly x^8+x^2+x^1+1 (0x07), init 0 — frame header.
  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }

  // CRC-16 poly x^16+x^15+x^2+1 (0x8005), init 0 — whole frame.
  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table((c ^ (bytes(i) & 0xff)) & 0xff); i += 1 }
    c
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Table(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c & 0xffff
  }

  // ---------------------------------------------------------- bit IO
  private final class BitWriter {
    private var buf = new Array[Byte](1 << 12)
    private var byteLen = 0
    private var cur = 0
    private var nbits = 0
    private def ensure(n: Int): Unit =
      if (byteLen + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, byteLen + n))
    def writeBits(value: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((value >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { ensure(1); buf(byteLen) = cur.toByte; byteLen += 1; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { var i = 0; while (i < q) { writeBits(0, 1); i += 1 }; writeBits(1, 1) }
    def alignByte(): Unit = while (nbits != 0) writeBits(0, 1)
    def position: Int = { require(nbits == 0, "unaligned"); byteLen }
    def result(): Array[Byte] = { require(nbits == 0, "unaligned"); java.util.Arrays.copyOf(buf, byteLen) }
    def patchByte(at: Int, v: Int): Unit = buf(at) = v.toByte
  }

  private final class BitReader(bytes: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0
    def aligned: Boolean = bitPos == 0
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def readBit(): Int = {
      require(bytePos < bytes.length, "flac: truncated stream")
      val b = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSignedBits(n: Int): Long = {
      val v = readBits(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n)
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
  }

  // --------------------------------------------------- fixed predict
  /** residual of FIXED order `o` at t (t >= o), from raw samples */
  private def fixedResidual(x: Array[Int], t: Int, o: Int): Long = o match {
    case 0 => x(t)
    case 1 => x(t).toLong - x(t - 1)
    case 2 => x(t).toLong - 2L * x(t - 1) + x(t - 2)
    case 3 => x(t).toLong - 3L * x(t - 1) + 3L * x(t - 2) - x(t - 3)
    case 4 => x(t).toLong - 4L * x(t - 1) + 6L * x(t - 2) - 4L * x(t - 3) + x(t - 4)
    case _ => throw new IllegalArgumentException(s"fixed order $o")
  }

  private def fixedPredict(x: Array[Long], t: Int, o: Int): Long = o match {
    case 0 => 0L
    case 1 => x(t - 1)
    case 2 => 2L * x(t - 1) - x(t - 2)
    case 3 => 3L * x(t - 1) - 3L * x(t - 2) + x(t - 3)
    case 4 => 4L * x(t - 1) - 6L * x(t - 2) + 4L * x(t - 3) - x(t - 4)
    case _ => throw new IllegalArgumentException(s"fixed order $o")
  }

  private def zigzag(r: Long): Long = (r << 1) ^ (r >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  // --------------------------------------------------------- encoder

  val BlockSize = 4096

  /** Encode 16-bit PCM (interleaved when channels == 2) as a subset
    * FLAC stream. */
  def encode(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels == 1 || channels == 2, s"flac encode: $channels channels")
    require(samples.length % channels == 0, "flac encode: ragged interleave")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"flac encode: rate $sampleRate")
    val nSamples = samples.length / channels
    val md5 = java.security.MessageDigest.getInstance("MD5")
    // MD5 of the raw stream: interleaved samples, little-endian
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val digest = md5.digest(raw)

    val w = new BitWriter
    // "fLaC"
    w.writeBits(0x664c6143L, 32)
    // STREAMINFO: last-block flag 1, type 0, length 34
    w.writeBits(1, 1); w.writeBits(0, 7); w.writeBits(34, 24)
    w.writeBits(BlockSize, 16); w.writeBits(BlockSize, 16) // min/max block
    w.writeBits(0, 24); w.writeBits(0, 24)                 // min/max frame (unknown)
    w.writeBits(sampleRate, 20)
    w.writeBits(channels - 1, 3)
    w.writeBits(16 - 1, 5)
    w.writeBits(nSamples.toLong, 36)
    digest.foreach(b => w.writeBits(b & 0xffL, 8))

    var frameIdx = 0L
    var off = 0
    while (off < nSamples) {
      val bs = math.min(BlockSize, nSamples - off); locally {
        val frameStart = w.position
        // header: sync + reserved + blocking strategy (0 = fixed)
        w.writeBits(0x3ffe, 14); w.writeBits(0, 1); w.writeBits(0, 1)
        // block size: 16-bit value-1 follows (code 0b0111) — uniform
        w.writeBits(0x7, 4)
        // sample rate: from STREAMINFO (code 0)
        w.writeBits(0x0, 4)
        // channel assignment: mono = independent; stereo picks the
        // cheapest of independent / left-side / right-side / mid-side
        // by the same absolute-residual proxy the subframe coder uses
        // (the standard FLAC stereo decorrelation decision)
        val perChan: Array[Array[Int]] = Array.tabulate(channels) { ch =>
          val x = new Array[Int](bs)
          var t = 0
          while (t < bs) { x(t) = samples((off + t) * channels + ch).toInt; t += 1 }
          x
        }
        val (chanCode, coded): (Int, Seq[(Array[Int], Int)]) =
          if (channels == 1) (0, Seq((perChan(0), 16)))
          else {
            val l = perChan(0); val rr = perChan(1)
            val side = new Array[Int](bs); val mid = new Array[Int](bs)
            var t = 0
            while (t < bs) {
              side(t) = l(t) - rr(t); mid(t) = (l(t) + rr(t)) >> 1; t += 1
            }
            def cost(x: Array[Int]): Long = {
              var best = Long.MaxValue
              var o = 0
              while (o <= 2 && o < bs) {
                var s = 0L; var tt = o
                while (tt < bs) { s += math.abs(fixedResidual(x, tt, o)); tt += 1 }
                if (s < best) best = s
                o += 1
              }
              if (best == Long.MaxValue) 0L else best
            }
            val (cl, cr, cs, cm) = (cost(l), cost(rr), cost(side), cost(mid))
            Seq(
              (1, cl + cr, Seq((l, 16), (rr, 16))),
              (8, cl + cs, Seq((l, 16), (side, 17))),
              (9, cr + cs, Seq((side, 17), (rr, 16))),
              (10, cm + cs, Seq((mid, 16), (side, 17))))
              .minBy(_._2) match { case (code, _, seq) => (code, seq) }
          }
        w.writeBits(chanCode.toLong, 4)
        w.writeBits(0x4, 3)          // 16 bits per sample
        w.writeBits(0, 1)            // reserved
        writeUtf8Coded(w, frameIdx)
        w.writeBits((bs - 1).toLong, 16)
        // CRC-8 over header bytes so far: close the byte boundary first
        // (header is byte-aligned by construction: 14+1+1+4+4+4+3+1 = 32
        // bits, UTF-8 whole bytes, 16-bit block size)
        val headerEnd = w.position
        w.writeBits(0, 8) // placeholder
        val hcrcAt = headerEnd
        coded.foreach { case (x, chBps) => writeSubframe(w, x, chBps) }
        w.alignByte()
        val bodyEnd = w.position
        w.writeBits(0, 16) // CRC-16 placeholder
        // patch CRCs: re-read written bytes
        val all = w.result()
        val hc = crc8(all, frameStart, hcrcAt)
        w.patchByte(hcrcAt, hc)
        val all2 = w.result()
        val fc = crc16(all2, frameStart, bodyEnd)
        w.patchByte(bodyEnd, (fc >> 8) & 0xff)
        w.patchByte(bodyEnd + 1, fc & 0xff)
        frameIdx += 1
      }
      off += bs
    }
    w.result()
  }

  /** frame/sample number: the spec's UTF-8-style variable coding. */
  private def writeUtf8Coded(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.writeBits(v, 8)
    else if (v < 0x800) {
      w.writeBits(0xc0L | (v >> 6), 8); w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      w.writeBits(0xe0L | (v >> 12), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else {
      // up to 2^21 frames is plenty for the gate path
      w.writeBits(0xf0L | (v >> 18), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    }
  }

  private def writeSubframe(w: BitWriter, x: Array[Int], bps: Int): Unit = {
    val bs = x.length
    // CONSTANT?
    var const = true
    var t = 1
    while (const && t < bs) { if (x(t) != x(0)) const = false; t += 1 }
    w.writeBits(0, 1) // padding
    if (const && bs > 0) {
      w.writeBits(0, 6) // type CONSTANT
      w.writeBits(0, 1) // no wasted bits
      w.writeBits(x(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // best FIXED order 0..2 by absolute residual sum
    var bestO = 0; var bestSum = Long.MaxValue
    var o = 0
    while (o <= 2 && o < bs) {
      var s = 0L; var tt = o
      while (tt < bs) { s += math.abs(fixedResidual(x, tt, o)); tt += 1 }
      if (s < bestSum) { bestSum = s; bestO = o }
      o += 1
    }
    w.writeBits(8L + bestO, 6) // type FIXED, order bestO
    w.writeBits(0, 1)          // no wasted bits
    var tt = 0
    while (tt < bestO) { w.writeBits(x(tt).toLong & ((1L << bps) - 1), bps); tt += 1 }
    val n = bs - bestO
    val res = new Array[Long](n)
    var j = 0
    while (j < n) { res(j) = fixedResidual(x, j + bestO, bestO); j += 1 }
    // residual: method 0 (4-bit Rice), partition order 0
    w.writeBits(0, 2); w.writeBits(0, 4)
    // Rice parameter from mean magnitude; escape to raw when huge
    var sumAbs = 0L
    j = 0; while (j < n) { sumAbs += math.abs(res(j)); j += 1 }
    val mean = if (n == 0) 0L else sumAbs / math.max(n, 1)
    var p = 0
    while (p < 14 && (1L << p) < mean + 1) p += 1
    // raw escape when quotients would explode (defensive; p<=14 here)
    var maxU = 0L
    j = 0; while (j < n) { val u = zigzag(res(j)); if (u > maxU) maxU = u; j += 1 }
    val worstQ = maxU >> p
    if (worstQ > 60) {
      var bits = 1
      while (bits < 32 && (maxU >> 1) >= (1L << (bits - 1))) bits += 1
      bits += 1 // signed headroom
      w.writeBits(0xf, 4) // escape
      w.writeBits(bits.toLong, 5)
      j = 0
      while (j < n) { w.writeBits(res(j) & ((1L << bits) - 1), bits); j += 1 }
    } else {
      w.writeBits(p.toLong, 4)
      j = 0
      while (j < n) {
        val u = zigzag(res(j))
        w.writeUnary((u >> p).toInt)
        w.writeBits(u & ((1L << p) - 1), p)
        j += 1
      }
    }
  }

  // --------------------------------------------------------- decoder

  /** Decode a FLAC stream: (interleaved samples, sampleRate,
    * channels). None when the magic is absent; corrupt streams past
    * the magic THROW (strict — see class doc). */
  def decode(bytes: Array[Byte]): Option[(Array[Short], Int, Int)] = {
    if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return None
    val r = new BitReader(bytes)
    r.bytePos = 4
    // metadata blocks
    var last = false
    var sampleRate = 0; var channels = 0; var bps = 0; var total = 0L
    var md5Expect: Array[Byte] = null
    var sawStreamInfo = false
    while (!last) {
      last = r.readBits(1) == 1
      val btype = r.readBits(7).toInt
      val len = r.readBits(24).toInt
      if (btype == 0) {
        sawStreamInfo = true
        r.readBits(16); r.readBits(16) // min/max block
        r.readBits(24); r.readBits(24) // min/max frame
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        total = r.readBits(36)
        md5Expect = new Array[Byte](16)
        var i = 0
        while (i < 16) { md5Expect(i) = r.readBits(8).toByte; i += 1 }
      } else {
        var i = 0
        while (i < len) { r.readBits(8); i += 1 }
      }
    }
    require(sawStreamInfo, "flac: no STREAMINFO")
    require(bps <= 16, s"flac: $bps-bit streams not supported (subset-16)")
    require(channels >= 1 && channels <= 2,
      s"flac: $channels channels not supported")
    // Untrusted-header allocation bound (the JpegCodec hardening,
    // applied to the shared sniff-dispatch path): STREAMINFO's 36-bit
    // sample count is attacker-controlled and read before any frame
    // is validated. A FLAC frame cannot encode a sample in zero
    // bytes: even a maximally-compressed constant frame spends its
    // ~10-byte header + footer per <= 65535 samples, so total samples
    // are bounded by bytes.length * 65536 with room to spare — a
    // 50-byte stream demanding multi-GB output rejects here instead
    // of OOMing, and the Int cast below can no longer truncate into
    // an undersized array that frame emission overruns.
    val declared = total * channels
    require(declared <= bytes.length.toLong * 65536L,
      s"flac: STREAMINFO declares $total samples x $channels channels " +
        s"but the stream is only ${bytes.length} bytes — corrupt header")
    require(declared <= Int.MaxValue,
      s"flac: $declared interleaved samples exceed one array")
    val out = new Array[Short](declared.toInt)
    var written = 0L
    val md5 = java.security.MessageDigest.getInstance("MD5")
    while (written < total) {
      val frameStart = r.bytePos
      require(r.aligned, "flac: frame not byte-aligned")
      val sync = r.readBits(14)
      require(sync == 0x3ffe, f"flac: bad sync $sync%x at $frameStart")
      require(r.readBits(1) == 0, "flac: reserved bit set")
      val variableBlocking = r.readBits(1) == 1
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanCode = r.readBits(4).toInt
      val bpsCode = r.readBits(3).toInt
      require(r.readBits(1) == 0, "flac: frame reserved bit set")
      readUtf8Coded(r, if (variableBlocking) 36 else 31)
      val blockSize = bsCode match {
        case 0 => throw new IllegalStateException("flac: reserved block size")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // values beyond STREAMINFO are read-and-ignored
        case 0xc => r.readBits(8)
        case 0xd | 0xe => r.readBits(16)
        case 0xf => throw new IllegalStateException("flac: invalid rate code")
        case _ => ()
      }
      val frameBps = bpsCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalStateException("flac: reserved bps code")
      }
      require(frameBps == bps, s"flac: frame bps $frameBps != stream $bps")
      val headerEnd = r.bytePos
      val hcrc = r.readBits(8).toInt
      require(hcrc == crc8(bytes, frameStart, headerEnd),
        "flac: frame header CRC-8 mismatch")
      // channels
      val chans: Array[Array[Long]] = chanCode match {
        case c if c <= 7 =>
          require(c + 1 == channels, "flac: channel count drifted")
          Array.tabulate(channels)(ch => decodeSubframe(r, blockSize, bps))
        case 8 => // left/side
          require(channels == 2, "flac: L/S in non-stereo")
          val l = decodeSubframe(r, blockSize, bps)
          val s = decodeSubframe(r, blockSize, bps + 1)
          val rr = new Array[Long](blockSize)
          var t = 0
          while (t < blockSize) { rr(t) = l(t) - s(t); t += 1 }
          Array(l, rr)
        case 9 => // right/side
          require(channels == 2, "flac: R/S in non-stereo")
          val s = decodeSubframe(r, blockSize, bps + 1)
          val rr = decodeSubframe(r, blockSize, bps)
          val l = new Array[Long](blockSize)
          var t = 0
          while (t < blockSize) { l(t) = rr(t) + s(t); t += 1 }
          Array(l, rr)
        case 10 => // mid/side
          require(channels == 2, "flac: M/S in non-stereo")
          val m = decodeSubframe(r, blockSize, bps)
          val s = decodeSubframe(r, blockSize, bps + 1)
          val l = new Array[Long](blockSize)
          val rr = new Array[Long](blockSize)
          var t = 0
          while (t < blockSize) {
            val mid2 = (m(t) << 1) | (s(t) & 1L)
            l(t) = (mid2 + s(t)) >> 1
            rr(t) = (mid2 - s(t)) >> 1
            t += 1
          }
          Array(l, rr)
        case c => throw new IllegalStateException(s"flac: channel code $c")
      }
      r.alignByte()
      val bodyEnd = r.bytePos
      val fcrc = r.readBits(16).toInt
      require(fcrc == crc16(bytes, frameStart, bodyEnd),
        "flac: frame CRC-16 mismatch")
      val emit = math.min(blockSize.toLong, total - written).toInt
      var t = 0
      while (t < emit) {
        var ch = 0
        while (ch < channels) {
          val v = chans(ch)(t)
          require(v >= Short.MinValue && v <= Short.MaxValue,
            s"flac: sample $v out of 16-bit range")
          val idx = ((written + t) * channels + ch).toInt
          out(idx) = v.toShort
          md5.update((v & 0xff).toByte)
          md5.update(((v >> 8) & 0xff).toByte)
          ch += 1
        }
        t += 1
      }
      written += emit
    }
    if (md5Expect.exists(_ != 0)) {
      val got = md5.digest()
      require(java.util.Arrays.equals(got, md5Expect),
        "flac: MD5 signature mismatch — stream corrupt")
    }
    Some((out, sampleRate, channels))
  }

  private def readUtf8Coded(r: BitReader, maxBits: Int): Long = {
    val b0 = r.readBits(8).toInt
    val extra =
      if ((b0 & 0x80) == 0) return b0.toLong
      else if ((b0 & 0xe0) == 0xc0) 1
      else if ((b0 & 0xf0) == 0xe0) 2
      else if ((b0 & 0xf8) == 0xf0) 3
      else if ((b0 & 0xfc) == 0xf8) 4
      else if ((b0 & 0xfe) == 0xfc) 5
      else if (b0 == 0xfe) 6
      else throw new IllegalStateException("flac: bad coded number")
    var v = (b0 & (0x3f >> extra)).toLong
    var i = 0
    while (i < extra) {
      val b = r.readBits(8).toInt
      require((b & 0xc0) == 0x80, "flac: bad coded-number continuation")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    require(r.readBits(1) == 0, "flac: subframe padding bit set")
    val ty = r.readBits(6).toInt
    val wastedFlag = r.readBits(1) == 1
    val wasted = if (wastedFlag) r.readUnary() + 1 else 0
    val effBps = bps - wasted
    val x = new Array[Long](blockSize)
    ty match {
      case 0 => // CONSTANT
        val v = r.readSignedBits(effBps)
        java.util.Arrays.fill(x, v)
      case 1 => // VERBATIM
        var t = 0
        while (t < blockSize) { x(t) = r.readSignedBits(effBps); t += 1 }
      case t0 if t0 >= 8 && t0 <= 12 => // FIXED order 0..4
        val o = t0 - 8
        var t = 0
        while (t < o) { x(t) = r.readSignedBits(effBps); t += 1 }
        val res = decodeResidual(r, blockSize, o)
        t = o
        while (t < blockSize) { x(t) = res(t - o) + fixedPredict(x, t, o); t += 1 }
      case t0 if t0 >= 32 => // LPC order 1..32
        val o = t0 - 31
        var t = 0
        while (t < o) { x(t) = r.readSignedBits(effBps); t += 1 }
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "flac: invalid LPC precision")
        val shift = r.readSignedBits(5).toInt
        require(shift >= 0, "flac: negative LPC shift")
        val coefs = new Array[Long](o)
        var j = 0
        while (j < o) { coefs(j) = r.readSignedBits(precision); j += 1 }
        val res = decodeResidual(r, blockSize, o)
        t = o
        while (t < blockSize) {
          var acc = 0L
          j = 0
          while (j < o) { acc += coefs(j) * x(t - 1 - j); j += 1 }
          x(t) = res(t - o) + (acc >> shift)
          t += 1
        }
      case other => throw new IllegalStateException(s"flac: subframe type $other")
    }
    if (wasted > 0) { var t = 0; while (t < blockSize) { x(t) <<= wasted; t += 1 } }
    x
  }

  private def decodeResidual(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"flac: residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    require(blockSize % parts == 0, "flac: partition order misfit")
    val res = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      require(count >= 0, "flac: first partition shorter than order")
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val bits = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          res(idx) = if (bits == 0) 0L else r.readSignedBits(bits)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | r.readBits(param)
          res(idx) = unzigzag(u)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    res
  }
}
