package graft.ops

import java.io.ByteArrayOutputStream

/** JPEG arithmetic entropy coding (ITU-T T.81 Annex D + F.1.4/F.2.4):
  * the QM-coder with the Annex-F DC/AC statistical models — the
  * sequential-DCT arithmetic alternative to Huffman that SOF9 streams
  * carry. This closes the one documented JpegCodec hole (arithmetic
  * streams previously returned a loud None).
  *
  * Sources: the coder follows the published T.81 flowcharts (Decode /
  * Estimate_after_MPS / Estimate_after_LPS / Renorm / Byte-in, figures
  * F.25–F.29, and the encoder figures D.1–D.8 / F.1.4), with the
  * register discipline used by the interoperable decoders (lazy
  * renormalization, carry resolved through byte stacking). The
  * probability state machine is T.81 Table D.3 verbatim (113 adaptive
  * states + the non-adaptive 0.5 bin used for AC signs), packed one
  * INT per state as (Qe<<16)|(NMPS<<8)|(SWITCH<<7)|NLPS — the state
  * BYTE stores the current index in bits 0..6 and the MPS sense in
  * bit 7, so Estimate_after_X is one XOR (the SWITCH bit rides the
  * NLPS byte and flips the MPS sense exactly when the table says so).
  *
  * Cross-validated in JpegArithSpec against fixtures produced by an
  * independent implementation (libjpeg62's arithmetic coder, run
  * offline): byte-exact ENCODE of the same quantized coefficients and
  * exact coefficient recovery on DECODE, plus my-encode -> my-decode
  * roundtrips over synthesized images. Scale: entropy coding is
  * per-row CPU work inside the codec mapPartitions loop — the
  * multimodal pattern (no shuffle implications).
  */
private[ops] object JpegArith {

  /** T.81 Table D.3 (Qe values and probability estimation state
    * machine), packed (Qe<<16)|(NMPS<<8)|(SWITCH<<7)|NLPS. Entry 113
    * is the fixed non-adaptive 0.5 bin (NMPS=NLPS=113, no switch)
    * that AC sign decisions use. */
  private val Tab: Array[Int] = Array(
    0x5A1D0181, 0x2586020E, 0x11140310, 0x080B0412, 0x03D80514, 0x01DA0617,
    0x00E50719, 0x006F081C, 0x0036091E, 0x001A0A21, 0x000D0B23, 0x00060C09,
    0x00030D0A, 0x00010D0C, 0x5A7F0F8F, 0x3F251024, 0x2CF21126, 0x207C1227,
    0x17B91328, 0x1182142A, 0x0CEF152B, 0x09A1162D, 0x072F172E, 0x055C1830,
    0x04061931, 0x03031A33, 0x02401B34, 0x01B11C36, 0x01441D38, 0x00F51E39,
    0x00B71F3B, 0x008A203C, 0x0068213E, 0x004E223F, 0x003B2320, 0x002C0921,
    0x5AE125A5, 0x484C2640, 0x3A0D2741, 0x2EF12843, 0x261F2944, 0x1F332A45,
    0x19A82B46, 0x15182C48, 0x11772D49, 0x0E742E4A, 0x0BFB2F4B, 0x09F8304D,
    0x0861314E, 0x0706324F, 0x05CD3330, 0x04DE3432, 0x040F3532, 0x03633633,
    0x02D43734, 0x025C3835, 0x01F83936, 0x01A43A37, 0x01603B38, 0x01253C39,
    0x00F63D3A, 0x00CB3E3B, 0x00AB3F3D, 0x008F203D, 0x5B1241C1, 0x4D044250,
    0x412C4351, 0x37D84452, 0x2FE84553, 0x293C4654, 0x23794756, 0x1EDF4857,
    0x1AA94957, 0x174E4A48, 0x14244B48, 0x119C4C4A, 0x0F6B4D4A, 0x0D514E4B,
    0x0BB64F4D, 0x0A40304D, 0x583251D0, 0x4D1C5258, 0x438E5359, 0x3BDD545A,
    0x34EE555B, 0x2EAE565C, 0x299A575D, 0x25164756, 0x557059D8, 0x4CA95A5F,
    0x44D95B60, 0x3E225C61, 0x38245D63, 0x32B45E63, 0x2E17565D, 0x56A860DF,
    0x4F466165, 0x47E56266, 0x41CF6367, 0x3C3D6468, 0x375E5D63, 0x52316669,
    0x4C0F676A, 0x4639686B, 0x415E6367, 0x56276AE9, 0x50E76B6C, 0x4B85676D,
    0x55976D6E, 0x504F6B6F, 0x5A106FEE, 0x55226D70, 0x59EB6FF0, 0x5A1D7171)

  /** One-element state area for the non-adaptive 0.5 bin. A decode or
    * encode against it re-stores index 113 (NMPS=NLPS=113, switch 0),
    * so sharing one mutable byte across blocks is sound. */
  private[ops] def freshFixedBin: Array[Byte] = Array(113.toByte)

  // -------------------------------------------------- the QM decoder

  /** T.81 F.2 decoder over a JPEG entropy segment. Consumes stuffed
    * 0xFF00 pairs as data 0xFF; the first real marker stops input and
    * zero bytes feed from then on (the spec's convention — the
    * encoder's final flush only relies on trailing zeros). */
  private[ops] final class Decoder(p: Array[Byte], var pos: Int) {
    private var c = 0L
    private var a = 0L
    private var ct = -16
    private var markerSeen = false

    /** Re-init at a restart interval boundary (stats reset is the
      * caller's job — statistics areas belong to the model). */
    def restartAt(newPos: Int): Unit = {
      pos = newPos; c = 0; a = 0; ct = -16; markerSeen = false
    }

    def hitMarker: Boolean = markerSeen

    private def byteIn(): Int = {
      if (markerSeen || pos >= p.length) { markerSeen = true; return 0 }
      var d = p(pos) & 0xff
      if (d == 0xff) {
        var q = pos + 1
        while (q < p.length && (p(q) & 0xff) == 0xff) q += 1 // fill bytes
        val f = if (q < p.length) p(q) & 0xff else 0xd9
        if (f == 0) { pos = q + 1; d = 0xff } // stuffed data byte
        else { markerSeen = true; d = 0 } // real marker: zeros from now
      } else pos += 1
      d
    }

    /** Decode one binary decision against state byte `st(idx)`
      * (index in bits 0..6, MPS sense in bit 7). Lazy
      * renormalization: the interval refills at the TOP of the next
      * call, and the first call's two-byte warm-up rides the same
      * loop (the ct<0 startup ladder). */
    def decode(st: Array[Byte], idx: Int): Int = {
      while (a < 0x8000L) {
        ct -= 1
        if (ct < 0) {
          c = (c << 8) | byteIn()
          ct += 8
          if (ct < 0) { ct += 1; if (ct == 0) a = 0x8000L }
        }
        a <<= 1
      }
      val sv = st(idx) & 0xff
      val packed = Tab(sv & 0x7f)
      val qe = (packed >>> 16).toLong
      val nl = packed & 0xff
      val nm = (packed >>> 8) & 0x7f
      a -= qe
      var bit = sv >> 7
      val temp = a << ct
      if (c >= temp) {
        // code point in the TOP (Qe-sized) subinterval
        c -= temp
        if (a < qe) { a = qe; st(idx) = ((sv & 0x80) ^ nm).toByte }
        else { a = qe; st(idx) = ((sv & 0x80) ^ nl).toByte; bit ^= 1 }
      } else if (a < 0x8000L) {
        if (a < qe) { st(idx) = ((sv & 0x80) ^ nl).toByte; bit ^= 1 }
        else st(idx) = ((sv & 0x80) ^ nm).toByte
      }
      bit
    }
  }

  // -------------------------------------------------- the QM encoder

  /** T.81 D.1 encoder. Carry resolution: the last finished byte is
    * HELD (`buffer`), runs of 0xFF are stacked (`sc`) because a later
    * carry turns them into 0x00s, and zero bytes are deferred (`zc`)
    * so a flush never emits a trailing-zero tail the decoder would
    * not need. Every finalized 0xFF data byte gets its 0x00 stuffing
    * on the way out. */
  private[ops] final class Encoder(out: ByteArrayOutputStream) {
    private var c = 0L
    private var a = 0x10000L
    private var sc = 0
    private var zc = 0
    private var ct = 11
    private var buffer = -1

    def reset(): Unit = { c = 0; a = 0x10000L; sc = 0; zc = 0; ct = 11; buffer = -1 }

    private def emit(b: Int): Unit = out.write(b & 0xff)
    private def emitZeros(): Unit = { while (zc > 0) { emit(0); zc -= 1 } }

    def encode(st: Array[Byte], idx: Int, bit: Int): Unit = {
      val sv = st(idx) & 0xff
      val packed = Tab(sv & 0x7f)
      val qe = (packed >>> 16).toLong
      val nl = packed & 0xff
      val nm = (packed >>> 8) & 0x7f
      a -= qe
      if (bit != (sv >> 7)) {
        // LPS path (with conditional exchange when Qe grew past A-Qe)
        if (a >= qe) { c += a; a = qe }
        st(idx) = ((sv & 0x80) ^ nl).toByte
      } else {
        // MPS path: no renorm means no state change (fast exit)
        if (a >= 0x8000L) return
        if (a < qe) { c += a; a = qe }
        st(idx) = ((sv & 0x80) ^ nm).toByte
      }
      do {
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
      } while (a < 0x8000L)
    }

    private def byteOut(): Unit = {
      val temp = (c >> 19).toInt
      if (temp > 0xff) {
        // carry: bump the held byte, stacked 0xFFs collapse to 0x00s
        if (buffer >= 0) {
          emitZeros()
          emit(buffer + 1)
          if (buffer + 1 == 0xff) emit(0x00)
        }
        zc += sc; sc = 0
        buffer = temp & 0xff // spacer bits keep this below 0xFF
      } else if (temp == 0xff) {
        sc += 1 // stack: a later carry may still flip it
      } else {
        // temp < 0xFF: everything stacked is final
        if (buffer == 0) zc += 1
        else if (buffer >= 0) { emitZeros(); emit(buffer) }
        if (sc > 0) {
          emitZeros()
          while (sc > 0) { emit(0xff); emit(0x00); sc -= 1 }
        }
        buffer = temp
      }
      c &= 0x7ffffL
      ct = 8
    }

    /** T.81 D.1.8 termination: pick the code point in the final
      * interval with the most trailing zeros, flush the pipeline,
      * emit only the non-zero tail. */
    def finish(): Unit = {
      val t = (a - 1 + c) & 0xffff0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      if ((c & 0xf8000000L) != 0) {
        if (buffer >= 0) {
          emitZeros()
          emit(buffer + 1)
          if (buffer + 1 == 0xff) emit(0x00)
        }
        zc += sc; sc = 0
      } else {
        if (buffer == 0) zc += 1
        else if (buffer >= 0) { emitZeros(); emit(buffer) }
        if (sc > 0) {
          emitZeros()
          while (sc > 0) { emit(0xff); emit(0x00); sc -= 1 }
        }
      }
      if ((c & 0x7fff800L) != 0) {
        emitZeros()
        val b1 = ((c >> 19) & 0xff).toInt
        emit(b1); if (b1 == 0xff) emit(0x00)
        if ((c & 0x7f800L) != 0) {
          val b2 = ((c >> 11) & 0xff).toInt
          emit(b2); if (b2 == 0xff) emit(0x00)
        }
      }
      reset()
    }
  }

  // ---------------------------------------- Annex F statistical model

  /** Arithmetic conditioning (the DAC marker's payload): DC low/high
    * thresholds and the AC Kx boundary, with the T.81 defaults. */
  final case class Conditioning(dcL: Int = 0, dcU: Int = 1, acKx: Int = 5)

  /** Per-scan model state for one conditioning table set: DC area is
    * 64 bins (5 context classes x 4 + X chain at 20 + M bins at +14),
    * AC area is 256 (3 per k, low/high magnitude chains at 189/217). */
  private[ops] final class Stats {
    val dc = new Array[Byte](64)
    val ac = new Array[Byte](256)
    def reset(): Unit = {
      java.util.Arrays.fill(dc, 0.toByte)
      java.util.Arrays.fill(ac, 0.toByte)
    }
  }

  /** Decode one block's DC value (T.81 F.2.4.1). Returns the new DC
    * predictor; `ctx` carries the per-component conditioning context
    * in slot 0 and the running DC predictor in slot 1. */
  private[ops] def decodeDc(dec: Decoder, stats: Stats, ctx: Array[Int],
      cond: Conditioning): Int = {
    val st = stats.dc
    val base = ctx(0)
    if (dec.decode(st, base) == 0) ctx(0) = 0
    else {
      val sign = dec.decode(st, base + 1)
      var m = dec.decode(st, base + 2 + sign)
      var x = base + 2 + sign
      if (m != 0) {
        x = 20
        while (dec.decode(st, x) == 1) {
          m <<= 1
          require(m != 0x8000, "arith DC magnitude overflow")
          x += 1
        }
      }
      ctx(0) =
        if (m < ((1 << cond.dcL) >> 1)) 0
        else if (m > ((1 << cond.dcU) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      var v = m
      val bits = x + 14
      while ({ m >>= 1; m != 0 }) if (dec.decode(st, bits) == 1) v |= m
      v += 1
      ctx(1) += (if (sign == 1) -v else v)
    }
    ctx(1)
  }

  /** Decode one block's AC run (T.81 F.2.4.2) into `coef` in zigzag
    * index space (caller dequantizes/reorders). */
  private[ops] def decodeAc(dec: Decoder, stats: Stats,
      fixedBin: Array[Byte], cond: Conditioning,
      coefZig: Array[Int]): Unit = {
    val st = stats.ac
    var k = 1
    var done = false
    while (!done && k <= 63) {
      var base = 3 * (k - 1)
      if (dec.decode(st, base) == 1) done = true // EOB
      else {
        while (dec.decode(st, base + 1) == 0) {
          k += 1
          require(k <= 63, "arith AC run past block end")
          base = 3 * (k - 1)
        }
        val sign = dec.decode(fixedBin, 0)
        var m = dec.decode(st, base + 2)
        var bits = base + 2 + 14
        if (m != 0 && dec.decode(st, base + 2) != 0) {
          m = 2
          var x = if (k <= cond.acKx) 189 else 217
          while (dec.decode(st, x) == 1) {
            m <<= 1
            require(m != 0x8000, "arith AC magnitude overflow")
            x += 1
          }
          bits = x + 14
        }
        var v = m
        while ({ m >>= 1; m != 0 }) if (dec.decode(st, bits) == 1) v |= m
        v += 1
        coefZig(k) = if (sign == 1) -v else v
        k += 1
      }
    }
  }

  /** Encode one block's DC diff (T.81 F.1.4.1; exact mirror of
    * [[decodeDc]]). `ctx` as in decodeDc. */
  private[ops] def encodeDc(enc: Encoder, stats: Stats, ctx: Array[Int],
      cond: Conditioning, dcValue: Int): Unit = {
    val st = stats.dc
    val base = ctx(0)
    val diff = dcValue - ctx(1)
    ctx(1) = dcValue
    if (diff == 0) { enc.encode(st, base, 0); ctx(0) = 0 }
    else {
      enc.encode(st, base, 1)
      var v = diff
      var sign = 0
      if (v < 0) { v = -v; sign = 1 }
      enc.encode(st, base + 1, sign)
      var x = base + 2 + sign
      var m = 0
      v -= 1
      if (v != 0) {
        enc.encode(st, x, 1)
        m = 1
        var v2 = v
        x = 20
        while ({ v2 >>= 1; v2 != 0 }) { enc.encode(st, x, 1); m <<= 1; x += 1 }
      }
      enc.encode(st, x, 0)
      ctx(0) =
        if (m < ((1 << cond.dcL) >> 1)) 0
        else if (m > ((1 << cond.dcU) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      val bits = x + 14
      while ({ m >>= 1; m != 0 })
        enc.encode(st, bits, if ((m & v) != 0) 1 else 0)
    }
  }

  /** Encode one block's AC coefficients (zigzag index space; exact
    * mirror of [[decodeAc]]). */
  private[ops] def encodeAc(enc: Encoder, stats: Stats,
      fixedBin: Array[Byte], cond: Conditioning,
      coefZig: Array[Int]): Unit = {
    val st = stats.ac
    var ke = 63
    while (ke > 0 && coefZig(ke) == 0) ke -= 1
    var k = 1
    while (k <= ke) {
      var base = 3 * (k - 1)
      enc.encode(st, base, 0) // not EOB yet
      var v = coefZig(k)
      while (v == 0) {
        enc.encode(st, base + 1, 0)
        k += 1; base = 3 * (k - 1)
        v = coefZig(k)
      }
      enc.encode(st, base + 1, 1)
      var sign = 0
      if (v < 0) { v = -v; sign = 1 }
      enc.encode(fixedBin, 0, sign)
      var x = base + 2
      var m = 0
      v -= 1
      if (v != 0) {
        enc.encode(st, x, 1)
        m = 1
        var v2 = v
        if ({ v2 >>= 1; v2 != 0 }) {
          enc.encode(st, x, 1)
          m <<= 1
          x = if (k <= cond.acKx) 189 else 217
          while ({ v2 >>= 1; v2 != 0 }) {
            enc.encode(st, x, 1); m <<= 1; x += 1
          }
        }
      }
      enc.encode(st, x, 0)
      val bits = x + 14
      while ({ m >>= 1; m != 0 })
        enc.encode(st, bits, if ((m & v) != 0) 1 else 0)
      k += 1
    }
    if (k <= 63) enc.encode(st, 3 * (k - 1), 1) // EOB
  }
}
