package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec behaviors derived from the format spec (RFC 9639), not
  * engine-vs-oracle: lossless round-trips across block shapes and
  * stereo decorrelation modes, published CRC check values (the
  * independent pin that breaks encoder/decoder error correlation),
  * strict corruption failure, and a HAND-CRAFTED frame exercising
  * decoder paths the subset encoder never emits (LPC, 5-bit Rice2,
  * wasted bits, partition order > 0). */
class FlacCodecSpec extends AnyFunSuite {

  private def synth(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n)(t => (((seed * 31 + t * 17) % 65536) - 32768).toShort)

  test("mono round-trip: empty, tiny, exact-block, partial-block, multi-block") {
    for (n <- Seq(0, 1, 5, 100, 4096, 5000, 9000)) {
      val pcm = synth(n, 7)
      val bytes = FlacCodec.encode(pcm, 16000, 1)
      val (dec, rate, ch) = FlacCodec.decode(bytes).get
      assert(rate === 16000 && ch === 1, s"n=$n")
      assert(dec.toSeq === pcm.toSeq, s"n=$n")
    }
  }

  test("stereo round-trip across decorrelation-inducing shapes") {
    // correlated channels (drives mid/side), anti-correlated (side
    // cheap), independent noise-ish — all must survive bit-exactly
    val n = 5000
    val l = synth(n, 11)
    val shapes = Seq[Int => Short](
      t => (l(t) + (t % 7) - 3).toShort, // near-identical -> M/S or L/S
      t => (-l(t)).toInt.toShort,        // anti-correlated
      t => synth(n, 13)(t))              // independent
    for ((mk, i) <- shapes.zipWithIndex) {
      val inter = new Array[Short](2 * n)
      var t = 0
      while (t < n) { inter(2 * t) = l(t); inter(2 * t + 1) = mk(t); t += 1 }
      val bytes = FlacCodec.encode(inter, 44100, 2)
      val (dec, rate, ch) = FlacCodec.decode(bytes).get
      assert(rate === 44100 && ch === 2, s"shape $i")
      assert(dec.toSeq === inter.toSeq, s"shape $i")
    }
  }

  test("constant and spike blocks: CONSTANT subframe + Rice escape paths") {
    val flat = Array.fill[Short](4096)(123)
    val fb = FlacCodec.encode(flat, 8000, 1)
    assert(FlacCodec.decode(fb).get._1.toSeq === flat.toSeq)
    // a CONSTANT block costs ~the header, far less than verbatim
    assert(fb.length < 200, s"constant block did not compress: ${fb.length}")
    // all-zero with one spike: mean-derived Rice parameter is 0, the
    // quotient would be astronomic -> the escaped-raw partition path
    val spike = new Array[Short](4096); spike(2000) = 32767
    val sb = FlacCodec.encode(spike, 8000, 1)
    assert(FlacCodec.decode(sb).get._1.toSeq === spike.toSeq)
  }

  test("compression is real on smooth signals") {
    val pcm = Array.tabulate(16384)(t =>
      (8000 * math.sin(t / 50.0)).toInt.toShort)
    val bytes = FlacCodec.encode(pcm, 16000, 1)
    assert(bytes.length < pcm.length * 2 / 2,
      s"smooth signal should compress >2x raw, got ${bytes.length} of ${pcm.length * 2}")
    assert(FlacCodec.decode(bytes).get._1.toSeq === pcm.toSeq)
  }

  test("published CRC check values pin the polynomials independently") {
    // CRC-8 (poly 0x07, init 0) of "123456789" = 0xF4; CRC-16/BUYPASS
    // (poly 0x8005, init 0, no reflect) = 0xFEE8 — reference vectors
    // from the standard CRC catalogue, NOT derived from this code.
    val digits = "123456789".getBytes("ASCII")
    val c8 = classOf[FlacCodec.type].getDeclaredMethods
      .find(_.getName == "crc8").get
    c8.setAccessible(true)
    assert(c8.invoke(FlacCodec, digits, Integer.valueOf(0),
      Integer.valueOf(9)).asInstanceOf[Int] === 0xF4)
    val c16 = classOf[FlacCodec.type].getDeclaredMethods
      .find(_.getName == "crc16").get
    c16.setAccessible(true)
    assert(c16.invoke(FlacCodec, digits, Integer.valueOf(0),
      Integer.valueOf(9)).asInstanceOf[Int] === 0xFEE8)
  }

  test("corruption fails loudly: flipped byte, truncation, bad magic") {
    val pcm = synth(5000, 3)
    val bytes = FlacCodec.encode(pcm, 16000, 1)
    assert(FlacCodec.decode("nope".getBytes ++ bytes.drop(4)).isEmpty)
    val flipped = bytes.clone
    flipped(bytes.length / 2) = (flipped(bytes.length / 2) ^ 0x40).toByte
    assertThrows[Exception](FlacCodec.decode(flipped))
    assertThrows[Exception](FlacCodec.decode(bytes.dropRight(3)))
  }

  /** Minimal spec-side bit writer for hand-crafting streams the
    * encoder never produces — MSB-first, mirrors the format doc. */
  private final class HandWriter {
    private val out = collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var n = 0
    def bits(v: Long, w: Int): this.type = {
      var i = w - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        i -= 1
      }
      this
    }
    def unary(q: Int): this.type = { (0 until q).foreach(_ => bits(0, 1)); bits(1, 1) }
    def align(): this.type = { while (n != 0) bits(0, 1); this }
    def bytes: Array[Byte] = out.toArray
  }

  test("hand-crafted frame: LPC + Rice2 + wasted bits + partition order 1") {
    // Stream: 16 samples, mono, 16-bit, rate 8000. Subframe: LPC
    // order 1, coef 2, shift 1 (prediction = floor(2*prev/2) = prev,
    // i.e. a delta coder), 1 wasted bit, residual method RICE2 with
    // partition order 1 (two partitions of 8; first holds 8-1=7).
    // Samples chosen on paper: x = 2,4,6,...,32 (all even -> one
    // wasted bit; halved values 1..16, residual after delta = 1 each).
    val samples = Array.tabulate(16)(t => (2 * (t + 1)).toShort)
    val w = new HandWriter
    w.bits(0x664c6143L, 32) // fLaC
    w.bits(1, 1).bits(0, 7).bits(34, 24) // last block, STREAMINFO
    w.bits(16, 16).bits(16, 16) // min/max block 16
    w.bits(0, 24).bits(0, 24)
    w.bits(8000, 20).bits(0, 3).bits(15, 5).bits(16, 36)
    (0 until 16).foreach(_ => w.bits(0, 8)) // MD5 unset -> not checked
    val hcrcM = classOf[FlacCodec.type].getDeclaredMethods
      .find(_.getName == "crc8").get
    hcrcM.setAccessible(true)
    val frame2 = new HandWriter
    frame2.bits(0x3ffe, 14).bits(0, 1).bits(0, 1)
    frame2.bits(0x6, 4).bits(0x0, 4).bits(0x0, 4).bits(0x4, 3).bits(0, 1)
    frame2.bits(0, 8).bits(15, 8)
    val hb2 = frame2.bytes
    val hcrc2 = hcrcM.invoke(FlacCodec, hb2, Integer.valueOf(0),
      Integer.valueOf(hb2.length)).asInstanceOf[Int]
    frame2.bits(hcrc2.toLong, 8)
    frame2.bits(0, 1).bits(32, 6).bits(1, 1).unary(0)
    frame2.bits(1, 15)       // warmup: 2>>1 = 1
    frame2.bits(2, 4)        // precision-1 = 2 -> precision 3
    frame2.bits(1, 5)        // shift 1
    frame2.bits(2, 3)        // coef 2 (3-bit signed 010)
    // residual: halved samples 1..16; prediction for t>=1 is
    // (2*prev)>>1 = prev, residual = 1 -> zigzag u = 2.
    // method RICE2 (0b01), partition order 1 -> two partitions,
    // first 16/2 - 1 = 7 residuals, second 8.
    frame2.bits(1, 2).bits(1, 4)
    frame2.bits(1, 5)                       // partition 1: param 1
    (0 until 7).foreach(_ => frame2.unary(1).bits(0, 1)) // u=2: q=1,r=0
    frame2.bits(31, 5)                      // partition 2: ESCAPE (11111)
    frame2.bits(3, 5)                       // 3-bit raw residuals
    (0 until 8).foreach(_ => frame2.bits(1, 3)) // residual +1
    frame2.align()
    val body = frame2.bytes
    val fcrcM = classOf[FlacCodec.type].getDeclaredMethods
      .find(_.getName == "crc16").get
    fcrcM.setAccessible(true)
    val fcrc = fcrcM.invoke(FlacCodec, body, Integer.valueOf(0),
      Integer.valueOf(body.length)).asInstanceOf[Int]
    frame2.bits(fcrc.toLong, 16)
    val stream = w.bytes ++ frame2.bytes
    val (dec, rate, ch) = FlacCodec.decode(stream).get
    assert(rate === 8000 && ch === 1)
    assert(dec.toSeq === samples.toSeq)
  }

  test("a crafted header demanding gigabytes rejects before allocating") {
    // STREAMINFO's 36-bit sample count is untrusted input on the
    // sniff-dispatch path: a 50-byte stream declaring 2^35 samples
    // must reject on the byte-length bound (a frame cannot encode
    // samples in zero bytes), not OOM — and a count whose Int cast
    // truncates small must not undersize the output array either
    val good = FlacCodec.encode(Array.tabulate(64)(i => (i * 3).toShort), 8000)
    // total samples live at bit offset: magic(32) + block header(32) +
    // min/max block(32) + min/max frame(48) + rate(20) + chans(3) +
    // bps(5) = byte 21 bits 4..7 hold the top nibble of the 36-bit
    // count; overwrite the five count bytes with a huge declaration
    val evil = good.clone()
    evil(21) = ((evil(21) & 0xf0) | 0x08).toByte // 2^35 samples
    (22 to 25).foreach(i => evil(i) = 0)
    val e = intercept[IllegalArgumentException] { FlacCodec.decode(evil) }
    assert(e.getMessage.contains("corrupt header"))
  }
}
