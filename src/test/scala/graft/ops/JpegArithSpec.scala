package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Arithmetic-coded JPEG (T.81 Annex D QM coder + Annex F models),
  * cross-validated against an INDEPENDENT implementation: the
  * embedded fixtures were produced offline by libjpeg62's arithmetic
  * coder (r14; generator source recorded in PLANS.md). Three pins:
  *
  *  1. ENTROPY BYTE-EXACTNESS: encoding libjpeg's own quantized
  *     coefficient blocks with our QM coder reproduces libjpeg's
  *     entropy segment byte for byte — coder, carry/stuffing
  *     resolution, statistical model, and flush all agree;
  *  2. DECODE: our decoder on libjpeg's files lands within IDCT
  *     rounding (<= 2/255) of libjpeg's own pixels — grayscale,
  *     color 4:4:4, and restart-marker streams;
  *  3. ROUNDTRIP: our encoder -> our decoder is pixel-exact on
  *     constant-block images (the mm_jpeg_arith gate's trick) and
  *     agrees with the Huffman path everywhere else.
  */
class JpegArithSpec extends AnyFunSuite {
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  // 16x16 grayscale, q75, libjpeg arith_code=TRUE
  private val jpgA = unhex(
      "ffd8ffe000104a46494600010100000100010000ffdb0043000806060706050807070709" +
      "09080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c283729" +
      "2c30313434341f27393d38323c2e333432ffc9000b080010001001011100ffcc00060010" +
      "1005ffda0008010100003f00ff009c9075a3226192820cd3cefa9013c45f61552d004aa8" +
      "54e4e409e21e0eb702230c69a12e3a315f6d6b9a1903bc60bf40b1ef2a406ece08a9fc07" +
      "6d4b8e33a57b95fdfea88d46b6bf512ba967d93def94df7750ba9e849ea97e8636882049" +
      "dbec0d34bfb3d88d226e5660ffd9")
  private val pxA = unhex(
      "04060c131d252b2f373c444a5058636c0e151e262c343e465057626c74797c7d18232f37" +
      "3b44525d64666c7582909da5252e3b454d57646e838382808086929b363d4855616c757a" +
      "607187969ca4b0ba434a5664717a7f808a96a3a7a4a5adb54e5968767e8386899a9da1a5" +
      "adb9c8d25a697c888b8d9196a3a4a9b3c0cacece648186958398a4afaea5bed5b9ccede7" +
      "837d8fa59399c699b3c7e9c0d2f2c3e68180aebcaebdd2b9c6f4beddffd9fa0996a2baa2" +
      "aacda4d4e2cceafde2ff050095afc4afdde6cdeed6d2ffee0ce21526a7c2d6bfdebaf5ea" +
      "f218e700ff1d1e15bacfdcd0e9e5eef301ea00380f212b3cbfd9e7effaf50600170f2f0f" +
      "38323233")
  // 32x8 grayscale, restart interval 1 (a reset at EVERY MCU)
  private val jpgD = unhex(
      "ffd8ffe000104a46494600010100000100010000ffdb0043000806060706050807070709" +
      "09080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c283729" +
      "2c30313434341f27393d38323c2e333432ffc9000b080008002001011100ffcc00060010" +
      "1005ffdd00040001ffda0008010100003f00ff009c9075a3226192820cd3cefa90ffd0d0" +
      "b266213e2ca13c2d456c2dd4c71a29ffd1d2955f616e1a8920716b966d877d50c89a32fc" +
      "e07d71f432c3346632b20b2b9fcdff007c7cefbb40ffd2fca672f58256810c25d527d5be" +
      "c09b18c666a418976c684f9f9b6226ea4d5b23f3ccbefab769e3f512f33b98ffd9")
  private val pxD = unhex(
      "04060c131d252b2f373c444a5058636c78707c8584959ba2a0b7acbdc7c3d6da0e151e26" +
      "2c343e465057626c74797c7d8992a1a9b3b1c7bfd1dad0e0f1fdfaee18232f373b44525d" +
      "64666c7582909da58c949da8b8a5c6c6ccddf3e7fa0900ed252e3b454d57646e83838280" +
      "8086929baeadb6c4cec0c7d9e5d2f9fb000e1709363d4855616c757a607187969ca4b0ba" +
      "a4b1c1c5cfe8d5ebe4f2da170a142900434a5664717a7f808a96a3a7a4a5adb5c0d8d9c2" +
      "d1ece9f600f8ff00232426264e5968767e8386899a9da1a5adb9c8d2bcd6dae4ffd1f7ff" +
      "270d030d202637235a697c888b8d9196a3a4a9b3c0cacecee2e5daefee061105001e2f21" +
      "282a522d")
  // 16x16 color 4:4:4, q60, restart interval 2
  private val jpgE = unhex(
      "ffd8ffe000104a46494600010100000100010000ffdb0043000d090a0b0a080d0b0a0b0e" +
      "0e0d0f13201513121213271c1e17202e2931302e292d2c333a4a3e333646372c2d405741" +
      "464c4e525352323e5a615a50604a51524fffdb0043010e0e0e131113261515264f352d35" +
      "4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f" +
      "4f4f4f4f4f4f4f4f4f4f4f4f4f4fffc90011080010001003011100021101031101ffcc00" +
      "0a0010100501101105ffdd00040002ffda000c03010002110311003f00fe1ae4aabdb74f" +
      "729d8eb1380146c1a7e01b704c4f3689f1d81b8676fa432267e01b6e6fff0057ef85c8e4" +
      "8d7fa06b9bc8f340705c90ffd0fdd5b3f75d6b08dba6652d85da38987f3545b114fa1c64" +
      "bbe6d5e0ba72b80009840d7ba7a34dafaa64b14daaf22b54a7e9210f255f858cbdc10b1b" +
      "ecf37f21e07618a9cb59ce97aa7afd59792a20ffd9")
  private val pxE = unhex(
      "002d6108335d163b5621414e2d43503944584546654d48715553545c5855685c5e755d73" +
      "825d899161919e6c89a7747d0230880b3587183f8426477d324d783f53764b5a7b535d80" +
      "605eb266688f7274667d7c50887c54927c65a07f78a882810a4d601050691e5679275a85" +
      "345e8e3e64934b6c9951719a5e77a0657c9c72819e7d82a88982b69486bba08dada995a1" +
      "105b9f165dab1f60ba2963c63167c73c6ec34676be4d7eb9547eae5c84b76b88ca7a8ce2" +
      "888fea9697d7a3a7b2abb2911169cb176ecf2273ce2c79c73681ba418ba84e989b569f94" +
      "5a97ac649fa372aa9d81afac8fafc69caee0a7b1ecafb5ef1084b71888ba238bbe308fc5" +
      "3e92ce4e97db5f9fe968a6f36eaae677b0e584b8ea91b9f69bb8fea4baf6adc0e0b2c7ca" +
      "1790f91c93f12797e33497da4296dc5197ed629aff6c9cff73aafd7bafff89b5ff94baff" +
      "9ec1dda6ce90ade134b2ef001d9fff22a6e62bafa234b5583db91b4cbd005ac20063c500" +
      "68ca0370d20380d90b8ddc1f98da30a2d933abdf25afe31533a30139b61425b00d2fc11e" +
      "42d02c46c31f64c9257cd22f70d11f84e03380d32b98e43aa6eb3896d910aef115c9ff22" +
      "02c3461dd64a30dc3833d1183fcf0d49d10f55d71d74f34177ee207fff2d6ffc2489fe40" +
      "a1cf53a06142bd1050d5005e18da211dd22d3edb5638c65657e4716fff7e43ef4342fc37" +
      "6dfb5b79c257724f39951248b50060a90057ad0f66ac2a7026e55719ed4d34ff6c1ffc54" +
      "50ee7790c7a0672f6070005b93008591078170015d8024659e4074a42f66be296dcc2170" +
      "15ff6a27df6f5fa99040235b4c0059740c7f52005f6d2e7f64288a852e8f910e6eb71271" +
      "d42282c62180c53999c047a844009147118955338a341e5e3e26625e3788541987762ab0" +
      "69345e8f4a8b94389db13dbcc744c6bc37a4c44393c44980230d9c2911a72e10ae4119b7" +
      "6a36c9813fbd7d2f95863087921bcda33dd1883ea18a538d9b6893a36397c46dbbd36ece" +
      "1e2ab23c38c1452bb35e32bb6d3ac35c32ba6147ce6c5ce1884eb49e66d18c55ca965fd6" +
      "ad6ce2b363d2ca6bcfd067c4")

  // fixture A's quantized coefficient blocks (natural order, raster),
  // as libjpeg's own jpeg_read_coefficients reported them
  private val blocksA: Array[Array[Int]] = Array(
      Array(-49, -27, -3, -2, 0, 0, 0, 0, -45, 1, 3, 0, 0, 0, 0, 0, -2, 3, -1, 0, 0, 0, 0, 0, -4, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(12, -23, 1, -2, 0, 0, 0, 0, -43, 0, 0, 0, 0, 0, 0, 0, -4, 0, 0, 1, 0, 0, 0, 0, -7, 0, -1, -1, 0, 0, 0, 0, -3, 0, 0, 0, 0, 0, 0, 0, -1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, 0, 0, 0, 0, 0, 0),
      Array(52, -11, -17, -1, -2, -1, 1, 0, -26, -19, 12, -4, 0, 2, -1, 0, -12, 16, -10, 3, 0, 0, 0, -1, 7, -11, 8, -3, 0, 0, -1, 1, -7, 7, -3, 1, 0, -1, 1, -1, 3, -3, 2, -1, 0, 0, 0, 0, -1, 1, -1, 0, 0, 0, 0, 0, 1, -1, 0, 0, 0, 0, 0, 0),
      Array(14, 31, -24, 7, -5, -1, 2, 0, 81, -10, -7, 2, -1, 2, 0, -1, -20, -37, 17, -6, 1, -1, -3, 1, 0, 3, 7, -4, 2, 0, 2, 2, 0, 2, -2, -1, 0, 1, 2, -3, -3, 1, -1, 1, 0, -1, -2, -1, 0, 0, -1, 2, 1, 1, 0, 4, 0, 0, 1, -1, -2, 1, -2, -3))

  private def maxDelta(got: Array[Byte], want: Array[Byte]): Int = {
    assert(got.length === want.length)
    got.zip(want).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.max
  }

  test("QM encoder reproduces libjpeg's entropy segment byte-exactly") {
    // locate fixture A's scan data (after the SOS header, before EOI)
    var i = 2
    while (!((jpgA(i) & 0xff) == 0xff && (jpgA(i + 1) & 0xff) == 0xda)) {
      i += 2 + (((jpgA(i + 2) & 0xff) << 8) | (jpgA(i + 3) & 0xff))
    }
    val start = i + 2 + (((jpgA(i + 2) & 0xff) << 8) | (jpgA(i + 3) & 0xff))
    val seg = jpgA.slice(start, jpgA.length - 2)
    val o = new java.io.ByteArrayOutputStream()
    val enc = new JpegArith.Encoder(o)
    val dcStats = new JpegArith.Stats
    val acStats = new JpegArith.Stats
    val fixed = JpegArith.freshFixedBin
    val cond = JpegArith.Conditioning()
    val ctx = Array(0, 0)
    val zig = new Array[Int](64)
    blocksA.foreach { nat =>
      var k = 0
      while (k < 64) { zig(k) = nat(JpegCodec.Zigzag(k)); k += 1 }
      JpegArith.encodeDc(enc, dcStats, ctx, cond, zig(0))
      JpegArith.encodeAc(enc, acStats, fixed, cond, zig)
    }
    enc.finish()
    assert(o.toByteArray.toSeq === seg.toSeq)
  }

  test("decode libjpeg arithmetic: grayscale within IDCT rounding") {
    val img = JpegCodec.decodeJpeg(jpgA).get
    assert((img.width, img.height, img.channels) === ((16, 16, 1)))
    assert(maxDelta(img.pixels, pxA) <= 1)
  }

  test("decode with restart interval 1: model resets at every MCU") {
    val img = JpegCodec.decodeJpeg(jpgD).get
    assert((img.width, img.height, img.channels) === ((32, 8, 1)))
    assert(maxDelta(img.pixels, pxD) <= 1)
  }

  test("decode color 4:4:4 with restarts: within conversion rounding") {
    val img = JpegCodec.decodeJpeg(jpgE).get
    assert((img.width, img.height, img.channels) === ((16, 16, 3)))
    assert(maxDelta(img.pixels, pxE) <= 2)
  }

  test("roundtrip: constant-block exact; lossy path equals Huffman twin") {
    val w = 24; val h = 16
    val const = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 40 + by * 60 + 30) % 256).toByte
    }
    val img = PixelCodec.Image(w, h, 1, const)
    val back = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegArith(img, JpegCodec.QuantExact)).get
    assert(back.pixels.toSeq === const.toSeq)
    // arbitrary content: the arithmetic and Huffman entropy layers
    // wrap the SAME fdct/quant/idct, so decodes must be identical
    val grad = PixelCodec.Image(w, h, 1,
      Array.tabulate(w * h)(i => ((i * 7) % 256).toByte))
    val viaHuff = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(grad)).get
    val viaArith = JpegCodec.decodeJpeg(JpegCodec.encodeJpegArith(grad)).get
    assert(viaArith.pixels.toSeq === viaHuff.pixels.toSeq)
    // color roundtrip through the arithmetic path decodes
    val rgb = PixelCodec.Image(8, 8, 3,
      Array.tabulate(192)(i => ((i * 5 + 11) % 256).toByte))
    assert(JpegCodec.decodeJpeg(JpegCodec.encodeJpegArith(rgb)).isDefined)
  }

  test("encoder restart intervals: exact roundtrip, libjpeg-decodable shape") {
    // restartInterval=1 exercises the heaviest churn: the coder
    // terminates, an RSTn lands, and every statistics area / context /
    // predictor resets at EVERY MCU. Constant-block + QuantExact makes
    // the roundtrip pixel-exact. (Interop was additionally validated
    // offline in r14: libjpeg62 decodes this encoder's restart streams
    // to within IDCT rounding - PLANS.md.)
    val w = 32; val h = 16
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 37 + by * 51 + 20) % 256).toByte
    }
    val img = PixelCodec.Image(w, h, 1, px)
    val bytes = JpegCodec.encodeJpegArith(img, JpegCodec.QuantExact,
      restartInterval = 1)
    // the stream really carries restart markers
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xd0 &&
        (bytes(i + 1) & 0xff) <= 0xd7))
    assert(JpegCodec.decodeJpeg(bytes).get.pixels.toSeq === px.toSeq)
  }

  // 16x16 grayscale PROGRESSIVE arithmetic (SOF10, libjpeg
  // jpeg_simple_progression: spectral selection + successive
  // approximation, so DC/AC first AND refine scans are all present)
  private val jpgP = unhex(
      "ffd8ffe000104a46494600010100000100010000ffdb0043000806060706050807070709" +
      "09080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c283729" +
      "2c30313434341f27393d38323c2e333432ffca000b080010001001011100ffcc00040010" +
      "ffda0008010100000001ff003b263ab6d0ffcc00041005ffda0008010100010502138fc2" +
      "dd01815b22d5162144790527ffcc00041005ffda0008010100063f025e1c3663246d79bb" +
      "c7af0b541a5f4e1c5b80000070ffcc00041005ffda0008010100013f21cd305f408f64b7" +
      "2d6aa1a5f4787b282f24aa56b7d8ffda0008010100000010b0ffcc00041005ffda000801" +
      "0100013f10e218996e21a54c90b93c521294fea955fde1008dee6e07c013b37362788882" +
      "b1f8d5ffd9")
  private val pxP = unhex(
      "04060c131d252b2f373c444a5058636c0e151e262c343e465057626c74797c7d18232f37" +
      "3b44525d64666c7582909da5252e3b454d57646e838382808086929b363d4855616c757a" +
      "607187969ca4b0ba434a5664717a7f808a96a3a7a4a5adb54e5968767e8386899a9da1a5" +
      "adb9c8d25a697c888b8d9196a3a4a9b3c0cacece648186958398a4afaea5bed5b9ccede7" +
      "837d8fa59399c699b3c7e9c0d2f2c3e68180aebcaebdd2b9c6f4beddffd9fa0996a2baa2" +
      "aacda4d4e2cceafde2ff050095afc4afdde6cdeed6d2ffee0ce21526a7c2d6bfdebaf5ea" +
      "f218e700ff1d1e15bacfdcd0e9e5eef301ea00380f212b3cbfd9e7effaf50600170f2f0f" +
      "38323233")
  // 16x16 color 4:4:4 progressive arithmetic, restart interval 2
  private val jpgQ = unhex(
      "ffd8ffe000104a46494600010100000100010000ffdb0043000d090a0b0a080d0b0a0b0e" +
      "0e0d0f13201513121213271c1e17202e2931302e292d2c333a4a3e333646372c2d405741" +
      "464c4e525352323e5a615a50604a51524fffdb0043010e0e0e131113261515264f352d35" +
      "4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f4f" +
      "4f4f4f4f4f4f4f4f4f4f4f4f4f4fffca0011080010001003011100021101031101ffcc00" +
      "0600100110ffdd00040002ffda000c03010002100310000001fc00393c436dffd0fb9131" +
      "26a4ffcc00041005ffda00080101000105021816ff009e80ffd08469a99280ffcc000411" +
      "05ffda0008010301013f011e4ec814ffd0143f9b0ccc1c0d99a0ffcc00041105ffda0008" +
      "010201013f013d2276365ee94edce0ffd09d29731cef96be80ffcc00041005ffda000801" +
      "0100063f02c0ffd0757a47f13980ffcc00041005ffda0008010100013f2144cb2ae0ffd0" +
      "13ce192924a36240ffda000c0301000200030000001088ffd0f4ffcc00041105ffda0008" +
      "010301013f10b29a08ffd00a1fe7f2be560b4e9b92440fe640ffcc00041105ffda000801" +
      "0201013f10d664e6919d71c5df0f6eccffd0de4064ae5700028cb8b07d40ffcc00041005" +
      "ffda0008010100013f105c5ad449ebd1ffd0ee628c84570872a4e0df5723d528a84cffd9")
  private val pxQ = unhex(
      "002d6108335d163b5621414e2d43503944584546654d48715553545c5855685c5e755d73" +
      "825d899161919e6c89a7747d0230880b3587183f8426477d324d783f53764b5a7b535d80" +
      "605eb266688f7274667d7c50887c54927c65a07f78a882810a4d601050691e5679275a85" +
      "345e8e3e64934b6c9951719a5e77a0657c9c72819e7d82a88982b69486bba08dada995a1" +
      "105b9f165dab1f60ba2963c63167c73c6ec34676be4d7eb9547eae5c84b76b88ca7a8ce2" +
      "888fea9697d7a3a7b2abb2911169cb176ecf2273ce2c79c73681ba418ba84e989b569f94" +
      "5a97ac649fa372aa9d81afac8fafc69caee0a7b1ecafb5ef1084b71888ba238bbe308fc5" +
      "3e92ce4e97db5f9fe968a6f36eaae677b0e584b8ea91b9f69bb8fea4baf6adc0e0b2c7ca" +
      "1790f91c93f12797e33497da4296dc5197ed629aff6c9cff73aafd7bafff89b5ff94baff" +
      "9ec1dda6ce90ade134b2ef001d9fff22a6e62bafa234b5583db91b4cbd005ac20063c500" +
      "68ca0370d20380d90b8ddc1f98da30a2d933abdf25afe31533a30139b61425b00d2fc11e" +
      "42d02c46c31f64c9257cd22f70d11f84e03380d32b98e43aa6eb3896d910aef115c9ff22" +
      "02c3461dd64a30dc3833d1183fcf0d49d10f55d71d74f34177ee207fff2d6ffc2489fe40" +
      "a1cf53a06142bd1050d5005e18da211dd22d3edb5638c65657e4716fff7e43ef4342fc37" +
      "6dfb5b79c257724f39951248b50060a90057ad0f66ac2a7026e55719ed4d34ff6c1ffc54" +
      "50ee7790c7a0672f6070005b93008591078170015d8024659e4074a42f66be296dcc2170" +
      "15ff6a27df6f5fa99040235b4c0059740c7f52005f6d2e7f64288a852e8f910e6eb71271" +
      "d42282c62180c53999c047a844009147118955338a341e5e3e26625e3788541987762ab0" +
      "69345e8f4a8b94389db13dbcc744c6bc37a4c44393c44980230d9c2911a72e10ae4119b7" +
      "6a36c9813fbd7d2f95863087921bcda33dd1883ea18a538d9b6893a36397c46dbbd36ece" +
      "1e2ab23c38c1452bb35e32bb6d3ac35c32ba6147ce6c5ce1884eb49e66d18c55ca965fd6" +
      "ad6ce2b363d2ca6bcfd067c4")

  test("decode progressive arithmetic (SOF10): full scan script, grayscale") {
    val img = JpegCodec.decodeJpeg(jpgP).get
    assert((img.width, img.height, img.channels) === ((16, 16, 1)))
    assert(maxDelta(img.pixels, pxP) <= 1)
  }

  test("decode progressive arithmetic: color 4:4:4 with restarts") {
    val img = JpegCodec.decodeJpeg(jpgQ).get
    assert((img.width, img.height, img.channels) === ((16, 16, 3)))
    assert(maxDelta(img.pixels, pxQ) <= 2)
  }
}
