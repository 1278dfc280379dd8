package graft.ops

import java.math.BigDecimal

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.TestSpark

/** Planted-data behavior for [[MultimodalOps.powerToWords]] -- the
  * base-1e18 hi/lo BIGINT decomposition every shipped spectrogram
  * gate rides (the r14 saga's durable output-type rule: >63-bit
  * accumulations cross the compare boundary as two plain BIGINTs,
  * never DECIMAL(38,0)). Properties derived from the definition,
  * not from engine-vs-oracle equality (the driver gate covers that):
  * for nonnegative power_sum, `p_hi * 1e18 + p_lo == power_sum`
  * exactly and `0 <= p_lo < 1e18` -- checked in BigInt arithmetic,
  * including values far above Long.MaxValue and both boundary
  * neighbors of the base.
  */
class PowerWordsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Base = BigInt("1000000000000000000") // 1e18

  private val planted: Seq[BigInt] = Seq(
    BigInt(0),
    BigInt(1),
    Base - 1,                        // max p_lo, p_hi = 0
    Base,                            // exactly one hi word
    Base + 1,
    BigInt(Long.MaxValue),           // largest value a single BIGINT could carry
    BigInt(Long.MaxValue) + 1,       // first value that CANNOT ride one BIGINT
    Base * 93 + BigInt("305593288069939200"), // a real sf0.01 gate row
    // the representation's own ceiling: p_hi = Long.MaxValue, p_lo =
    // 1e18-1 (~9.2e36; a DECIMAL(38,0) can exceed this, but a power
    // sum that large would need ~1e16 frames -- the gate never will)
    BigInt(Long.MaxValue) * Base + (Base - 1)
  )

  test("powerToWords is the exact base-1e18 decomposition, including >63-bit values") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bin", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("power_sum", DecimalType(38, 0))))
    val rows = planted.zipWithIndex.map { case (v, i) =>
      Row(i.toLong, i, 12, new BigDecimal(v.bigInteger))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val out = MultimodalOps.powerToWords(df)
    assert(out.schema.fields.map(f => f.name -> f.dataType.sql).toSeq ===
      Seq("doc_id" -> "BIGINT", "bin" -> "INT", "n_frames" -> "INT",
        "p_lo" -> "BIGINT", "p_hi" -> "BIGINT"),
      "gate outputs must be plain BIGINT/INT -- the saga rule")

    val got = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(4), r.getLong(3))).toMap
    assert(got.size === planted.size)
    planted.zipWithIndex.foreach { case (v, i) =>
      val (hi, lo) = got(i.toLong)
      assert(lo >= 0L && BigInt(lo) < Base, s"p_lo $lo out of [0, 1e18) for $v")
      assert(BigInt(hi) * Base + BigInt(lo) === v,
        s"reconstruction $hi * 1e18 + $lo != $v")
    }
  }

  test("seeded-random sweep: decomposition exact across the whole representable range") {
    // 500 values drawn uniformly in bit-length (so small, mid, and
    // >63-bit magnitudes all appear), fixed seed -- deterministic.
    val ceiling = BigInt(Long.MaxValue) * Base + (Base - 1)
    val rnd = new scala.util.Random(0x9e3779b97f4a7c15L)
    val values = Seq.fill(500) {
      val bits = 1 + rnd.nextInt(ceiling.bitLength)
      BigInt(bits, rnd.self).min(ceiling)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bin", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("power_sum", DecimalType(38, 0))))
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row(i.toLong, 0, 1, new BigDecimal(v.bigInteger))
    }
    val out = MultimodalOps.powerToWords(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema))
    val got = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(4), r.getLong(3))).toMap
    assert(got.size === values.size)
    values.zipWithIndex.foreach { case (v, i) =>
      val (hi, lo) = got(i.toLong)
      assert(lo >= 0L && BigInt(lo) < Base, s"p_lo $lo out of range for $v")
      assert(BigInt(hi) * Base + BigInt(lo) === v,
        s"reconstruction failed for $v (bitLength ${v.bitLength})")
    }
  }
}
