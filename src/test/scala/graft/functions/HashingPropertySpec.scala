package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.Hashing

/** Property-style checks on the cross-engine hashing backbone: every
  * oracle-gated operator leans on these identities, so they get
  * randomized coverage beyond the example-based specs. Fixed seed --
  * the cases are random-LOOKING, the test is deterministic. */
class HashingPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("h15Local == the Spark h15 expression over 500 randomized strings") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq("", " ", "a b", "a\tb", "0", "héllo", "日本語",
        "x" * 1000)
    val got = strs.toDF("s")
      .select(col("s"), Hashing.h15(col("s")).as("h"))
      .as[(String, Long)].collect()
    got.foreach { case (s, h) =>
      assert(h === Hashing.h15Local(s), s"h15 mismatch for ${s.take(30)}")
      assert(h >= 0L, "60-bit hash must stay non-negative in a signed long")
    }
  }

  test("minhash permutations: odd multipliers, no 64-bit overflow, BigInt-exact") {
    val P = BigInt(Hashing.MersenneP)
    val rnd = new scala.util.Random(7)
    for (i <- 0 until 64) {
      val (a, b) = (Hashing.permA(i), Hashing.permB(i))
      assert(a % 2 === 1L, s"permA($i) must be odd (bijective mod 2^k factors)")
      assert(a > 0 && a <= 0x7FFFFFFFL && b >= 0 && b <= 0x7FFFFFFFL)
      for (_ <- 0 until 50) {
        val h = rnd.nextLong().abs & 0x7FFFFFFFL // 31-bit token hash domain
        val long = (a * h + b) % Hashing.MersenneP
        val big = ((BigInt(a) * BigInt(h) + BigInt(b)) mod P).toLong
        assert(long === big, s"perm $i overflowed at h=$h")
        assert(a * h + b > 0, "product must not wrap (DuckDB errors on overflow)")
      }
    }
  }

  test("lshBands: equal signatures share all bands; a changed row flips only its band") {
    val k = 8; val bands = 4; val rows = 2
    val sig = Seq.tabulate(k)(i => (i * 31 + 7).toLong)
    val bumped = sig.updated(5, 999L) // lives in band index 2
    val df = Seq((sig, bumped)).toDF("a", "b")
      .select(Hashing.lshBands(col("a"), bands, rows).as("ba"),
        Hashing.lshBands(col("b"), bands, rows).as("bb"),
        Hashing.lshBands(col("a"), bands, rows).as("ba2"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].head()
    assert(df._1 === df._3, "band hashing must be deterministic")
    assert(df._1.size === bands)
    val diff = df._1.zip(df._2).zipWithIndex.filter { case ((x, y), _) => x != y }
    assert(diff.map(_._2) === Seq(2), "only the band containing the change may differ")
  }
}
