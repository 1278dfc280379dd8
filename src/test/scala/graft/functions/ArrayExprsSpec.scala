package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class ArrayExprsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(42)

  test("DoubleDot matches sequential fold on random vectors (bit-exact)") {
    val cases = Seq.fill(20)((Seq.fill(16)(rnd.nextDouble() * 10 - 5),
      Seq.fill(16)(rnd.nextDouble() * 10 - 5)))
    val expected = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }
    val got = cases.toDF("a", "b")
      .select(ArrayExprs.dot(col("a"), col("b"))).as[Double].collect().toSeq
    assert(got === expected)
  }

  test("SortedLongJaccard matches set-based jaccard (incl. empty arrays)") {
    val cases = (Seq.fill(30)((Seq.fill(rnd.nextInt(20))(rnd.nextInt(40).toLong).distinct.sorted,
      Seq.fill(rnd.nextInt(20))(rnd.nextInt(40).toLong).distinct.sorted)) :+
      ((Seq.empty[Long], Seq.empty[Long])))
    val expected = cases.map { case (a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      if (union == 0) 1.0 else inter.toDouble / union
    }
    val got = cases.toDF("a", "b")
      .select(ArrayExprs.sortedLongJaccard(col("a"), col("b"))).as[Double].collect().toSeq
    assert(got === expected)
  }

  test("SortedLongOverlap matches set intersection size") {
    val cases = (Seq.fill(30)((Seq.fill(rnd.nextInt(20))(rnd.nextInt(40).toLong).distinct.sorted,
      Seq.fill(rnd.nextInt(20))(rnd.nextInt(40).toLong).distinct.sorted)) :+
      ((Seq.empty[Long], Seq(1L, 2L))))
    val expected = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    val got = cases.toDF("a", "b")
      .select(ArrayExprs.sortedLongOverlap(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got === expected)
  }

  test("SimHash matches reference implementation") {
    def ref(hashes: Seq[Long], bits: Int): Long =
      (0 until bits).foldLeft(0L) { (fp, j) =>
        val w = hashes.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (w > 0) fp | (1L << j) else fp
      }
    val cases = Seq.fill(20)(Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong().abs & 0x7FFFFFFFL))
    val got = cases.map(Tuple1(_)).toDF("h")
      .select(ArrayExprs.simhash(col("h"), 31)).as[Long].collect().toSeq
    assert(got === cases.map(ref(_, 31)))
  }

  test("TopKFreq is exact when capacity covers the distinct items") {
    import graft.functions.TopKFreq.topkFreq
    val df = spark.range(1000).select((col("id") % 10).as("g"), (col("id") % 7).as("v"))
    val got = df.groupBy(col("g")).agg(topkFreq(col("v"), 3, 16).as("top"))
      .select(col("g"), col("top")).as[(Long, Seq[(Long, Long)])].collect().toMap
    val expected = df.groupBy(col("g"), col("v")).count()
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).take(3).toSeq).toMap
    assert(got === expected)
  }

  test("TopKFreq eviction keeps true heavy hitters (skewed input)") {
    import graft.functions.TopKFreq.topkFreq
    // one item with 500 occurrences among 100 distinct light items:
    // even with capacity 8, SpaceSaving must surface the heavy hitter
    val heavy = Seq.fill(500)(999L)
    val light = (0 until 100).flatMap(i => Seq.fill(2)(i.toLong))
    val df = (heavy ++ light).toDF("v").repartition(4)
    val top = df.agg(topkFreq(col("v"), 1, 8).as("top"))
      .select(col("top")).as[Seq[(Long, Long)]].head()
    assert(top.head._1 === 999L)
    assert(top.head._2 >= 500L) // SpaceSaving overestimates, never under
  }

  test("CharEntropyStats matches the HOF formulation term for term") {
    // the expression replaced a split -> per-distinct-char filter
    // fold; values must be IDENTICAL (quantized integer terms, order-
    // invariant sum), including the empty-string edge where Java
    // split("") yields one empty token
    def hof(text: String): (Long, Long, Long) = {
      val chars = text.split("")
      val n = chars.length.toLong
      val byChar = chars.groupBy(identity)
      val sumU = byChar.values.map { g =>
        val c = g.length.toLong
        c * java.math.BigDecimal.valueOf(math.log(n.toDouble / c) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }.sum
      (n, byChar.size.toLong, sumU)
    }
    val cases = Seq("", "a", "aaaa", "abab", "the quick brown fox",
      "aAbB  __12", "zyxzyxzyx!", Seq.fill(500)("abcdefg").mkString(" "))
    val got = cases.toDF("text")
      .select(CharEntropy.stats(col("text")).as("s"))
      .select(col("s.n_chars"), col("s.n_charset"), col("s.sum_u"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === cases.map(hof))
    // growth path: a wide charset forces the count table to resize
    val wide = (0 until 300).map(i => ('!' + (i % 90)).toChar)
      .mkString + "éü中文"
    val (wn, wk, ws) = hof(wide)
    val wideGot = Seq(wide).toDF("text")
      .select(CharEntropy.stats(col("text")).as("s"))
      .select(col("s.n_chars"), col("s.n_charset"), col("s.sum_u"))
      .as[(Long, Long, Long)].head()
    assert(wideGot === ((wn, wk, ws)))
  }

  test("CharEntropyStats counts CODEPOINTS on non-BMP input (pinned)") {
    // the intended semantics (matching the DuckDB oracle's
    // codepoint-based length/string_split), NOT the UTF-16 code-unit
    // count the old split("") formulation produced: one emoji is one
    // character, a repeated emoji is one distinct character
    val got = Seq("😀a😀").toDF("text")
      .select(CharEntropy.stats(col("text")).as("s"))
      .select(col("s.n_chars"), col("s.n_charset"), col("s.sum_u"))
      .as[(Long, Long, Long)].head()
    assert(got._1 === 3L, s"surrogate pair split into code units: $got")
    assert(got._2 === 2L)
  }

  test("expressions survive codegen inside a join (many rows)") {
    val n = 500
    val df = spark.range(n).select(col("id"),
      sort_array(array((0 until 8).map(i => (col("id") + i) % 29): _*)).as("arr"))
    val out = df.as("a").join(df.as("b"), col("a.id") =!= col("b.id"))
      .select(ArrayExprs.sortedLongJaccard(col("a.arr"), col("b.arr")).as("j"))
      .agg(sum(col("j"))).as[Double].head()
    assert(out > 0)
  }
}
