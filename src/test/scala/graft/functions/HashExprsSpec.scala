package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.Hashing

class HashExprsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(7)
  private val words = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private def sentence(n: Int): String =
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")

  /** The declarative HOF form Md5ShingleSet replaces -- kept here as
    * the reference semantics. */
  private def declarativeShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val t = split(text, " ")
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(t) - lit(n - 1), lit(1))),
      i => Hashing.h31(array_join(slice(t, i, lit(n)), " ")))))
  }

  test("Md5ShingleSet matches the declarative slice/md5 form (n=1 and n=3)") {
    val texts = (Seq.fill(40)(sentence(1 + rnd.nextInt(12))) :+ "" :+ "single").toDF("text")
    for (n <- Seq(1, 3)) {
      val rows = texts.select(
        HashExprs.md5ShingleSet(split(col("text"), " "), n).as("native"),
        declarativeShingles(col("text"), n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      }
    }
  }

  test("h15Utf8 matches the SQL conv/substring md5 bridge") {
    val strs = Seq("", "a", "hello world", "graft:42", "élève")
    val sqlSide = strs.toDF("s")
      .select(Hashing.h15(col("s"))).as[Long].collect().toSeq
    val native = strs.map(s => HashExprs.h15Utf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(native === sqlSide)
  }

  test("MinhashSig matches the K-HOF signature (incl. empty input)") {
    val sets = (Seq.fill(30)(
      Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong(0x7FFFFFFFL)).distinct.sorted) :+
      Seq.empty[Long]).toDF("th")
    val rows = sets.select(
      HashExprs.minhashSig(col("th"), 16).as("native"),
      Hashing.minhashSig(col("th"), 16).as("hof")).collect()
    rows.foreach { r =>
      val native = r.getSeq[java.lang.Long](0)
      val hof = r.getSeq[java.lang.Long](1)
      assert(native === hof)
    }
  }

  test("expressions survive codegen in a wide projection (many rows)") {
    val df = (1 to 2000).map(i => sentence(3 + i % 9)).toDF("text")
      .select(HashExprs.md5ShingleSet(split(col("text"), " "), 3).as("th"))
      .select(HashExprs.minhashSig(col("th"), 16).as("sig"))
    assert(df.count() === 2000)
    assert(df.filter(size(col("sig")) =!= 16).count() === 0)
  }
}
