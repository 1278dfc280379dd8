package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UpsertWriterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore() = new TableStore(spark,
    Files.createTempDirectory("graft-upsert").toString)

  test("upsertAll creates table when missing") {
    val store = freshStore()
    UpsertWriter.upsertAll(store, "t", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    assert(store.read("t").as[(Int, String)].collect().sorted === Seq((1, "a"), (2, "b")))
  }

  test("upsertAll replaces matched rows wholesale and inserts new ones") {
    val store = freshStore()
    UpsertWriter.upsertAll(store, "t", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    UpsertWriter.upsertAll(store, "t", Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(store.read("t").as[(Int, String)].collect().sorted ===
      Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("upsertAll is idempotent (re-merging the same batch is a no-op)") {
    val store = freshStore()
    val batch = Seq((1, "a"), (2, "b")).toDF("k", "v")
    UpsertWriter.upsertAll(store, "t", batch, Seq("k"))
    val once = store.read("t").as[(Int, String)].collect().sorted
    UpsertWriter.upsertAll(store, "t", batch, Seq("k"))
    assert(store.read("t").as[(Int, String)].collect().sorted === once)
  }

  test("upsertAll overwrites with NULL source values (UPDATE SET *)") {
    val store = freshStore()
    UpsertWriter.upsertAll(store, "t",
      Seq((1, Option("a"))).toDF("k", "v"), Seq("k"))
    UpsertWriter.upsertAll(store, "t",
      Seq((1, Option.empty[String])).toDF("k", "v"), Seq("k"))
    assert(store.read("t").as[(Int, Option[String])].collect() === Seq((1, None)))
  }

  test("upsertSelective preserves protected columns on match only") {
    val store = freshStore()
    // (symbol, first_seen, last_seen)
    UpsertWriter.upsertSelective(store, "dim",
      Seq(("AAPL", "d1", "d1"), ("MSFT", "d1", "d1")).toDF("symbol", "first_seen", "last_seen"),
      keys = Seq("symbol"), preserve = Seq("first_seen"))
    UpsertWriter.upsertSelective(store, "dim",
      Seq(("AAPL", "d2", "d2"), ("NVDA", "d2", "d2")).toDF("symbol", "first_seen", "last_seen"),
      keys = Seq("symbol"), preserve = Seq("first_seen"))
    val got = store.read("dim").as[(String, String, String)].collect().sortBy(_._1)
    assert(got === Seq(
      ("AAPL", "d1", "d2"), // matched: first_seen preserved, last_seen updated
      ("MSFT", "d1", "d1"), // untouched target row
      ("NVDA", "d2", "d2"))) // fresh insert keeps its own first_seen
  }

  test("upsertSelective is idempotent") {
    val store = freshStore()
    val b = Seq(("AAPL", "d1", "d1")).toDF("symbol", "first_seen", "last_seen")
    UpsertWriter.upsertSelective(store, "dim", b, Seq("symbol"), Seq("first_seen"))
    UpsertWriter.upsertSelective(store, "dim", b, Seq("symbol"), Seq("first_seen"))
    assert(store.read("dim").count() === 1)
  }
}
