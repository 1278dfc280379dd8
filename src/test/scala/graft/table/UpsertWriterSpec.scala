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

  test("bucketed tables join with no shuffle exchange (co-located join)") {
    val store = freshStore()
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    store.createOrReplaceBucketed(left, "b_left", Seq("k"), 8, sortCols = Seq("k"))
    store.createOrReplaceBucketed(right, "b_right", Seq("k"), 8, sortCols = Seq("k"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the shuffle (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table("b_left").join(spark.table("b_right"), "k")
      assert(j.count() === 500)
      val physical = j.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$physical")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("upsertAll schema evolution adds source-only columns (mergeSchema parity)") {
    val store = freshStore()
    UpsertWriter.upsertAll(store, "t", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    val widened = Seq((2, "B", 9.5), (3, "c", 1.0)).toDF("k", "v", "score")
    intercept[IllegalArgumentException] {
      UpsertWriter.upsertAll(store, "t", widened, Seq("k"))
    }
    UpsertWriter.upsertAll(store, "t", widened, Seq("k"), allowSchemaEvolution = true)
    val rows = store.read("t").as[(Int, String, Option[Double])].collect().sorted
    assert(rows === Seq((1, "a", None), (2, "B", Some(9.5)), (3, "c", Some(1.0))))
    // and on a PARTITIONED table the widening rewrite keeps every
    // partition on the new schema (plain reads see the new column)
    val p = freshStore()
    UpsertWriter.upsertAll(p, "pt", Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "day"),
      Seq("k"), partitionBy = Seq("day"))
    UpsertWriter.upsertAll(p, "pt", Seq((2, "B", "d2", 7.0)).toDF("k", "v", "day", "score"),
      Seq("k"), partitionBy = Seq("day"), allowSchemaEvolution = true)
    val prows = p.read("pt").select("k", "v", "score")
      .as[(Int, String, Option[Double])].collect().sorted
    assert(prows === Seq((1, "a", None), (2, "B", Some(7.0))))
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

  test("partitioned upsertAll only rewrites touched partitions") {
    val store = freshStore()
    val day1 = Seq((1, "2026-01-01", "a"), (2, "2026-01-01", "b")).toDF("k", "day", "v")
    val day2 = Seq((3, "2026-01-02", "c")).toDF("k", "day", "v")
    UpsertWriter.upsertAll(store, "t", day1, Seq("k"), partitionBy = Seq("day"))
    UpsertWriter.upsertAll(store, "t", day2, Seq("k"), partitionBy = Seq("day"))
    def filesOf(day: String) = {
      val d = new java.io.File(s"${store.path("t")}/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    }
    val day1Files = filesOf("2026-01-01")
    // restate day 2 only: day 1's physical files must be untouched
    Thread.sleep(1100)
    UpsertWriter.upsertAll(store, "t",
      Seq((3, "2026-01-02", "C"), (4, "2026-01-02", "d")).toDF("k", "day", "v"),
      Seq("k"), partitionBy = Seq("day"))
    assert(filesOf("2026-01-01") === day1Files)
    assert(store.read("t").select("k", "v").as[(Int, String)]
      .collect().sortBy(_._1).map(_._2).toSeq === Seq("a", "b", "C", "d"))
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
