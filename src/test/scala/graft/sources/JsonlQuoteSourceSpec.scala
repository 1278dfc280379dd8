package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class JsonlQuoteSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("zone read discovers date partitions and prunes by partition filter") {
    val root = Files.createTempDirectory("graft-zone").toString
    for (d <- Seq("2026-02-09", "2026-02-10", "2026-02-11")) {
      val q = QuoteGenerator.quotes(spark, Seq("AAPL", "MSFT"), d, s"${d}T02:00:00Z")
      JsonlQuoteSource.write(q, root, d)
    }
    val zone = JsonlQuoteSource.readZone(spark, root)
    assert(zone.count() === 6)
    val oneDay = zone.filter(col("date") === "2026-02-10")
    assert(oneDay.count() === 2)
    // the date= predicate must prune at the partition level, not scan+filter
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2026-02-10"))
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("2026-02-09") || scanned.contains("PartitionFilters"))
  }

  test("expire drops partitions past retention; the zone stays readable") {
    val root = Files.createTempDirectory("graft-zone3").toString
    for (d <- Seq("2026-01-01", "2026-02-01", "2026-02-09", "2026-02-10")) {
      val q = QuoteGenerator.quotes(spark, Seq("AAPL"), d, s"${d}T02:00:00Z")
      JsonlQuoteSource.write(q, root, d)
    }
    // a stray non-partition file must survive untouched
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(root, "_manifest.txt"), "keep me")
    val asOf = java.time.LocalDate.parse("2026-02-10")
    val expired = JsonlQuoteSource.expire(spark, root, keepDays = 9, asOf = asOf)
    // cutoff 2026-02-01: strictly-older dirs go, the cutoff day stays
    assert(expired === Seq("2026-01-01"))
    val zone = JsonlQuoteSource.readZone(spark, root)
    assert(zone.select("date").distinct().collect().map(_.getString(0)).sorted
      === Array("2026-02-01", "2026-02-09", "2026-02-10"))
    assert(java.nio.file.Files.exists(java.nio.file.Path.of(root, "_manifest.txt")))
    // idempotent: nothing left past retention
    assert(JsonlQuoteSource.expire(spark, root, keepDays = 9, asOf = asOf).isEmpty)
    // keepDays = 0 keeps only today-or-newer
    val all = JsonlQuoteSource.expire(spark, root, keepDays = 0, asOf = asOf)
    assert(all === Seq("2026-02-01", "2026-02-09"))
    assert(JsonlQuoteSource.readDay(spark, root, "2026-02-10").count() === 1)
  }

  test("readDay round-trips the generator schema") {
    val root = Files.createTempDirectory("graft-zone2").toString
    val q = QuoteGenerator.quotes(spark, Seq("AAPL"), "2026-02-09", "t")
    JsonlQuoteSource.write(q, root, "2026-02-09")
    val back = JsonlQuoteSource.readDay(spark, root, "2026-02-09")
    assert(back.count() === 1)
    assert(back.schema.fieldNames.toSet === graft.model.Schemas.rawQuote.fieldNames.toSet)
    assert(back.select("symbol").head().getString(0) === "AAPL")
  }
}
