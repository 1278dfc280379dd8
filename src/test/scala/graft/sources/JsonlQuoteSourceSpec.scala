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
