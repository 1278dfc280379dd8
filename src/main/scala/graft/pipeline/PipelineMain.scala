package graft.pipeline

import java.time.Instant

import graft.core.Sessions
import graft.table.TableStore

/** Runnable demo: N daily pipeline runs into a warehouse directory.
  *
  *   sbt "runMain graft.pipeline.PipelineMain /tmp/graft-wh 5"
  *
  * Builds the full star schema for the 5 trading days ending at the
  * (frozen) clock's T-1, validates every table, and prints the
  * ad-hoc top-k query the reference documents in QUICK_START.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/tmp/graft-warehouse"
    val days = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local()
    val clock = () => Instant.parse("2026-02-14T02:00:00Z")
    val runner = new PipelineRunner(spark, new TableStore(spark, s"$base/warehouse"),
      rawRoot = s"$base/raw", clock = clock)
    val end = java.time.LocalDate.parse(runner.processingDate())
    (days - 1 to 0 by -1).map(end.minusDays(_)).foreach { d =>
      println(s"[pipeline] running $d")
      runner.runDaily(d.toString)
    }
    WarehouseSql.attach(runner.store)
    println("[pipeline] validation green; latest prices:")
    spark.sql(
      """SELECT stock_symbol, trade_date, close_price, volume
         FROM fact_stock_daily_price
         ORDER BY trade_date DESC, stock_symbol LIMIT 10""").show(false)
    spark.stop()
  }
}
