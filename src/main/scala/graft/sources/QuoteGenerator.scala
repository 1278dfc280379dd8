package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic quote generator (S12) -- replaces the reference's HTTP
  * extractor + mock generator (lambda_function.py:105-156) with a
  * distributed Spark source.
  *
  * Determinism at scale: values derive from `xxhash64(symbol, date,
  * field)` rather than `rand(seed)` -- `rand` is partition-index
  * dependent, so its output changes whenever the partitioning does;
  * hash-derived values are stable under any repartitioning, executor
  * count, or re-run (SURVEY S7.5).
  */
object QuoteGenerator {
  /** Uniform double in [lo, hi) keyed by (symbol, date, field). */
  private def u(field: String, lo: Double, hi: Double) = {
    val h = pmod(xxhash64(col("symbol"), col("trading_date"), lit(field)), lit(1000000L))
    round(lit(lo) + h / 1000000.0 * (hi - lo), 2)
  }

  /** One quote row per symbol for `tradingDate` (ISO yyyy-MM-dd).
    * `extractionTime` is the injectable clock value (ISO-8601) the
    * dedup window orders by.
    */
  def quotes(
      spark: SparkSession,
      symbols: Seq[String],
      tradingDate: String,
      extractionTime: String): DataFrame = {
    import spark.implicits._
    // small symbol universe -> a local Seq is fine; a 100M-symbol
    // universe would swap this for spark.range + key synthesis, the
    // derivation below is already fully distributed & key-stable.
    val base = symbols.toDF("symbol")
      .withColumn("trading_date", lit(tradingDate))
    val price = u("price", 50.0, 550.0)
    val open = u("open", 50.0, 550.0)
    val prevClose = u("previous_close", 50.0, 550.0)
    val low = least(price, open) - u("day_spread", 0.0, 5.0)
    val high = greatest(price, open) + u("day_spread2", 0.0, 5.0)
    base.select(
      col("symbol"),
      concat(col("symbol"), lit(" Inc.")).as("name"),
      lit("NASDAQ").as("exchange"),
      price.as("price"),
      open.as("open"),
      prevClose.as("previous_close"),
      round(low, 2).as("day_low"),
      round(high, 2).as("day_high"),
      round(price * 0.7, 2).as("year_low"),
      round(price * 1.4, 2).as("year_high"),
      round(price - prevClose, 2).as("change"),
      round((price - prevClose) / prevClose * 100.0, 2).as("change_percent"),
      pmod(xxhash64(col("symbol"), col("trading_date"), lit("volume")), lit(100000000L)).as("volume"),
      (pmod(xxhash64(col("symbol"), col("trading_date"), lit("mcap")), lit(3000L)) * 1000000000L).as("market_cap"),
      round(price * 0.98, 2).as("price_avg_50"),
      round(price * 0.95, 2).as("price_avg_200"),
      unix_timestamp(to_timestamp(concat(lit(tradingDate), lit(" 16:00:00")))).as("timestamp"),
      lit(extractionTime).as("extraction_time"),
      lit("mock").as("api_endpoint"))
  }
}
