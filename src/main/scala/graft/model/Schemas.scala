package graft.model

import org.apache.spark.sql.types._

/** Authoritative schemas for the star-schema pipeline (SURVEY.md S1.3).
  *
  * Everything is explicit `StructType` -- the reference infers the raw
  * zone (`spark.read.json` with no schema,
  * glue/jobs/build_stock_fact_table.py:32) which is nondeterministic
  * under corrupt rows; we pin it (FIXTURES.md S1).
  */
object Schemas {
  val Money: DecimalType = DecimalType(18, 4)

  /** Raw quote (JSONL, 19 fields) -- lambda_function.py:63-96. */
  val rawQuote: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("name", StringType),
    StructField("exchange", StringType),
    StructField("price", DoubleType),
    StructField("open", DoubleType),
    StructField("previous_close", DoubleType),
    StructField("day_low", DoubleType),
    StructField("day_high", DoubleType),
    StructField("year_low", DoubleType),
    StructField("year_high", DoubleType),
    StructField("change", DoubleType),
    StructField("change_percent", DoubleType),
    StructField("volume", LongType),
    StructField("market_cap", LongType),
    StructField("price_avg_50", DoubleType),
    StructField("price_avg_200", DoubleType),
    StructField("timestamp", LongType),
    StructField("extraction_time", StringType),
    StructField("api_endpoint", StringType),
  ))

  /** fact_stock_daily_price (20 cols) -- build_stock_fact_table.py:55-76;
    * natural key (stock_symbol, trade_date). */
  val factStockDailyPrice: StructType = StructType(Seq(
    StructField("fact_key", LongType, nullable = false),
    StructField("stock_symbol", StringType),
    StructField("trade_date", DateType),
    StructField("trade_timestamp", TimestampType),
    StructField("close_price", Money),
    StructField("open_price", Money),
    StructField("high_price", Money),
    StructField("low_price", Money),
    StructField("previous_close", Money),
    StructField("volume", LongType),
    StructField("market_cap", LongType),
    StructField("price_change", Money),
    StructField("change_percentage", Money),
    StructField("year_high_52w", Money),
    StructField("year_low_52w", Money),
    StructField("price_avg_50d", Money),
    StructField("price_avg_200d", Money),
    StructField("daily_volatility", Money),
    StructField("created_at", TimestampType),
    // LAST: hive partition column -- partitioned parquet reads append
    // partition columns after the data columns
    StructField("processing_date", StringType),
  ))

  /** dim_stock (10 cols) -- build_stock_dimensions.py:52-65. */
  val dimStock: StructType = StructType(Seq(
    StructField("stock_key", LongType, nullable = false),
    StructField("symbol", StringType),
    StructField("company_name", StringType),
    StructField("exchange", StringType),
    StructField("market_cap_tier", StringType),
    StructField("sector", StringType),
    StructField("industry", StringType),
    StructField("first_seen_date", StringType),
    StructField("last_seen_date", StringType),
    StructField("is_active", BooleanType),
  ))

  /** dim_date (8 cols) -- build_stock_dimensions.py:130-139. */
  val dimDate: StructType = StructType(Seq(
    StructField("date_key", IntegerType, nullable = false),
    StructField("date", DateType),
    StructField("year", IntegerType),
    StructField("quarter", IntegerType),
    StructField("month", IntegerType),
    StructField("week", IntegerType),
    StructField("day_of_week", StringType),
    StructField("is_trading_day", BooleanType),
  ))

  /** dim_exchange (5 cols) -- build_stock_dimensions.py:159-163. */
  val dimExchange: StructType = StructType(Seq(
    StructField("exchange_key", IntegerType, nullable = false),
    StructField("exchange_code", StringType),
    StructField("exchange_name", StringType),
    StructField("country", StringType),
    StructField("timezone", StringType),
  ))
}
