package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension sources: the distributed date spine (S3) and the static
  * exchange lookup (S4).
  */
object DimSources {

  /** dim_date spine -- the reference builds 2557 rows in a driver-side
    * Python loop (build_stock_dimensions.py:112-141); here it's
    * `sequence+explode` evaluated on executors, so a 100-year spine
    * would scale the same way.
    *
    * ISO week via `weekofyear` matches Python `isocalendar()[1]`;
    * `is_trading_day` is the reference's weekday approximation.
    */
  def dateSpine(spark: SparkSession, start: String, end: String): DataFrame =
    spark.sql(s"SELECT explode(sequence(to_date('$start'), to_date('$end'))) AS date")
      .select(
        (year(col("date")) * 10000 + month(col("date")) * 100 + dayofmonth(col("date"))).as("date_key"),
        col("date"),
        year(col("date")).as("year"),
        quarter(col("date")).as("quarter"),
        month(col("date")).as("month"),
        weekofyear(col("date")).as("week"),
        date_format(col("date"), "EEEE").as("day_of_week"),
        dayofweek(col("date")).between(2, 6).as("is_trading_day"))

  /** dim_exchange -- 3 static rows (build_stock_dimensions.py:159-163). */
  def exchanges(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "NASDAQ", "NASDAQ Stock Market", "USA", "America/New_York"),
      (2, "NYSE", "New York Stock Exchange", "USA", "America/New_York"),
      (3, "AMEX", "NYSE American", "USA", "America/New_York"),
    ).toDF("exchange_key", "exchange_code", "exchange_name", "country", "timezone")
  }
}
