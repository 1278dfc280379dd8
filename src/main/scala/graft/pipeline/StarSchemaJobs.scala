package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Schemas
import graft.sources.{DimSources, JsonlQuoteSource, QuoteGenerator}
import graft.table.{UpsertWriter, WarehouseWrites}
import graft.quality._

/** The reference's three Glue transform jobs rebuilt as Spark-native
  * functions over any [[WarehouseWrites]] store (SURVEY.md S2, S3.1):
  * extract -> dimensions -> fact -> aggregations -> validation.
  * With a [[graft.table.VersionedTableStore]] every table build below
  * is a snapshot commit (time travel + rollback); with a
  * [[graft.table.TableStore]] it is the reference's destructive
  * staged swap.
  *
  * Determinism pins (SURVEY.md S7.5): surrogate keys are
  * xxhash64(natural key) not monotonically_increasing_id; OHLC
  * open/close use min_by/max_by over the trade timestamp, not
  * unordered first/last; dedup is latest-extraction-wins with a
  * symbol tiebreak.
  */
class StarSchemaJobs(spark: SparkSession, store: WarehouseWrites, rawRoot: String) {
  import StarSchemaJobs._

  private val D = Schemas.Money

  /** S12+S13: land one day of (deterministic) quotes as JSONL under
    * the date= partition dir -- the Lambda extractor's contract. */
  def extract(symbols: Seq[String], date: String, extractionTime: String): Unit = {
    val quotes = QuoteGenerator.quotes(spark, symbols, date, extractionTime)
    JsonlQuoteSource.write(quotes, rawRoot, date)
  }

  private def readDay(date: String): DataFrame =
    JsonlQuoteSource.readDay(spark, rawRoot, date)

  /** W1: latest-extraction-wins dedup per symbol
    * (build_stock_fact_table.py:39-48). */
  private def dedupLatest(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("extraction_time").desc, col("timestamp").desc)
    raw.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** build_stock_dimensions.py: dim_stock (S8 selective upsert
    * preserving stock_key + first_seen_date), dim_date + dim_exchange
    * (S6 full replace). */
  def buildDimensions(date: String): Unit = {
    val raw = dedupLatest(readDay(date))
    val dimStock = raw.select(
      xxhash64(col("symbol")).as("stock_key"),
      col("symbol"),
      col("name").as("company_name"),
      col("exchange"),
      when(col("market_cap") > 1e12, "Large Cap")
        .when(col("market_cap") > 1e10, "Mid Cap")
        .otherwise("Small Cap").as("market_cap_tier"),
      lit("Technology").as("sector"),
      lit("Software").as("industry"),
      lit(date).as("first_seen_date"),
      lit(date).as("last_seen_date"),
      lit(true).as("is_active"))
    UpsertWriter.upsertSelective(store, "dim_stock", dimStock,
      keys = Seq("symbol"), preserve = Seq("stock_key", "first_seen_date"))
    store.createOrReplace(DimSources.dateSpine(spark, "2020-01-01", "2026-12-31"), "dim_date")
    store.createOrReplace(DimSources.exchanges(spark), "dim_exchange")
  }

  /** build_stock_fact_table.py: P1 projection (19 raw fields -> 20
    * fact columns, decimal(18,4) money) + S7 update-all upsert on
    * (stock_symbol, trade_date). */
  def buildFact(date: String, createdAt: String): Unit = {
    val raw = dedupLatest(readDay(date))
    val fact = raw.select(
      xxhash64(col("symbol"), lit(date)).as("fact_key"),
      col("symbol").as("stock_symbol"),
      to_date(lit(date)).as("trade_date"),
      from_unixtime(col("timestamp")).cast("timestamp").as("trade_timestamp"),
      col("price").cast(D).as("close_price"),
      col("open").cast(D).as("open_price"),
      col("day_high").cast(D).as("high_price"),
      col("day_low").cast(D).as("low_price"),
      col("previous_close").cast(D).as("previous_close"),
      col("volume").cast("bigint").as("volume"),
      col("market_cap").cast("bigint").as("market_cap"),
      col("change").cast(D).as("price_change"),
      col("change_percent").cast(D).as("change_percentage"),
      col("year_high").cast(D).as("year_high_52w"),
      col("year_low").cast(D).as("year_low_52w"),
      col("price_avg_50").cast(D).as("price_avg_50d"),
      col("price_avg_200").cast(D).as("price_avg_200d"),
      // null-guarded divisor: one zero day_low would abort the whole
      // job under ANSI mode (Spark 4 default); NULL is the honest
      // value for an undefined ratio
      ((col("day_high") - col("day_low")) /
        when(col("day_low") =!= 0.0, col("day_low")) * 100.0).cast(D)
        .as("daily_volatility"),
      lit(createdAt).cast("timestamp").as("created_at"),
      lit(date).as("processing_date"))
    // partitioned by processing_date: the daily MERGE rewrites ONE
    // day's partition (dynamic partition overwrite in UpsertWriter),
    // and batch validation prunes to the day -- on a deep fact table
    // this is the difference between touching one day and the table
    UpsertWriter.upsertAll(store, "fact_stock_daily_price", fact,
      keys = Seq("stock_symbol", "trade_date"),
      partitionBy = Seq("processing_date"))
  }

  /** build_stock_aggregations.py: J1/J2 dim joins + A1 weekly, A2
    * monthly, A3 sector rollups, each upserted on its natural key.
    * Dims are broadcast (tiny); the fact side shuffles once per
    * distinct grouping key set.
    *
    * `forDate` = incremental mode: recompute ONLY the ISO week /
    * month / day containing that date (the reference re-aggregates
    * the whole fact table every run, build_stock_aggregations.py:45
    * -- at scale that is the difference between scanning one period
    * and scanning years; the trade_date filters prune parquet row
    * groups via min/max stats). The upserted groups are identical to
    * a full rebuild for those periods. */
  def buildAggregations(forDate: Option[String] = None): Unit = {
    val fullFact = store.read("fact_stock_daily_price")
    if (fullFact.isEmpty) return // empty-fact early-exit (aggs:63-67)
    val dimDate = store.read("dim_date")
      .select(col("date"), col("year"), col("quarter"), col("month"), col("week"))
    val dimStock = store.read("dim_stock")
      .select(col("symbol"), col("company_name"), col("sector"))
    def enrich(fact: org.apache.spark.sql.DataFrame) = fact
      .join(broadcast(dimDate), fact("trade_date") === dimDate("date"), "left")
      .join(broadcast(dimStock), fact("stock_symbol") === dimStock("symbol"), "left")

    // Each rollup gets its OWN period filter: a rollup's input must be
    // the COMPLETE period (a shared week-or-month filter would emit
    // partial groups for weeks straddling a month edge).
    val (weeklyFact, monthlyFact, sectorFact) = forDate match {
      case None => (fullFact, fullFact, fullFact)
      case Some(d) =>
        val day = java.time.LocalDate.parse(d)
        // the weekly group key is (CALENDAR year, ISO week) -- the
        // reference's combination -- so the filter must match both;
        // straddling weeks split into one group per calendar year
        val w = day.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear)
        (fullFact.filter(year(col("trade_date")) === day.getYear &&
            weekofyear(col("trade_date")) === w),
          fullFact.filter(year(col("trade_date")) === day.getYear &&
            month(col("trade_date")) === day.getMonthValue),
          fullFact.filter(col("trade_date") === lit(d).cast("date")))
    }

    val tsOrd = col("trade_date").cast("timestamp").cast("long")
    val weekly = enrich(weeklyFact)
      .groupBy(col("year"), col("week"), col("stock_symbol").as("symbol"), col("company_name"))
      .agg(
        min_by(col("open_price"), tsOrd).as("week_open"),
        max_by(col("close_price"), tsOrd).as("week_close"),
        max(col("high_price")).as("week_high"),
        min(col("low_price")).as("week_low"),
        sum(col("volume")).as("total_volume"),
        avg(col("close_price")).cast(D).as("avg_price"),
        stddev_samp(col("close_price")).cast(D).as("price_std_dev"),
        avg(col("daily_volatility")).cast(D).as("avg_volatility"),
        ((max_by(col("close_price"), tsOrd) - min_by(col("open_price"), tsOrd))
          / when(min_by(col("open_price"), tsOrd) =!= 0,
              min_by(col("open_price"), tsOrd)) * 100).cast(D).as("weekly_return_pct"))
    UpsertWriter.upsertAll(store, "agg_stock_weekly_metrics", weekly,
      keys = Seq("year", "week", "symbol"), partitionBy = Seq("year", "week"))

    val monthly = enrich(monthlyFact)
      .groupBy(col("year"), col("month"), col("stock_symbol").as("symbol"),
        col("company_name"), col("sector"))
      .agg(
        min_by(col("open_price"), tsOrd).as("month_open"),
        max_by(col("close_price"), tsOrd).as("month_close"),
        max(col("high_price")).as("month_high"),
        min(col("low_price")).as("month_low"),
        sum(col("volume")).as("total_volume"),
        avg(col("close_price")).cast(D).as("avg_price"),
        stddev_samp(col("close_price")).cast(D).as("price_std_dev"),
        avg(col("market_cap")).cast(D).as("avg_market_cap"),
        avg(col("daily_volatility")).cast(D).as("avg_daily_volatility"),
        ((max_by(col("close_price"), tsOrd) - min_by(col("open_price"), tsOrd))
          / when(min_by(col("open_price"), tsOrd) =!= 0,
              min_by(col("open_price"), tsOrd)) * 100).cast(D).as("monthly_return_pct"))
    UpsertWriter.upsertAll(store, "agg_stock_monthly_metrics", monthly,
      keys = Seq("year", "month", "symbol"), partitionBy = Seq("year", "month"))

    val sector = enrich(sectorFact)
      .groupBy(col("trade_date").as("date"), col("sector"))
      .agg(
        avg(col("change_percentage")).cast(D).as("avg_sector_change_pct"),
        sum(col("volume")).as("total_sector_volume"),
        avg(col("market_cap")).cast(D).as("avg_sector_market_cap"),
        count(lit(1)).as("num_stocks"),
        stddev_samp(col("change_percentage")).cast(D).as("sector_volatility"))
    UpsertWriter.upsertAll(store, "agg_sector_performance", sector,
      keys = Seq("date", "sector"), partitionBy = Seq("date"))
  }

  /** The four GX suites (create_expectations.py), single-scan each.
    *
    * `forDate` = current-period batch scoping, the reference's
    * checkpoint behavior: the daily fact suite validates only the
    * `processing_date LIKE 'd%'` batch
    * (nasdaq_stock_pipeline_with_gx.py:161, F14) and the weekly/
    * monthly suites only the (year, week)/(year, month) containing
    * the date (weekly_agg_validation.yml:11-13, F13). All three
    * filters hit partition columns, so the scans are partition-pruned
    * -- at scale each validation touches one period, not the table.
    * `None` = whole-table validation (initial backfill audit).
    *
    * `recordAs` = persist every rule result (passes AND failures) to
    * the `validation_results` history table BEFORE enforcement, the
    * way a GX checkpoint lands its run results even when the DAG task
    * then fails (checkpoints/daily_validation.yml) -- so a post-mortem
    * can query what failed and by how much. */
  def validate(forDate: Option[String] = None,
      recordAs: Option[ValidationRun] = None): Seq[RuleResult] = {
    val factRules = Seq(
      ColumnsMatchOrderedList(Schemas.factStockDailyPrice.fieldNames.toSeq),
      NotNull("stock_symbol"), NotNull("trade_date"), NotNull("close_price"),
      Unique(Seq("fact_key")),
      Unique(Seq("stock_symbol", "trade_date")),
      ValuesBetween("close_price", 0, 1e6),
      PairGreater("high_price", "low_price"))
    val dimRules = Seq(
      ColumnsMatchOrderedList(Schemas.dimStock.fieldNames.toSeq),
      NotNull("symbol"), NotNull("stock_key"),
      Unique(Seq("symbol")),
      ValuesInSet("is_active", Seq(true, false)))
    val weeklyRules = Seq(
      NotNull("symbol"), Unique(Seq("year", "week", "symbol")),
      ValuesBetween("week", 1, 53),
      PairGreater("week_high", "week_low"))
    val monthlyRules = Seq(
      NotNull("symbol"), Unique(Seq("year", "month", "symbol")),
      ValuesBetween("month", 1, 12),
      PairGreater("month_high", "month_low"))
    val d = forDate.map(dd => to_date(lit(dd)))
    def scoped(name: String, f: Column => Column): DataFrame =
      d.map(dd => store.read(name).filter(f(dd))).getOrElse(store.read(name))
    val fact = forDate
      .map(dd => store.read("fact_stock_daily_price")
        .filter(col("processing_date").like(s"$dd%")))
      .getOrElse(store.read("fact_stock_daily_price"))
    val weekly = scoped("agg_stock_weekly_metrics",
      dd => col("year") === year(dd) && col("week") === weekofyear(dd))
    val monthly = scoped("agg_stock_monthly_metrics",
      dd => col("year") === year(dd) && col("month") === month(dd))
    val suites: Seq[(String, Seq[RuleResult])] = Seq(
      "daily_fact" -> Validator.run(fact, factRules),
      "dim_stock" -> Validator.run(store.read("dim_stock"), dimRules),
      "weekly_agg" -> Validator.run(weekly, weeklyRules),
      "monthly_agg" -> Validator.run(monthly, monthlyRules))
    recordAs.foreach(run =>
      new ValidationLog(store).record(run, forDate.getOrElse("all"), suites))
    suites.foreach { case (suite, results) =>
      val failed = results.filterNot(_.passed)
      if (failed.nonEmpty) {
        val msg = failed.map(r =>
          s"${r.rule}(${r.detail}): ${r.violations} violations").mkString("; ")
        throw new IllegalStateException(s"validation suite '$suite' failed: $msg")
      }
    }
    suites.flatMap(_._2)
  }
}

object StarSchemaJobs {
  val DefaultSymbols: Seq[String] = Seq("AAPL", "MSFT", "GOOGL", "AMZN", "NVDA")
}
