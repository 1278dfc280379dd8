package graft.pipeline

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.table.TableStore

/** End-to-end star-schema pipeline over the deterministic generator --
  * the engine twin of the reference's full Airflow DAG run
  * (SURVEY.md S3.1), with a frozen clock. */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshRunner(): PipelineRunner[TableStore] = {
    val base = Files.createTempDirectory("graft-pipeline").toString
    new PipelineRunner(spark, new TableStore(spark, s"$base/warehouse"),
      rawRoot = s"$base/raw", symbols = Seq("AAPL", "MSFT", "GOOGL"),
      clock = () => Instant.parse("2026-02-10T02:00:00Z"))
  }

  test("T-1 processing date from frozen clock") {
    assert(freshRunner().processingDate() === "2026-02-09")
  }

  test("full daily run builds star schema and passes validation") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    val fact = r.store.read("fact_stock_daily_price")
    assert(fact.count() === 3)
    assert(fact.schema.fieldNames.toSeq === graft.model.Schemas.factStockDailyPrice.fieldNames.toSeq)
    assert(r.store.read("dim_stock").count() === 3)
  }

  test("re-running the same day is idempotent; second day appends") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    r.runDaily("2026-02-09")
    val store = new TableStore(spark, r.store.root)
    assert(store.read("fact_stock_daily_price").count() === 3)
    r.runDaily("2026-02-10")
    assert(store.read("fact_stock_daily_price").count() === 6)
    // dim first_seen_date survives the second day's merge
    val firstSeen = store.read("dim_stock").select("first_seen_date")
      .distinct().collect().map(_.getString(0)).toSeq
    assert(firstSeen === Seq("2026-02-09"))
  }

  test("versioned store pipeline: daily runs commit snapshots; a bad day rolls back") {
    val base = Files.createTempDirectory("graft-pipeline-v").toString
    val vs = new graft.table.VersionedTableStore(spark, s"$base/warehouse")
    val r = new PipelineRunner(spark, vs, rawRoot = s"$base/raw",
      symbols = Seq("AAPL", "MSFT", "GOOGL"),
      clock = () => Instant.parse("2026-02-10T02:00:00Z"))
    r.runDaily("2026-02-09")
    val goodFact = vs.currentVersion("fact_stock_daily_price")
    assert(vs.read("fact_stock_daily_price").count() === 3)
    r.runDaily("2026-02-10")
    assert(vs.read("fact_stock_daily_price").count() === 6)
    // day 2 turns out bad: one rollback restores day-1 state, and the
    // bad snapshot stays inspectable (time travel)
    val badFact = vs.currentVersion("fact_stock_daily_price")
    vs.rollbackTo("fact_stock_daily_price", goodFact)
    assert(vs.read("fact_stock_daily_price").count() === 3)
    assert(vs.readVersion("fact_stock_daily_price", badFact).count() === 6)
    // validation is green on the restored day-1 state
    val results = r.jobs.validate(forDate = Some("2026-02-09"))
    assert(results.nonEmpty && results.forall(_.passed))
  }

  test("maintenance DAG: optimize + retention + release tag over the whole warehouse") {
    val base = Files.createTempDirectory("graft-pipeline-m").toString
    val vs = new graft.table.VersionedTableStore(spark, s"$base/warehouse")
    val r = new PipelineRunner(spark, vs, rawRoot = s"$base/raw",
      symbols = Seq("AAPL", "MSFT", "GOOGL"),
      clock = () => Instant.parse("2026-02-11T02:00:00Z"))
    r.runDaily("2026-02-09")
    r.runDaily("2026-02-10")
    val tables = vs.tables()
    assert(tables.contains("fact_stock_daily_price") &&
      tables.contains("dim_stock"))
    val before = tables.map(t => t -> vs.read(t).count()).toMap
    val acts = r.runMaintenance(tagFactAs = Some("2026-02-10"))
    assert(acts.map(_._1) === tables)
    // contents untouched, every table still readable, fact packed to
    // at most a file per partition
    tables.foreach(t => assert(vs.read(t).count() === before(t), t))
    assert(vs.readTag("fact_stock_daily_price", "daily-2026-02-10")
      .count() === before("fact_stock_daily_price"))
    // maintenance is idempotent: a second run packs nothing new
    val acts2 = r.runMaintenance()
    assert(acts2.map(_._2) === acts.map(_._2),
      "second maintenance run burned snapshots on packed tables")
    // a plain-store pipeline has nothing versioned to maintain
    assert(freshRunner().runMaintenance() === Nil)
  }

  test("maintenance sweeps long-lived branches: expire_branch keeps base + recent") {
    // main retention never touches branch lineage (pinned until
    // dropBranch), so the maintenance DAG is what bounds a busy
    // branch's growth
    val base = Files.createTempDirectory("graft-pipeline-b").toString
    val vs = new graft.table.VersionedTableStore(spark, s"$base/warehouse")
    val r = new PipelineRunner(spark, vs, rawRoot = s"$base/raw",
      symbols = Seq("AAPL"),
      clock = () => Instant.parse("2026-02-11T02:00:00Z"))
    import spark.implicits._
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "scratch")
    vs.createBranch("scratch", "exp")
    (1 to 5).foreach(i =>
      vs.commitFull(Seq((i, "b")).toDF("k", "v"), "scratch", branch = "exp"))
    assert(vs.branchVersions("scratch", "exp").size === 6)
    r.runMaintenance(branchKeep = 2)
    // base (merge anchor) + newest 2 survive; head still reads; the
    // merge path still works from the retained base
    assert(vs.branchVersions("scratch", "exp").size === 3)
    assert(vs.readBranch("scratch", "exp")
      .select("k", "v").as[(Int, String)].collect().toSeq === Seq((5, "b")))
    vs.mergeBranch("scratch", "exp")
    assert(vs.read("scratch")
      .select("k", "v").as[(Int, String)].collect().toSeq === Seq((5, "b")))
  }

  test("backfill runs the daily DAG over the inclusive date range, idempotently") {
    val r = freshRunner()
    val dates = r.runBackfill("2026-02-08", "2026-02-10")
    assert(dates === Seq("2026-02-08", "2026-02-09", "2026-02-10"))
    assert(r.store.read("fact_stock_daily_price").count() === 9)
    // a re-run of a slice (crash recovery) changes nothing
    r.runBackfill("2026-02-09", "2026-02-10")
    assert(r.store.read("fact_stock_daily_price").count() === 9)
    intercept[IllegalArgumentException] {
      r.runBackfill("2026-02-10", "2026-02-08")
    }
  }

  test("duplicate extraction within a day: latest extraction wins (W1)") {
    val base = Files.createTempDirectory("graft-pipeline").toString
    val store = new TableStore(spark, s"$base/warehouse")
    val jobs = new StarSchemaJobs(spark, store, s"$base/raw")
    jobs.extract(Seq("AAPL"), "2026-02-09", "2026-02-10T01:00:00Z")
    jobs.extract(Seq("AAPL"), "2026-02-09", "2026-02-10T02:00:00Z")
    jobs.buildFact("2026-02-09", "2026-02-10 02:00:00")
    val fact = store.read("fact_stock_daily_price")
    assert(fact.count() === 1) // deduped to one row per (symbol, day)
  }

  test("weekly aggregation rolls up across days with pinned open/close") {
    val r = freshRunner()
    // Mon + Tue of ISO week 7, 2026
    r.runDaily("2026-02-09")
    r.runDaily("2026-02-10")
    val store = new TableStore(spark, r.store.root)
    val weekly = store.read("agg_stock_weekly_metrics")
      .filter(col("symbol") === "AAPL" && col("week") === 7).head()
    val fact = store.read("fact_stock_daily_price").filter(col("stock_symbol") === "AAPL")
      .orderBy("trade_date").collect()
    assert(weekly.getAs[java.math.BigDecimal]("week_open") ===
      fact.head.getAs[java.math.BigDecimal]("open_price"))
    assert(weekly.getAs[java.math.BigDecimal]("week_close") ===
      fact.last.getAs[java.math.BigDecimal]("close_price"))
    assert(weekly.getAs[Long]("total_volume") ===
      fact.map(_.getAs[Long]("volume")).sum)
  }

  test("incremental aggregation matches full rebuild and preserves other periods") {
    val r = freshRunner()
    // two different ISO weeks and a month boundary: wk 5 (Jan) + wk 7 (Feb)
    r.runDaily("2026-01-28")
    r.runDaily("2026-02-10")
    val store = r.store
    val incremental = store.read("agg_stock_weekly_metrics")
      .orderBy("year", "week", "symbol").collect().map(_.toString).toSeq
    assert(store.read("agg_stock_weekly_metrics")
      .select("week").distinct().count() === 2) // both weeks present
    assert(store.read("agg_stock_monthly_metrics")
      .select("month").distinct().count() === 2) // Jan + Feb
    // a full rebuild lands on the identical table
    r.jobs.buildAggregations(forDate = None)
    val full = store.read("agg_stock_weekly_metrics")
      .orderBy("year", "week", "symbol").collect().map(_.toString).toSeq
    assert(incremental === full)
  }

  test("ad-hoc SQL surface answers the reference's QUICK_START query") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    WarehouseSql.attach(r.store)
    val rows = spark.sql(
      """SELECT stock_symbol, trade_date, close_price
         FROM fact_stock_daily_price ORDER BY trade_date DESC LIMIT 10""").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[java.math.BigDecimal]("close_price").signum > 0))
  }

  test("warehouse tables resolve via the session catalog after writes") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    // no attach(): the writes themselves registered the tables
    assert(spark.table("fact_stock_daily_price").count() === 3)
    assert(spark.table("dim_stock").count() === 3)
    assert(spark.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName")).contains("fact_stock_daily_price"))
    // partition metadata survives registration (partition-pruned scan)
    val pruned = spark.table("fact_stock_daily_price")
      .filter(col("processing_date") === "2026-02-09")
    assert(pruned.count() === 3)
    assert(scanPartitionFilters(pruned).nonEmpty)
    // a second day's upsert refreshes the catalog view of the table
    r.runDaily("2026-02-10")
    assert(spark.table("fact_stock_daily_price").count() === 6)
  }

  private def scanPartitionFilters(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.partitionFilters
    }.flatten

  test("current-period validation batches are partition-pruned (F13/F14)") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    r.runDaily("2026-02-10")
    // scoped validation passes on the current day only
    val results = r.jobs.validate(forDate = Some("2026-02-10"))
    assert(results.forall(_.passed))
    // the daily-fact batch counts only the day's rows
    val factBatch = results.find(r2 => r2.rule == "not_null" && r2.detail == "stock_symbol")
    assert(factBatch.exists(_.totalRows === 3))
    // the LIKE-prefix batch filter prunes the fact scan to one partition
    val likeScoped = r.store.read("fact_stock_daily_price")
      .filter(col("processing_date").like("2026-02-10%"))
    assert(scanPartitionFilters(likeScoped).nonEmpty)
    assert(likeScoped.count() === 3)
  }

  test("fan-out DAG variant builds the same star schema (D2)") {
    val r = freshRunner()
    r.runDailyFanOut("2026-02-09")
    assert(r.store.read("fact_stock_daily_price").count() === 3)
    assert(r.store.read("dim_stock").count() === 3)
    assert(r.store.read("agg_stock_weekly_metrics").count() > 0)
  }

  test("retry waits the configured delay between attempts (D3)") {
    val base = Files.createTempDirectory("graft-retry").toString
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    // rawRoot is a regular FILE: the extract stage fails automatically
    // on both attempts, so the runner sleeps exactly `retries` times
    val blocked = Files.createTempFile("graft-raw-blocked", ".dat").toString
    val r = new PipelineRunner(spark,
      new TableStore(spark, s"$base/warehouse"), rawRoot = blocked,
      symbols = Seq("AAPL"),
      clock = () => Instant.parse("2026-02-10T02:00:00Z"),
      retries = 1, retryDelayMs = 12345L, sleeper = sleeps += _)
    intercept[Exception] { r.runDaily("2026-02-09") }
    assert(sleeps.toSeq === Seq(12345L))
  }

  test("smoke test mirrors the reference's production-check DAG") {
    val r = freshRunner()
    // before any run: engine checks pass, the table check reports false
    val before = r.smokeTest().map(c => c._1 -> c._2).toMap
    assert(before("validation_context") && before("sql_surface"))
    assert(!before("table_query"))
    r.runDaily("2026-02-09")
    assert(r.smokeTest().forall(_._2))
  }

  test("runDaily persists validation history; re-runs stay idempotent per date") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    val log = new graft.quality.ValidationLog(r.store)
    val h1 = log.history
    // all four suites landed under the date's run id, clock-stamped
    val n1 = h1.count()
    assert(h1.filter(col("run_id") === "daily-2026-02-09").count() === n1)
    assert(n1 > 10)
    assert(h1.select("validated_at").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("2026-02-10T02:00:00Z"))
    assert(log.failures.count() === 0)
    // retrying the date replaces its partition; a new date adds one
    r.runDaily("2026-02-09")
    assert(log.history.count() === n1)
    r.runDaily("2026-02-10")
    assert(log.history.select("run_id").distinct().count() === 2)
    // the history is plain warehouse SQL away (the GX data-docs ask)
    r.store.register("validation_results", Seq("run_id"))
    assert(spark.sql(
      """SELECT count(*) FROM validation_results
         WHERE passed AND run_id = 'daily-2026-02-10'""").head().getLong(0) > 0)
  }

  test("a failing suite lands its results in history BEFORE enforcement throws") {
    val r = freshRunner()
    r.runDaily("2026-02-09")
    // corrupt the weekly agg with a duplicated key row (collect first:
    // the replace would otherwise overwrite files its own plan reads)
    val weekly = r.store.read("agg_stock_weekly_metrics")
    val rows = weekly.collect().toSeq
    val corrupted = spark.createDataFrame(
      spark.sparkContext.parallelize(rows :+ rows.head), weekly.schema)
    r.store.createOrReplace(corrupted, "agg_stock_weekly_metrics")
    val e = intercept[IllegalStateException] {
      r.jobs.validate(forDate = Some("2026-02-09"),
        recordAs = Some(graft.quality.ValidationRun("daily-2026-02-09", "t2")))
    }
    assert(e.getMessage.contains("weekly_agg"))
    // the post-mortem row is there, violation count and all
    val log = new graft.quality.ValidationLog(r.store)
    val f = log.failures.select("suite", "rule", "violations").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(f === Seq(("weekly_agg", "compound_unique", 1L)))
  }

  test("generator is deterministic across invocations") {
    val a = graft.sources.QuoteGenerator
      .quotes(spark, Seq("AAPL", "MSFT"), "2026-02-09", "t").collect()
    val b = graft.sources.QuoteGenerator
      .quotes(spark, Seq("AAPL", "MSFT"), "2026-02-09", "t").collect()
    assert(a === b)
  }

  test("DML alias stripping: literals, backtick identifiers, and struct paths survive") {
    def s(text: String) = WarehouseSql.stripAlias(text, "u")
    // plain qualifier refs lose the alias
    assert(s("u.x > 1 AND u.y = u.x") === "x > 1 AND y = x")
    // case-insensitive, like SQL identifiers
    assert(s("U.x = 1") === "x = 1")
    // string literals are opaque -- BOTH quote forms (Spark's expr()
    // reads double-quoted text as a string literal too) and escapes
    assert(s("name = 'u.x'") === "name = 'u.x'")
    assert(s("""name = "u.x" OR u.k = 'it''s u.'""") ===
      """name = "u.x" OR k = 'it''s u.'""")
    // a column literally named `u.x` is an identifier, not a
    // qualification -- backticks protect it
    assert(s("`u.x` = 3") === "`u.x` = 3")
    // a struct path whose MIDDLE segment equals the alias is not a
    // qualification either
    assert(s("a.u.b = 2") === "a.u.b = 2")
    // ...but the alias at the HEAD of a path does strip, including
    // before a backticked column
    assert(s("u.`weird col` = 1") === "`weird col` = 1")
    // word-boundary: `au.x` is some other qualifier, untouched
    assert(s("au.x = 1") === "au.x = 1")
  }
}
