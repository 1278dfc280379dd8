package graft.pipeline

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.SparkSession

import graft.table.WarehouseWrites

/** DAG-shaped orchestration (SURVEY.md S2.11) as a plain in-process
  * runner: the reference's Airflow DAG extract >> dims >> fact >>
  * aggs >> validate (nasdaq_stock_pipeline_with_gx.py:311-319)
  * becomes an ordered list of stage functions with a retry wrapper
  * (D3: retries=1) and an injectable clock (D6: T-1 trading date,
  * frozen in tests).
  *
  * The reference's process boundaries (Lambda, Glue polling, Athena)
  * collapse into function calls; the only boundaries left are Spark
  * shuffles and warehouse commits -- which is the point of the
  * Spark-native rebuild (SURVEY.md S3.1).
  *
  * The store is any [[WarehouseWrites]], kept at its concrete type:
  * [[graft.table.TableStore]] gives the reference's destructive
  * staged-swap warehouse; [[graft.table.VersionedTableStore]] makes
  * every daily run a snapshot commit, so a bad day is one
  * `rollbackTo` away (the reference's Iceberg recovery story,
  * build_stock_fact_table.py:98-100).
  */
class PipelineRunner[S <: WarehouseWrites](
    spark: SparkSession,
    val store: S,
    rawRoot: String,
    symbols: Seq[String] = StarSchemaJobs.DefaultSymbols,
    clock: () => Instant = () => Instant.now(),
    retries: Int = 1,
    retryDelayMs: Long = 300000L,
    sleeper: Long => Unit = Thread.sleep) {

  val jobs = new StarSchemaJobs(spark, store, rawRoot)

  /** D6: T-1 trading date from the injected clock
    * (lambda_function.py:212-218). */
  def processingDate(): String =
    LocalDate.ofInstant(clock(), ZoneOffset.UTC).minusDays(1).toString

  /** D3: retries with a fixed delay between attempts (the reference's
    * retries=1 / retry_delay=5min, nasdaq_stock_pipeline_with_gx
    * .py:12-20). The sleeper is injectable so tests freeze it. */
  private def withRetry[T](stage: String)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception if attempt < retries =>
          attempt += 1
          System.err.println(s"[pipeline] stage $stage failed (${e.getMessage}), retry $attempt in ${retryDelayMs}ms")
          sleeper(retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** D1: the full daily run for one processing date, sequential
    * (nasdaq_stock_pipeline_with_gx.py:311-319). */
  def runDaily(date: String): Unit = {
    val extractionTime = clock().toString
    withRetry("extract")(jobs.extract(symbols, date, extractionTime))
    withRetry("dimensions")(jobs.buildDimensions(date))
    withRetry("fact")(jobs.buildFact(date, createdAt = extractionTime.take(19).replace('T', ' ')))
    withRetry("aggregations")(jobs.buildAggregations(forDate = Some(date)))
    withRetry("validate")(jobs.validate(forDate = Some(date),
      recordAs = Some(validationRun(date))))
  }

  /** Run tag for the date's validation history row group: the id is
    * the date itself (stable under retry, so a re-run replaces its own
    * partition -- the GX one-checkpoint-run-per-date shape), the stamp
    * comes from the injected clock (deterministic in tests). */
  private def validationRun(date: String) =
    graft.quality.ValidationRun(s"daily-$date", clock().toString)

  /** D2: the fan-out/fan-in DAG variant -- extract >> [dims, fact] >>
    * aggs >> validate (nasdaq_stock_pipeline.py:256-261). dims and
    * fact have no mutual dependency, so they run as concurrent Spark
    * jobs (one scheduler, two submitting threads -- the Spark-native
    * twin of Airflow running two Glue jobs side by side). */
  def runDailyFanOut(date: String): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val extractionTime = clock().toString
    withRetry("extract")(jobs.extract(symbols, date, extractionTime))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val dims = Future(withRetry("dimensions")(jobs.buildDimensions(date)))
      val fact = Future(withRetry("fact")(
        jobs.buildFact(date, createdAt = extractionTime.take(19).replace('T', ' '))))
      Await.result(dims.zip(fact), Duration.Inf)
    } finally pool.shutdown()
    withRetry("aggregations")(jobs.buildAggregations(forDate = Some(date)))
    withRetry("validate")(jobs.validate(forDate = Some(date),
      recordAs = Some(validationRun(date))))
  }

  def runDaily(): Unit = runDaily(processingDate())

  /** Backfill: run the daily DAG for every date in [from, to],
    * inclusive, in order -- the Airflow catchup/backfill surface as a
    * plain loop (each day's run is idempotent, so a crashed backfill
    * is re-runnable from the start or the failed date). Returns the
    * dates run. */
  def runBackfill(from: String, to: String): Seq[String] = {
    val start = LocalDate.parse(from)
    val end = LocalDate.parse(to)
    require(!end.isBefore(start), s"backfill range is inverted: $from..$to")
    val dates = Iterator.iterate(start)(_.plusDays(1))
      .takeWhile(!_.isAfter(end)).map(_.toString).toSeq
    dates.foreach(runDaily)
    dates
  }

  /** Scheduled table maintenance -- the OPTIMIZE/VACUUM companion DAG
    * a delta-maintained lakehouse runs beside the daily pipeline. On a
    * VERSIONED store: bin-pack small files on every table in the
    * warehouse (daily MERGE commits leave a per-partition trickle;
    * `optimizeSmallFiles` touches only the partitions that need it and
    * no-ops when clean), apply snapshot retention, and optionally pin
    * the post-maintenance fact head under a `daily-<date>` tag -- the
    * release ref training/reporting jobs read for exact
    * reproducibility. Long-lived BRANCHES are swept too: main
    * retention deliberately never touches branch lineage (it is
    * pinned until dropBranch), so without a per-branch pass a busy
    * branch grows without bound -- every branch of every table gets
    * `expireBranchSnapshots` at `branchKeep` (its merge base and
    * newest commits always survive, so merges/diffs keep working).
    * On a plain store there is nothing versioned to maintain:
    * returns Nil. Returns (table, headVersionAfter). */
  def runMaintenance(tagFactAs: Option[String] = None,
      targetBytes: Long = 128L << 20,
      branchKeep: Int = 10): Seq[(String, Long)] = store match {
    case vs: graft.table.VersionedTableStore =>
      val acts = vs.tables().map { t =>
        val v = withRetry(s"optimize:$t")(vs.optimizeSmallFiles(t, targetBytes))
        vs.expireSnapshots(t)
        vs.branches(t).foreach { case (b, _, _) =>
          withRetry(s"expire_branch:$t:$b")(
            vs.expireBranchSnapshots(t, b, keep = branchKeep))
        }
        t -> v
      }
      tagFactAs.foreach(d => vs.tagSnapshot("fact_stock_daily_price",
        s"daily-$d", replace = true))
      acts
    case _ => Nil
  }

  /** The reference's third DAG (`test_gx_production.py`: GX-context
    * check >> Athena-connection check >> table-query check) as an
    * engine health probe: (1) the validation rule engine evaluates,
    * (2) the SQL surface answers, (3) the warehouse fact table is
    * readable end-to-end. Returns (check, ok, detail) -- never
    * throws, so schedulers can alert on `ok`. */
  def smokeTest(): Seq[(String, Boolean, String)] = {
    import scala.util.Try
    import org.apache.spark.sql.functions.lit
    val ctx = Try {
      val probe = spark.range(1).toDF("x").withColumn("y", lit(1))
      graft.quality.Validator.run(probe,
        Seq(graft.quality.NotNull("x"), graft.quality.RowCountBetween(1, 1)))
        .forall(_.passed)
    }
    val sql = Try(spark.sql("SELECT 1 AS ok").head().getInt(0) == 1)
    val table = Try(store.exists("fact_stock_daily_price") &&
      store.read("fact_stock_daily_price").limit(1).count() >= 0)
    Seq(
      ("validation_context", ctx.getOrElse(false),
        ctx.failed.map(_.getMessage).getOrElse("rule engine evaluates")),
      ("sql_surface", sql.getOrElse(false),
        sql.failed.map(_.getMessage).getOrElse("SELECT answers")),
      ("table_query", table.getOrElse(false),
        table.failed.map(_.getMessage).getOrElse("fact table readable")))
  }
}
