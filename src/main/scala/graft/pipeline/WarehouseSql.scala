package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.TableStore

/** S14: the ad-hoc SQL read surface (SURVEY.md S2.1, S3.3) -- the
  * engine twin of the reference's Athena queries. Warehouse tables
  * are attached as temp views; graft's native functions are
  * registered; then any `spark.sql` string runs against the same
  * snapshot the pipeline wrote. */
object WarehouseSql {

  val StarTables: Seq[String] = Seq(
    "dim_stock", "dim_date", "dim_exchange", "fact_stock_daily_price",
    "agg_stock_weekly_metrics", "agg_stock_monthly_metrics", "agg_sector_performance")

  /** Attach every existing warehouse table as a temp view. */
  def attach(store: TableStore, tables: Seq[String] = StarTables): Unit = {
    tables.filter(store.exists).foreach { t =>
      store.read(t).createOrReplaceTempView(t)
    }
    org.apache.spark.sql.graft.FunctionRegistration.register(store.spark)
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
