package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.{MergeSql, TableStore, WarehouseWrites}

/** S14: the ad-hoc SQL read surface (SURVEY.md S2.1, S3.3) -- the
  * engine twin of the reference's Athena queries. Warehouse tables
  * are registered in the SESSION CATALOG (external tables over the
  * store paths, so `spark.table` / `DESCRIBE` / `SHOW TABLES` all
  * work); graft's native functions are registered; then any
  * `spark.sql` string runs against the tables the pipeline wrote. */
object WarehouseSql {

  val StarTables: Seq[String] = Seq(
    "dim_stock", "dim_date", "dim_exchange", "fact_stock_daily_price",
    "agg_stock_weekly_metrics", "agg_stock_monthly_metrics", "agg_sector_performance")

  /** Register every existing warehouse table in the session catalog
    * (partitioning discovered from the directory layout). Tables
    * written through [[TableStore]] in this session are already
    * registered; attach covers stores opened read-only. */
  def attach(store: TableStore, tables: Seq[String] = StarTables): Unit = {
    tables.filter(store.exists).foreach(store.registerDiscovered)
    org.apache.spark.sql.graft.FunctionRegistration.register(store.spark)
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** SQL-text MERGE: the reference's `spark.sql("MERGE INTO ...")`
    * statements run verbatim against a graft store (see
    * [[graft.table.MergeSql]] for the recognized grammar). */
  def merge(store: WarehouseWrites, statement: String,
      partitionBy: Seq[String] = Nil): Unit =
    MergeSql.merge(store, statement, partitionBy)

  private val DeleteStmt =
    "(?is)^\\s*DELETE\\s+FROM\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+WHERE\\s+(.+?)\\s*;?\\s*$".r

  /** The DELETE/UPDATE grammar admits a target-table alias
    * (`DELETE FROM t AS u WHERE u.x > 1`), but the store evaluates
    * conditions against the bare table frame where no alias resolves.
    * The target is the ONLY relation in scope, so the qualifier is
    * pure naming: strip `alias.` wherever it STARTS an identifier
    * path, leaving untouched string literals (BOTH quote forms, since
    * Spark's expr() reads double-quoted text as a string literal too;
    * backslash and doubled-quote escapes covered), backtick-quoted
    * identifiers (a column literally named `u.x`), and mid-path
    * segments (`a.u.b` is a struct path whose middle field happens to
    * equal the alias -- the lookbehind keeps it intact). */
  private[pipeline] def stripAlias(text: String, alias: String): String =
    if (alias == null || alias.isEmpty) text
    else {
      val p = ("('(?:\\\\.|''|[^'\\\\])*'|\"(?:\\\\.|\"\"|[^\"\\\\])*\"|`[^`]*`)" +
        "|(?i)(?<![.`\\w])" +
        java.util.regex.Pattern.quote(alias) + "\\.(?=`?\\w)").r
      p.replaceAllIn(text, m =>
        if (m.group(1) != null)
          java.util.regex.Matcher.quoteReplacement(m.group(1))
        else "")
    }

  /** SQL-text DELETE: `DELETE FROM tbl WHERE <cond>` dispatched to the
    * store's [[WarehouseWrites.deleteWhere]] -- partition-granular
    * copy-on-write on a versioned store, staged full rewrite on a
    * plain one. The condition is any Spark SQL boolean over the
    * table's columns. */
  def delete(store: WarehouseWrites, statement: String,
      partitionBy: Seq[String] = Nil): Unit = statement match {
    case DeleteStmt(table, alias, cond) =>
      store.deleteWhere(table.split('.').last,
        org.apache.spark.sql.functions.expr(stripAlias(cond, alias)), partitionBy)
    case _ => throw new IllegalArgumentException(
      s"unsupported DELETE statement (expected DELETE FROM tbl WHERE cond): " +
        statement.take(120))
  }

  private val UpdateStmt =
    ("(?is)^\\s*UPDATE\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
      "\\s+SET\\s+(.+?)\\s+WHERE\\s+(.+?)\\s*;?\\s*$").r
  private val Assign = "(?s)^\\s*(\\w+)\\s*=\\s*(.+?)\\s*$".r

  /** SQL-text UPDATE: `UPDATE tbl SET c = <expr>, ... WHERE <cond>`
    * dispatched to [[WarehouseWrites.updateWhere]]. Assignments and
    * the condition are Spark SQL over the table's columns; the SET
    * list splits on top-level commas, so multi-argument function
    * calls (`round(x, 2)`) work. */
  def update(store: WarehouseWrites, statement: String,
      partitionBy: Seq[String] = Nil): Unit = statement match {
    case UpdateStmt(table, alias, set, cond) =>
      val assigns = MergeSql.splitAssignments(stripAlias(set, alias)).map {
        case Assign(c, e) => c -> org.apache.spark.sql.functions.expr(e)
        case a => throw new IllegalArgumentException(
          s"unsupported UPDATE assignment `${a.trim}` (expected col = expr)")
      }.toMap
      store.updateWhere(table.split('.').last,
        org.apache.spark.sql.functions.expr(stripAlias(cond, alias)), assigns,
        partitionBy)
    case _ => throw new IllegalArgumentException(
      s"unsupported UPDATE statement (expected UPDATE tbl SET ... WHERE ...): " +
        statement.take(120))
  }
}
