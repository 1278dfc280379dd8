package graft.table

import java.util.Locale

/** SQL-text MERGE surface: parses the MERGE statement shapes the
  * reference runs against its Iceberg warehouse (plus the standard
  * matched-DELETE clause) and dispatches to [[UpsertWriter]], so those
  * statements run verbatim against any [[WarehouseWrites]] store:
  *
  *  - update-all (build_stock_fact_table.py:104-111,
  *    build_stock_aggregations.py:123-130):
  *    {{{
  *    MERGE INTO db.tbl t USING src s
  *    ON t.k1 = s.k1 AND t.k2 = s.k2
  *    WHEN MATCHED THEN UPDATE SET *
  *    WHEN NOT MATCHED THEN INSERT *
  *    }}}
  *  - selective-update (build_stock_dimensions.py:88-102):
  *    `UPDATE SET t.c1 = s.c1, t.c2 = s.c2, ...` -- every target
  *    column NOT named in the SET list is preserved on match.
  *  - matched-DELETE (the third standard MERGE clause -- beyond the
  *    reference's own statements, in scope because it is the first
  *    statement any Iceberg/Delta user ports):
  *    {{{
  *    MERGE INTO db.tbl t USING src s ON t.k = s.k
  *    WHEN MATCHED [AND <cond>] THEN DELETE
  *    [WHEN NOT MATCHED THEN INSERT *]
  *    }}}
  *    `<cond>` is any Spark boolean expression over `t.`/`s.` columns,
  *    evaluated with the statement's own aliases; the clause fires
  *    only where it is TRUE (NULL keeps the row, per MERGE
  *    clause-firing semantics).
  *
  * This is a statement shim, not a SQL engine: the grammar is exactly
  * the equi-key MERGE above (same-name key equality conjunction,
  * `INSERT *`, identity column assignments). Anything richer --
  * mixed UPDATE+DELETE matched clauses, `NOT MATCHED BY SOURCE`,
  * expression assignments, `INSERT (cols) VALUES ...` -- fails loudly
  * with the unsupported construct named, rather than approximating
  * different semantics. The USING relation is resolved through the
  * session catalog (`spark.table`), matching the reference's
  * createOrReplaceTempView-then-MERGE pattern.
  */
object MergeSql {

  /** What the single WHEN MATCHED clause does. */
  private[table] sealed trait Action
  private[table] case object UpdateAll extends Action
  private[table] case class UpdateCols(cols: Seq[String]) extends Action
  /** Matched-DELETE: optional AND-condition text (Spark SQL, evaluated
    * under the statement's aliases) and whether an INSERT clause
    * follows. */
  private[table] case class DeleteMatched(cond: Option[String],
      insert: Boolean) extends Action

  /** A recognized MERGE statement: target table (qualification
    * stripped -- the store is the catalog), source relation name, the
    * statement's aliases, equi-join key columns, and the matched
    * action. */
  private[table] case class Parsed(table: String, source: String,
      tAlias: String, sAlias: String, keys: Seq[String], action: Action)

  private val Head = "(?is)^\\s*MERGE\\s+INTO\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+USING\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+ON\\s+(.+?)"

  private val UpdateStmt = (Head +
    "\\s+WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+(.+?)" +
    "\\s+WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*;?\\s*$").r

  private val DeleteStmt = (Head +
    "\\s+WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+DELETE" +
    "(\\s+WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*)?\\s*;?\\s*$").r

  private val Equality =
    "(?s)^\\s*(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)\\s*$".r

  private def fail(why: String): Nothing =
    throw new IllegalArgumentException(s"unsupported MERGE statement: $why")

  /** Resolve aliases and the ON conjunction shared by every statement
    * shape; returns (Parsed minus action, side classifier). */
  private def header(table: String, tAliasOrNull: String, source: String,
      sAliasOrNull: String, on: String): (String, String, String, String, Seq[String],
      (String, String) => Either[String, String]) = {
    val tName = table.split('.').last
    val tAlias = Option(tAliasOrNull).getOrElse(tName)
    val sAlias = Option(sAliasOrNull).getOrElse(source.split('.').last)
    def side(alias: String, col: String): Either[String, String] =
      alias.toLowerCase(Locale.ROOT) match {
        case a if a == tAlias.toLowerCase(Locale.ROOT) => Left(col)
        case a if a == sAlias.toLowerCase(Locale.ROOT) => Right(col)
        case other => fail(s"alias `$other` is neither target `$tAlias`" +
          s" nor source `$sAlias`")
      }
    val keys = on.split("(?i)\\s+AND\\s+").toSeq.map {
      case Equality(a1, c1, a2, c2) =>
        (side(a1, c1), side(a2, c2)) match {
          case (Left(t), Right(s)) if t.equalsIgnoreCase(s) => t
          case (Right(s), Left(t)) if t.equalsIgnoreCase(s) => t
          case _ => fail(s"ON term `$a1.$c1 = $a2.$c2` is not a" +
            " same-name target/source key equality")
        }
      case term => fail(s"ON term `${term.trim}` is not a column equality" +
        " (only AND-conjoined equi-key conditions are supported)")
    }
    (tName, source, tAlias, sAlias, keys, side)
  }

  private[table] def parse(sql: String): Parsed = sql match {
    case UpdateStmt(table, tA, source, sA, on, set) =>
      val (tName, src, tAlias, sAlias, keys, side) = header(table, tA, source, sA, on)
      val setTrim = set.trim
      val action =
        if (setTrim == "*") UpdateAll
        else UpdateCols(setTrim.split(",").toSeq.map {
          case Equality(a1, c1, a2, c2) =>
            (side(a1, c1), side(a2, c2)) match {
              case (Left(t), Right(s)) if t.equalsIgnoreCase(s) => t
              case _ => fail(s"SET assignment `$a1.$c1 = $a2.$c2` is not an" +
                " identity target-from-source assignment")
            }
          case a => fail(s"SET assignment `${a.trim}` is not `t.col = s.col`")
        })
      Parsed(tName, src, tAlias, sAlias, keys, action)
    case DeleteStmt(table, tA, source, sA, on, condOrNull, insertOrNull) =>
      val (tName, src, tAlias, sAlias, keys, _) = header(table, tA, source, sA, on)
      Parsed(tName, src, tAlias, sAlias, keys,
        DeleteMatched(Option(condOrNull).map(_.trim).filter(_.nonEmpty),
          insert = insertOrNull != null))
    case _ => fail("expected MERGE INTO ... USING ... ON ... WHEN MATCHED" +
      " THEN UPDATE SET ... WHEN NOT MATCHED THEN INSERT *, or WHEN" +
      " MATCHED [AND <cond>] THEN DELETE [WHEN NOT MATCHED THEN INSERT *]")
  }

  /** Run a MERGE statement against `store`. `partitionBy` carries the
    * target's partition columns (partition-local commit path), exactly
    * as the API entry points take it. */
  def merge(store: WarehouseWrites, sql: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val p = parse(sql)
    val source = store.spark.table(p.source)
    p.action match {
      case UpdateAll =>
        UpsertWriter.upsertAll(store, p.table, source, p.keys, partitionBy)
      case UpdateCols(updated) =>
        // preserve = every target column the SET list does not assign
        // (keys are equal on match by definition, so their bucket is
        // irrelevant; listing them as preserved would also be correct)
        val preserve =
          if (store.exists(p.table))
            store.read(p.table).columns.toSeq
              .filterNot(c => p.keys.exists(_.equalsIgnoreCase(c)) ||
                updated.exists(_.equalsIgnoreCase(c)))
          else Nil
        UpsertWriter.upsertSelective(store, p.table, source, p.keys, preserve,
          partitionBy)
      case DeleteMatched(cond, insert) =>
        UpsertWriter.deleteMerge(store, p.table, source, p.keys, cond,
          insertUnmatched = insert, targetAlias = p.tAlias,
          sourceAlias = p.sAlias, partitionBy = partitionBy)
    }
  }
}
