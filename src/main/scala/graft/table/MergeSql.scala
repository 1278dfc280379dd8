package graft.table

import java.util.Locale

/** SQL-text MERGE surface: parses the two MERGE statement shapes the
  * reference runs against its Iceberg warehouse and dispatches to
  * [[UpsertWriter]], so those statements run verbatim against any
  * [[WarehouseWrites]] store:
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
  *
  * This is a statement shim, not a SQL engine: the grammar is exactly
  * the equi-key upsert MERGE (same-name key equality conjunction,
  * `INSERT *`, identity column assignments). Anything richer --
  * matched-DELETE, conditional WHEN clauses, expression assignments --
  * fails loudly with the unsupported construct named, rather than
  * approximating different semantics. The USING relation is resolved
  * through the session catalog (`spark.table`), matching the
  * reference's createOrReplaceTempView-then-MERGE pattern.
  */
object MergeSql {

  /** A recognized MERGE statement: target table (qualification
    * stripped -- the store is the catalog), source relation name,
    * equi-join key columns, and either update-all or the explicit
    * updated-column list. */
  private[table] case class Parsed(table: String, source: String,
      keys: Seq[String], updateAll: Boolean, updatedColumns: Seq[String])

  private val Stmt = ("(?is)^\\s*MERGE\\s+INTO\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+USING\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+ON\\s+(.+?)" +
    "\\s+WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+(.+?)" +
    "\\s+WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*;?\\s*$").r

  private val Equality =
    "(?s)^\\s*(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)\\s*$".r

  private def fail(why: String): Nothing =
    throw new IllegalArgumentException(s"unsupported MERGE statement: $why")

  private[table] def parse(sql: String): Parsed = sql match {
    case Stmt(table, tAliasOrNull, source, sAliasOrNull, on, set) =>
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
      val setTrim = set.trim
      if (setTrim == "*") Parsed(tName, source, keys, updateAll = true, Nil)
      else {
        val updated = setTrim.split(",").toSeq.map {
          case Equality(a1, c1, a2, c2) =>
            (side(a1, c1), side(a2, c2)) match {
              case (Left(t), Right(s)) if t.equalsIgnoreCase(s) => t
              case _ => fail(s"SET assignment `$a1.$c1 = $a2.$c2` is not an" +
                " identity target-from-source assignment")
            }
          case a => fail(s"SET assignment `${a.trim}` is not `t.col = s.col`")
        }
        Parsed(tName, source, keys, updateAll = false, updated)
      }
    case _ => fail("expected MERGE INTO ... USING ... ON ... WHEN MATCHED" +
      " THEN UPDATE SET ... WHEN NOT MATCHED THEN INSERT *")
  }

  /** Run a MERGE statement against `store`. `partitionBy` carries the
    * target's partition columns (partition-local commit path), exactly
    * as the API entry points take it. */
  def merge(store: WarehouseWrites, sql: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val p = parse(sql)
    val source = store.spark.table(p.source)
    if (p.updateAll)
      UpsertWriter.upsertAll(store, p.table, source, p.keys, partitionBy)
    else {
      // preserve = every target column the SET list does not assign
      // (keys are equal on match by definition, so their bucket is
      // irrelevant; listing them as preserved would also be correct)
      val preserve =
        if (store.exists(p.table))
          store.read(p.table).columns.toSeq
            .filterNot(c => p.keys.exists(_.equalsIgnoreCase(c)) ||
              p.updatedColumns.exists(_.equalsIgnoreCase(c)))
        else Nil
      UpsertWriter.upsertSelective(store, p.table, source, p.keys, preserve,
        partitionBy)
    }
  }
}
