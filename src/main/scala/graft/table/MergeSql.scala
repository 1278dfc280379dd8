package graft.table

import java.util.Locale

/** SQL-text MERGE surface: parses the standard equi-key MERGE statement
  * grammar and dispatches to [[UpsertWriter]], so those statements run
  * verbatim against any [[WarehouseWrites]] store:
  *
  * {{{
  * MERGE INTO db.tbl [AS] t USING src [AS] s
  * ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
  * { WHEN MATCHED [AND <cond>] THEN UPDATE SET { * | t.c = <expr>, ... }
  * | WHEN MATCHED [AND <cond>] THEN DELETE } ...
  * [WHEN NOT MATCHED THEN INSERT *]
  * }}}
  *
  * Covers the reference's two statement shapes verbatim
  * (build_stock_fact_table.py:104-111 update-all,
  * build_stock_dimensions.py:88-102 selective), plus the standard
  * constructs a real Iceberg/Delta user ports next: matched-DELETE,
  * conditional WHEN clauses (first TRUE condition wins per row, SQL
  * clause-order semantics), multiple matched clauses in one statement,
  * and expression assignments (`t.cnt = t.cnt + s.cnt`). Conditions
  * and assignment expressions are Spark SQL, evaluated under the
  * statement's own aliases.
  *
  * Still a statement shim, not a SQL engine: the ON clause must be a
  * same-name equi-key conjunction, INSERT is `INSERT *` only, and the
  * NOT MATCHED clause is unconditional. Anything else -- `NOT MATCHED
  * BY SOURCE`, `INSERT (cols) VALUES ...`, conditional inserts --
  * fails loudly with the unsupported construct named, rather than
  * approximating different semantics. The USING relation is resolved
  * through the session catalog (`spark.table`), matching the
  * reference's createOrReplaceTempView-then-MERGE pattern.
  *
  * Dispatch: the three statement shapes with specialized executors --
  * unconditional update-all (-> [[UpsertWriter.upsertAll]], which
  * keeps the partition-local commit path), unconditional selective
  * identity-update (-> [[UpsertWriter.upsertSelective]]), single
  * delete clause (-> [[UpsertWriter.deleteMerge]]) -- go there; every
  * richer statement runs on the general ordered-clause executor
  * ([[UpsertWriter.runMerge]]).
  */
object MergeSql {

  /** A recognized MERGE statement. */
  private[table] case class Parsed(table: String, source: String,
      tAlias: String, sAlias: String, keys: Seq[String],
      clauses: Seq[UpsertWriter.MatchedClause], insert: Boolean)

  private val Head = ("(?is)^\\s*MERGE\\s+INTO\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+USING\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+ON\\s+(.+?)\\s+(WHEN\\s.+?)\\s*;?\\s*$").r

  private val DeleteClause =
    "(?is)^WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+DELETE\\s*$".r
  private val UpdateClause =
    "(?is)^WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+UPDATE\\s+SET\\s+(.+?)\\s*$".r
  private val InsertClause =
    "(?is)^WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*$".r

  private val Equality =
    "(?s)^\\s*(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)\\s*$".r
  private val Assignment =
    "(?s)^\\s*(?:(\\w+)\\.)?(\\w+)\\s*=\\s*(.+?)\\s*$".r

  private def fail(why: String): Nothing =
    throw new IllegalArgumentException(s"unsupported MERGE statement: $why")

  /** Split a SET list on TOP-LEVEL commas only, so multi-argument
    * function calls inside an assignment (`round(x, 2)`) survive.
    * Depth tracks parentheses; string literals containing commas or
    * parens are outside the grammar and fail in the analyzer. */
  private[graft] def splitAssignments(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case ch => sb += ch
    }
    out += sb.toString
    out.toSeq
  }

  private[table] def parse(sql: String): Parsed = sql match {
    case Head(table, tAliasOrNull, source, sAliasOrNull, on, tail) =>
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
      // split the clause tail at each WHEN keyword; a condition whose
      // text itself contains ` WHEN ` is outside the grammar and fails
      // in the per-clause match below
      val chunks = tail.split("(?i)\\s+(?=WHEN\\s)").toSeq
      val (matchedChunks, insertChunks) =
        chunks.partition(c => !InsertClause.pattern.matcher(c).matches())
      if (insertChunks.size > 1) fail("more than one INSERT clause")
      if (insertChunks.nonEmpty && !InsertClause.pattern
          .matcher(chunks.last).matches())
        fail("WHEN NOT MATCHED THEN INSERT * must be the final clause")
      val clauses: Seq[UpsertWriter.MatchedClause] = matchedChunks.map {
        case DeleteClause(condOrNull) =>
          UpsertWriter.MatchedDelete(
            Option(condOrNull).map(_.trim).filter(_.nonEmpty))
        case UpdateClause(condOrNull, set) =>
          val cond = Option(condOrNull).map(_.trim).filter(_.nonEmpty)
          val setTrim = set.trim
          if (setTrim == "*") UpsertWriter.MatchedUpdate(cond, all = true, Nil)
          else {
            val assigns = splitAssignments(setTrim).map {
              case Assignment(aliasOrNull, c, e) =>
                Option(aliasOrNull).foreach { a =>
                  if (!a.equalsIgnoreCase(tAlias))
                    fail(s"SET target `$a.$c` is not a target column" +
                      s" (target alias is `$tAlias`)")
                }
                c -> e
              case a => fail(s"SET assignment `${a.trim}` is not" +
                " `t.col = <expr>`")
            }
            UpsertWriter.MatchedUpdate(cond, all = false, assigns)
          }
        case other => fail(s"clause `${other.trim.take(80)}` is not WHEN" +
          " MATCHED [AND cond] THEN UPDATE SET ... | DELETE, or WHEN NOT" +
          " MATCHED THEN INSERT *")
      }
      if (clauses.isEmpty && insertChunks.isEmpty) fail("no WHEN clauses")
      Parsed(tName, source, tAlias, sAlias, keys, clauses,
        insert = insertChunks.nonEmpty)
    case _ => fail("expected MERGE INTO ... USING ... ON ... WHEN ...")
  }

  private val ColRef = "(?s)^\\s*(?:(\\w+)\\.)?(\\w+)\\s*$".r

  /** True when every assignment is the identity `t.c = s.c` -- the
    * shape [[UpsertWriter.upsertSelective]] executes. Bare (unaliased)
    * column refs are NOT classified as identity: in the joined frame
    * they are ambiguous, and the general executor lets Spark's
    * analyzer reject them loudly. */
  private def identityAssigns(assigns: Seq[(String, String)],
      sAlias: String): Option[Seq[String]] = {
    val ids = assigns.map { case (tc, e) =>
      e.trim match {
        case ColRef(aliasOrNull, c)
            if Option(aliasOrNull).exists(_.equalsIgnoreCase(sAlias)) &&
              c.equalsIgnoreCase(tc) => Some(tc)
        case _ => None
      }
    }
    if (ids.forall(_.isDefined)) Some(ids.flatten) else None
  }

  /** Run a MERGE statement against `store`. `partitionBy` carries the
    * target's partition columns (partition-local commit path where the
    * statement shape allows it), exactly as the API entry points take
    * it. */
  def merge(store: WarehouseWrites, sql: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val p = parse(sql)
    val source = store.spark.table(p.source)
    import UpsertWriter._
    (p.clauses, p.insert) match {
      case (Seq(MatchedUpdate(None, true, _)), true) =>
        upsertAll(store, p.table, source, p.keys, partitionBy)
      case (Seq(MatchedUpdate(None, false, assigns)), true)
          if identityAssigns(assigns, p.sAlias).isDefined =>
        val updated = identityAssigns(assigns, p.sAlias).get
        // preserve = every target column the SET list does not assign
        // (keys are equal on match by definition, so their bucket is
        // irrelevant; listing them as preserved would also be correct)
        val preserve =
          if (store.exists(p.table))
            store.read(p.table).columns.toSeq
              .filterNot(c => p.keys.exists(_.equalsIgnoreCase(c)) ||
                updated.exists(_.equalsIgnoreCase(c)))
          else Nil
        upsertSelective(store, p.table, source, p.keys, preserve, partitionBy)
      case (Seq(MatchedDelete(cond)), ins) =>
        deleteMerge(store, p.table, source, p.keys, cond,
          insertUnmatched = ins, targetAlias = p.tAlias,
          sourceAlias = p.sAlias, partitionBy = partitionBy)
      case (clauses, ins) =>
        runMerge(store, p.table, source, p.keys, clauses, ins,
          targetAlias = p.tAlias, sourceAlias = p.sAlias,
          partitionBy = partitionBy)
    }
  }
}
