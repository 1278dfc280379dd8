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
  * | WHEN MATCHED [AND <cond>] THEN DELETE
  * | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET t.c = <expr>, ...
  * | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE } ...
  * [WHEN NOT MATCHED [BY TARGET] [AND <cond>]
  *    THEN INSERT { * | (c1, ...) VALUES (<expr>, ...) }]
  * }}}
  *
  * Covers the reference's two statement shapes verbatim
  * (build_stock_fact_table.py:104-111 update-all,
  * build_stock_dimensions.py:88-102 selective), plus the standard
  * constructs a real Iceberg/Delta user ports next: matched-DELETE,
  * conditional WHEN clauses (first TRUE condition wins per row, SQL
  * clause-order semantics), multiple matched clauses in one statement,
  * expression assignments (`t.cnt = t.cnt + s.cnt`), conditional and
  * column-list INSERT (unassigned target columns NULL), and the
  * `NOT MATCHED BY SOURCE` family (the CDC full-sync side: delete or
  * flag target rows the source no longer carries). Conditions and
  * assignment expressions are Spark SQL, evaluated under the
  * statement's own aliases.
  *
  * Still a statement shim, not a SQL engine: the ON clause must be a
  * same-name equi-key conjunction. Anything else fails loudly with
  * the unsupported construct named, rather than approximating
  * different semantics. The USING relation is resolved through the
  * session catalog (`spark.table`), matching the reference's
  * createOrReplaceTempView-then-MERGE pattern.
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
      clauses: Seq[UpsertWriter.MatchedClause],
      bySource: Seq[UpsertWriter.BySourceClause],
      insert: Option[UpsertWriter.InsertSpec])

  private val Head = ("(?is)^\\s*MERGE\\s+INTO\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+USING\\s+(\\S+?)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+ON\\s+(.+?)\\s+(WHEN\\s.+?)\\s*;?\\s*$").r

  private val DeleteClause =
    "(?is)^WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+DELETE\\s*$".r
  private val UpdateClause =
    "(?is)^WHEN\\s+MATCHED\\s+(?:AND\\s+(.+?)\\s+)?THEN\\s+UPDATE\\s+SET\\s+(.+?)\\s*$".r
  // BY TARGET is the standard no-op qualifier on the insert side
  private val InsertClause =
    ("(?is)^WHEN\\s+NOT\\s+MATCHED\\s+(?:BY\\s+TARGET\\s+)?" +
      "(?:AND\\s+(.+?)\\s+)?THEN\\s+INSERT\\s+(.+?)\\s*$").r
  private val InsertBody = "(?is)^\\((.*?)\\)\\s*VALUES\\s*\\((.*)\\)\\s*$".r
  private val BySourceDeleteClause =
    ("(?is)^WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE\\s+" +
      "(?:AND\\s+(.+?)\\s+)?THEN\\s+DELETE\\s*$").r
  private val BySourceUpdateClause =
    ("(?is)^WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE\\s+" +
      "(?:AND\\s+(.+?)\\s+)?THEN\\s+UPDATE\\s+SET\\s+(.+?)\\s*$").r

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
      def opt(condOrNull: String): Option[String] =
        Option(condOrNull).map(_.trim).filter(_.nonEmpty)
      def parseAssigns(set: String): Seq[(String, String)] =
        splitAssignments(set).map {
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
      def parseInsert(condOrNull: String, body: String): UpsertWriter.InsertSpec =
        body.trim match {
          case "*" => UpsertWriter.InsertSpec(opt(condOrNull))
          case InsertBody(colList, valList) =>
            val cs = colList.split(",").toSeq.map(_.trim).map {
              case ColRef(aliasOrNull, c) =>
                Option(aliasOrNull).foreach { a =>
                  if (!a.equalsIgnoreCase(tAlias))
                    fail(s"INSERT column `$a.$c` is not a target column" +
                      s" (target alias is `$tAlias`)")
                }
                c
              case c => fail(s"INSERT column `$c` is not a column name")
            }
            val vs = splitAssignments(valList).map(_.trim)
            if (cs.size != vs.size)
              fail(s"INSERT column list has ${cs.size} columns but" +
                s" VALUES has ${vs.size} expressions")
            UpsertWriter.InsertSpec(opt(condOrNull), cs, vs)
          case other => fail(s"INSERT body `${other.take(60)}` is neither" +
            " `*` nor `(cols) VALUES (exprs)`")
        }
      // split the clause tail at each WHEN keyword; a condition whose
      // text itself contains ` WHEN ` is outside the grammar and fails
      // in the per-clause match below. Clause ORDER matters only
      // within a family (matched / by-source); the row populations
      // are disjoint across families.
      val chunks = tail.split("(?i)\\s+(?=WHEN\\s)").toSeq
      val matchedB = Seq.newBuilder[UpsertWriter.MatchedClause]
      val bySourceB = Seq.newBuilder[UpsertWriter.BySourceClause]
      var insert: Option[UpsertWriter.InsertSpec] = None
      chunks.foreach {
        case BySourceDeleteClause(condOrNull) =>
          bySourceB += UpsertWriter.BySourceDelete(opt(condOrNull))
        case BySourceUpdateClause(condOrNull, set) =>
          if (set.trim == "*")
            fail("WHEN NOT MATCHED BY SOURCE ... UPDATE SET * has no" +
              " source row to copy from")
          bySourceB += UpsertWriter.BySourceUpdate(opt(condOrNull),
            parseAssigns(set.trim))
        case DeleteClause(condOrNull) =>
          matchedB += UpsertWriter.MatchedDelete(opt(condOrNull))
        case UpdateClause(condOrNull, set) =>
          val cond = opt(condOrNull)
          val setTrim = set.trim
          matchedB +=
            (if (setTrim == "*") UpsertWriter.MatchedUpdate(cond, all = true, Nil)
             else UpsertWriter.MatchedUpdate(cond, all = false,
               parseAssigns(setTrim)))
        case InsertClause(condOrNull, body) =>
          if (insert.nonEmpty) fail("more than one INSERT clause")
          insert = Some(parseInsert(condOrNull, body))
        case other => fail(s"clause `${other.trim.take(80)}` is not WHEN" +
          " MATCHED [AND cond] THEN UPDATE SET ... | DELETE, WHEN NOT" +
          " MATCHED [BY TARGET] [AND cond] THEN INSERT { * | (cols)" +
          " VALUES (exprs) }, or WHEN NOT MATCHED BY SOURCE [AND cond]" +
          " THEN UPDATE SET ... | DELETE")
      }
      val clauses = matchedB.result()
      val bySource = bySourceB.result()
      if (clauses.isEmpty && bySource.isEmpty && insert.isEmpty)
        fail("no WHEN clauses")
      Parsed(tName, source, tAlias, sAlias, keys, clauses, bySource, insert)
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
    // the specialized fast paths apply only to the plain-insert
    // shapes (unconditional INSERT *, no BY SOURCE clauses)
    val plainInsert = p.insert.exists(i => i.isStar && i.cond.isEmpty)
    (p.clauses, p.bySource) match {
      case (Seq(MatchedUpdate(None, true, _)), Nil) if plainInsert =>
        upsertAll(store, p.table, source, p.keys, partitionBy)
      case (Seq(MatchedUpdate(None, false, assigns)), Nil)
          if plainInsert && identityAssigns(assigns, p.sAlias).isDefined =>
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
      case (Seq(MatchedDelete(cond)), Nil)
          if p.insert.isEmpty || plainInsert =>
        deleteMerge(store, p.table, source, p.keys, cond,
          insertUnmatched = p.insert.nonEmpty, targetAlias = p.tAlias,
          sourceAlias = p.sAlias, partitionBy = partitionBy)
      case (clauses, bySource) =>
        runMerge(store, p.table, source, p.keys, clauses, p.insert,
          bySource, targetAlias = p.tAlias, sourceAlias = p.sAlias,
          partitionBy = partitionBy)
    }
  }
}
