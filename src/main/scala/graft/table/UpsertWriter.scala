package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-equivalent upsert semantics without Iceberg (SURVEY.md S7.4).
  *
  * The reference's two MERGE flavors:
  *  - [[upsertAll]]: `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
  *    THEN INSERT *` on a natural key (build_stock_fact_table.py:
  *    104-111, build_stock_aggregations.py:123-130,187-194,243-250).
  *  - [[upsertSelective]]: updates mutable columns but preserves
  *    chosen target columns (`first_seen_date`, `stock_key`) on match
  *    (build_stock_dimensions.py:88-102).
  *
  * Both are join-based plans exactly like Iceberg's
  * RewriteMergeIntoTable produces, committed through whichever
  * [[WarehouseWrites]] store is passed: [[TableStore]]'s staged swap
  * (destructive, single-writer) or [[VersionedTableStore]]'s snapshot
  * commit (time travel + rollback + optimistic concurrency).
  * Requirements: `source` is key-unique (guaranteed upstream by
  * the W1 dedup / rollup groupings); both sides share the key schema.
  *
  * Scale: the anti-join and full-outer join shuffle hash-partition on
  * the natural key -- the same key the tables are queried by -- and
  * AQE picks broadcast when the daily source is small relative to the
  * target, which is the reference's exact shape (5-row source vs
  * growing fact).
  */
object UpsertWriter {

  /** S7 update-all MERGE: matched target rows are replaced wholesale,
    * unmatched kept, new source rows inserted. Idempotent: re-merging
    * the same source is a no-op.
    *
    * For partitioned tables the merge only touches partitions the
    * source lands in: the anti-join is restricted to those partitions
    * (semi-join pre-filter = partition pruning on the target scan)
    * and the write uses dynamic partition overwrite, so a daily merge
    * into a years-deep table rewrites one day, not the table. This is
    * the scan/commit shape Iceberg's merge gives the reference. */
  def upsertAll(store: WarehouseWrites, table: String, source: DataFrame,
      keys: Seq[String], partitionBy: Seq[String] = Nil,
      allowSchemaEvolution: Boolean = false): Unit = {
    if (!store.exists(table)) {
      store.createOrReplace(source, table, partitionBy)
      return
    }
    val target = store.read(table)
    if (!allowSchemaEvolution)
      require(source.columns.toSeq.sorted == target.columns.toSeq.sorted,
        s"schema mismatch: target=${target.columns.toSeq} source=${source.columns.toSeq}" +
          " (pass allowSchemaEvolution=true to add new columns)")
    // schema evolution (Iceberg mergeSchema parity): source-only
    // columns are added to the table (null for untouched rows),
    // target-only columns survive (null for inserted rows) -- both
    // directions via allowMissingColumns
    def union(kept: DataFrame): DataFrame =
      kept.unionByName(source, allowMissingColumns = allowSchemaEvolution)
    // adding a column to a partitioned table forces a FULL staged
    // rewrite: dynamic partition overwrite would leave untouched
    // partitions' files on the old schema, and a plain parquet read
    // takes its schema from one file -- the new column would silently
    // vanish. (A metadata catalog like Iceberg avoids this rewrite;
    // a path-addressed store cannot.)
    val widens = allowSchemaEvolution &&
      source.columns.exists(c => !target.columns.contains(c))
    if (partitionBy.isEmpty || widens) {
      // using-columns joins move the keys to the front of the output;
      // re-select to keep the table's declared column order stable
      val kept = target.join(source.select(keys.map(col): _*), keys, "left_anti")
        .select(target.columns.map(col).toSeq: _*)
      store.swapIn(union(kept), table, partitionBy)
    } else {
      val touched = target
        .join(source.select(partitionBy.map(col): _*).distinct(), partitionBy, "left_semi")
      val kept = touched.join(source.select(keys.map(col): _*), keys, "left_anti")
        .select(target.columns.map(col).toSeq: _*)
      // materialize the (partition-local) merge result before writing:
      // Spark refuses to overwrite a path that is also an input, and
      // the touched subset is small by construction (the day's
      // partitions, not the table)
      val merged = union(kept).localCheckpoint(true)
      store.overwritePartitions(merged, table, partitionBy)
      merged.unpersist()
    }
  }

  /** S19 matched-DELETE MERGE -- the standard third MERGE clause:
    * {{{
    * WHEN MATCHED [AND <cond>] THEN DELETE
    * [WHEN NOT MATCHED THEN INSERT *]
    * }}}
    * Matched target rows for which `matchCondition` is TRUE (NULL and
    * FALSE both leave the row in place, per SQL MERGE clause-firing
    * semantics) are removed; unmatched target rows are kept; with
    * `insertUnmatched`, source rows matching no target key are
    * inserted. `matchCondition` is a Spark SQL boolean expression over
    * `targetAlias`.<col> / `sourceAlias`.<col> (None = unconditional
    * delete on match). Same requirement as the upserts: `source` is
    * key-unique.
    *
    * The plan is one left join on the natural key (AQE broadcasts the
    * typical small daily source) plus, for inserts, one anti join.
    * The commit is a FULL staged swap even for partitioned tables:
    * dynamic partition overwrite cannot express a partition whose
    * rows were ALL deleted (no output rows for the partition means
    * the old files survive), so a partition-local delete commit needs
    * delete manifests -- a metadata-store feature deliberately out of
    * scope. `partitionBy` is still honored for the rewritten layout. */
  def deleteMerge(store: WarehouseWrites, table: String, source: DataFrame,
      keys: Seq[String], matchCondition: Option[String] = None,
      insertUnmatched: Boolean = false,
      targetAlias: String = "t", sourceAlias: String = "s",
      partitionBy: Seq[String] = Nil): Unit = {
    if (!store.exists(table)) {
      // MERGE against a missing target: only the INSERT clause can
      // produce rows (nothing exists to match, so no deletes fire)
      if (insertUnmatched) store.createOrReplace(source, table, partitionBy)
      else throw new NoSuchElementException(
        s"deleteMerge target $table does not exist and no INSERT clause given")
      return
    }
    val target = store.read(table)
    if (insertUnmatched)
      require(source.columns.toSeq.sorted == target.columns.toSeq.sorted,
        s"schema mismatch: target=${target.columns.toSeq} source=${source.columns.toSeq}")
    val cond = matchCondition.map(expr).getOrElse(lit(true))
    val tA = target.alias(targetAlias)
    val sA = source.withColumn("__s", lit(true)).alias(sourceAlias)
    val joinCond = keys.map(k =>
      col(s"$targetAlias.$k") === col(s"$sourceAlias.$k")).reduce(_ && _)
    // clause fires only when cond IS TRUE: coalesce(false) keeps rows
    // whose condition evaluates NULL (e.g. a comparison on a NULL
    // source value), matching engine MERGE semantics
    val fires = coalesce(col(s"$sourceAlias.__s").isNotNull && cond, lit(false))
    val survivors = tA.join(sA, joinCond, "left_outer")
      .filter(!fires)
      .select(target.columns.toSeq.map(c => col(s"$targetAlias.$c").as(c)): _*)
    val result =
      if (!insertUnmatched) survivors
      else survivors.unionByName(
        source.join(target.select(keys.map(col): _*), keys, "left_anti")
          .select(target.columns.toSeq.map(col): _*))
    store.swapIn(result, table, partitionBy)
  }

  /** One WHEN MATCHED clause of a general MERGE, in statement order.
    * `cond` is a Spark SQL boolean over the statement's aliases (None
    * = unconditional). */
  sealed trait MatchedClause { def cond: Option[String] }
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  case class MatchedDelete(cond: Option[String]) extends MatchedClause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET ...; `assignments` maps
    * target column -> Spark SQL expression text (empty + all=true for
    * `SET *`). Unassigned columns keep their target values. */
  case class MatchedUpdate(cond: Option[String], all: Boolean,
      assignments: Seq[(String, String)]) extends MatchedClause

  /** The WHEN NOT MATCHED [AND cond] THEN INSERT clause. Empty
    * `columns` = `INSERT *` (schema-aligned source required); a
    * column list inserts each VALUES expression (Spark SQL over the
    * statement's aliases -- in practice the source alias; target
    * columns are all NULL on these rows) into its named target
    * column and leaves every other target column NULL, cast to the
    * target column type. */
  case class InsertSpec(cond: Option[String],
      columns: Seq[String] = Nil, values: Seq[String] = Nil) {
    require(columns.size == values.size,
      s"INSERT column list (${columns.size}) and VALUES (${values.size}) differ")
    def isStar: Boolean = columns.isEmpty
  }

  /** One WHEN NOT MATCHED BY SOURCE clause -- fires on TARGET rows
    * with no source match (the CDC full-sync side of MERGE: delete or
    * flag rows that vanished from the source). Same first-TRUE-wins
    * ordering among BY SOURCE clauses; source-alias references inside
    * `cond`/assignments see NULLs on these rows (a NULL condition
    * doesn't fire). */
  sealed trait BySourceClause { def cond: Option[String] }
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  case class BySourceDelete(cond: Option[String]) extends BySourceClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... */
  case class BySourceUpdate(cond: Option[String],
      assignments: Seq[(String, String)]) extends BySourceClause

  /** General MERGE executor: an ordered list of WHEN MATCHED clauses
    * (first TRUE condition wins per row, SQL clause-order semantics;
    * NULL conditions don't fire), an optional `WHEN NOT MATCHED
    * [AND cond] THEN INSERT { * | (cols) VALUES (exprs) }`, and an
    * ordered list of WHEN NOT MATCHED BY SOURCE clauses (own
    * first-TRUE-wins ordering; the three row populations -- matched,
    * source-only, target-only -- are disjoint, so the families never
    * interact). Subsumes the specialized paths -- [[upsertAll]] /
    * [[upsertSelective]] / [[deleteMerge]] remain the fast paths the
    * statement shim prefers; this executor exists for the mixed and
    * conditional statements they can't express (conditional update,
    * update+delete in one statement, expression assignments,
    * column-list inserts, BY SOURCE full-sync).
    *
    * One full-outer join on the natural key; every clause condition
    * and assignment expression evaluates under the statement's own
    * aliases. Full staged swap (see [[deleteMerge]] for why deletes
    * cannot ride dynamic partition overwrite). `source` must be
    * key-unique, as everywhere. */
  def runMerge(store: WarehouseWrites, table: String, source: DataFrame,
      keys: Seq[String], clauses: Seq[MatchedClause],
      insert: Option[InsertSpec],
      bySource: Seq[BySourceClause] = Nil,
      targetAlias: String = "t", sourceAlias: String = "s",
      partitionBy: Seq[String] = Nil): Unit = {
    require(clauses.nonEmpty || insert.nonEmpty || bySource.nonEmpty,
      "MERGE with no clauses")
    if (!store.exists(table)) {
      insert match {
        case Some(ins) if ins.isStar && ins.cond.isEmpty =>
          store.createOrReplace(source, table, partitionBy)
        case Some(_) => throw new NoSuchElementException(
          s"runMerge target $table does not exist; a conditional or" +
            " column-list INSERT needs the target schema")
        case None => throw new NoSuchElementException(
          s"runMerge target $table does not exist and no INSERT clause given")
      }
      return
    }
    val target = store.read(table)
    val needsFullSource = insert.exists(_.isStar) || clauses.exists {
      case MatchedUpdate(_, true, _) => true; case _ => false
    }
    if (needsFullSource)
      require(source.columns.toSeq.sorted == target.columns.toSeq.sorted,
        s"schema mismatch: target=${target.columns.toSeq} source=${source.columns.toSeq}")
    val cols = target.columns.toSeq
    // every named target column must exist -- a typo'd SET/INSERT
    // column would otherwise be silently ignored by the fold below
    def requireTargetCol(what: String, c: String): Unit =
      require(cols.exists(_.equalsIgnoreCase(c)),
        s"$what names `$c`, not a target column of $table (${cols.mkString(", ")})")
    clauses.foreach { case MatchedUpdate(_, false, assigns) =>
      assigns.foreach { case (tc, _) => requireTargetCol("SET", tc) }
      case _ => () }
    bySource.foreach { case BySourceUpdate(_, assigns) =>
      assigns.foreach { case (tc, _) => requireTargetCol("SET", tc) }
      case _ => () }
    insert.foreach(_.columns.foreach(requireTargetCol("INSERT column list", _)))
    val tA = target.withColumn("__t", lit(true)).alias(targetAlias)
    val sA = source.withColumn("__s", lit(true)).alias(sourceAlias)
    val joined = tA.join(sA,
      keys.map(k => col(s"$targetAlias.$k") === col(s"$sourceAlias.$k")).reduce(_ && _),
      "full_outer")
    val matched =
      col(s"$targetAlias.__t").isNotNull && col(s"$sourceAlias.__s").isNotNull
    val targetOnly =
      col(s"$targetAlias.__t").isNotNull && col(s"$sourceAlias.__s").isNull
    val sourceOnly =
      col(s"$targetAlias.__t").isNull && col(s"$sourceAlias.__s").isNotNull
    // fire flags, mutually exclusive by construction: clause i fires
    // iff matched, its condition is TRUE, and no earlier clause fired
    // (first-TRUE-wins, SQL clause-order semantics)
    def exclusive(owns: Seq[Column]): Seq[Column] =
      owns.zipWithIndex.map { case (own, i) =>
        owns.take(i).foldLeft(own)((acc, earlier) => acc && !earlier)
      }
    val fires = exclusive(clauses.map(c =>
      coalesce(matched && c.cond.map(expr).getOrElse(lit(true)), lit(false))))
    val bsFires = exclusive(bySource.map(c =>
      coalesce(targetOnly && c.cond.map(expr).getOrElse(lit(true)), lit(false))))
    val insFire = insert.map(ins =>
      coalesce(sourceOnly && ins.cond.map(expr).getOrElse(lit(true)), lit(false)))
    val deleted =
      (clauses.zip(fires).collect { case (MatchedDelete(_), f) => f } ++
        bySource.zip(bsFires).collect { case (BySourceDelete(_), f) => f })
        .reduceOption(_ || _).getOrElse(lit(false))
    val keep = !deleted &&
      (col(s"$targetAlias.__t").isNotNull || insFire.getOrElse(lit(false)))
    val out = joined.filter(keep).select(cols.map { c =>
      // base value: target rows keep t.c, pure-insert rows take the
      // INSERT value (s.c for `INSERT *`, the VALUES expression or
      // NULL for a column list). Without an INSERT clause every kept
      // row IS a target row (keep filters source-only rows), so the
      // base must not reference s.c at all -- a source narrower than
      // the target (SELECT of just the key + updated columns) is
      // valid in that shape.
      val base = insert match {
        case Some(ins) if ins.isStar =>
          when(col(s"$targetAlias.__t").isNotNull, col(s"$targetAlias.$c"))
            .otherwise(col(s"$sourceAlias.$c"))
        case Some(ins) =>
          val iv = ins.columns.zip(ins.values).collectFirst {
            case (ic, e) if ic.equalsIgnoreCase(c) => expr(e)
          }.getOrElse(lit(null)).cast(target.schema(c).dataType)
          when(col(s"$targetAlias.__t").isNotNull, col(s"$targetAlias.$c"))
            .otherwise(iv)
        case None => col(s"$targetAlias.$c")
      }
      val v = clauses.zip(fires).foldLeft(base) {
        case (acc, (MatchedUpdate(_, all, assigns), f)) =>
          val updated =
            if (all) col(s"$sourceAlias.$c")
            else assigns.collectFirst {
              case (tc, e) if tc.equalsIgnoreCase(c) => expr(e)
            }.getOrElse(col(s"$targetAlias.$c"))
          when(f, updated).otherwise(acc)
        case (acc, _) => acc
      }
      val v2 = bySource.zip(bsFires).foldLeft(v) {
        case (acc, (BySourceUpdate(_, assigns), f)) =>
          val updated = assigns.collectFirst {
            case (tc, e) if tc.equalsIgnoreCase(c) => expr(e)
          }.getOrElse(col(s"$targetAlias.$c"))
          when(f, updated).otherwise(acc)
        case (acc, _) => acc
      }
      v2.as(c)
    }: _*)
    store.swapIn(out, table, partitionBy)
  }

  /** S8 selective-update MERGE: matched rows take source values except
    * `preserve` columns (kept from target); unmatched target rows kept
    * as-is; unmatched source rows inserted (their own `preserve`
    * values). Null-correct via match markers, not coalesce -- a
    * legitimate NULL in the source must overwrite on match. */
  def upsertSelective(store: WarehouseWrites, table: String, source: DataFrame,
      keys: Seq[String], preserve: Seq[String],
      partitionBy: Seq[String] = Nil): Unit = {
    if (!store.exists(table)) {
      store.createOrReplace(source, table, partitionBy)
      return
    }
    val target = store.read(table)
    val cols = target.columns.toSeq
    require(source.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: target=$cols source=${source.columns.toSeq}")
    val t = target.withColumn("__t", lit(true)).as("t")
    val s = source.withColumn("__s", lit(true)).as("s")
    val joined = t.join(s, keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "full_outer")
    val matched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val fromS = col("s.__s").isNotNull
    val merged = joined.select(cols.map { c =>
      val pick =
        if (keys.contains(c)) when(fromS, col(s"s.$c")).otherwise(col(s"t.$c"))
        else if (preserve.contains(c)) when(matched, col(s"t.$c"))
          .otherwise(when(fromS, col(s"s.$c")).otherwise(col(s"t.$c")))
        else when(fromS, col(s"s.$c")).otherwise(col(s"t.$c"))
      pick.as(c)
    }: _*)
    store.swapIn(merged, table, partitionBy)
  }
}
