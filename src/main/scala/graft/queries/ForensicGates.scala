package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.ops.MultimodalOps
import graft.table.VersionedTableStore

/** GATE FISSION — per-statement sibling gates for the driver-red
  * family (`s29/s33/s34/s35/s36/s44` + the spectrogram), built so the
  * round-14 CORRECTNESS board reads as a BITMAP that names the
  * diverging statement instead of one boolean per multi-commit flow.
  *
  * Three rounds of forensics established (VERDICT r11–r13): the red
  * gates show `rows_match=true, hash_match=false` on the driver box
  * only — every local replica (builder + judge, isolated and
  * single-session) is value-exact, the r13 which-half guards proved
  * no state ASSERTION flips (rows stay green), and the judge's
  * tie-scan killed the decimal-rounding theory on this testdata. The
  * remaining instrument is decomposition:
  *
  *  - **statement-prefix siblings** (`sNNa/sNNb`): the SAME flow
  *    stopped after statement k, hashing that intermediate state.
  *    The first red sibling names the first diverging statement.
  *  - **BIGINT-only outputs everywhere** (`floor(x*100)` cent-sums,
  *    `value*1e6` micro-sums, both engines): numeric-semantics
  *    theories (rounding mode, sum scale, decimal rendering) die
  *    structurally — the siblings carry no non-integer column, so a
  *    red sibling is a ROW-SET divergence, full stop.
  *  - **version ledgers** (`sNNc/sNNd`): one row per LIVE main
  *    -lineage commit (ordinal renumbered 1..k — version NUMBERS may
  *    burn on CAS retries, the COUNT of live commits may not),
  *    aggregating the table AS OF each. A double-landed or lost
  *    commit flips `rows_match`; a per-state data diff flips the
  *    hash on exactly the ordinals at/after the diverging statement.
  *
  * Deliberate redundancy with the parent gates is the point: the
  * parents stay on the board (de-floated, same flows) so red/green
  * deltas between rounds stay comparable, while the siblings carve
  * each flow into driver-observable slices. PLANS.md r14 carries the
  * decode table.
  *
  * Scale note: every sibling re-runs its parent's statements against
  * its own temp store (flows are seconds at sf0.01 — takedown-sized
  * by construction). These are FORENSIC gates, not throughput paths;
  * the engine surfaces they exercise (catalog DML, WAP, MoR,
  * branches, hidden partitioning) carry their scale arguments on the
  * parent gates and in the store's own scaladoc.
  */
object ForensicGates {

  // ----------------------------------------------------------------
  // shared plumbing
  // ----------------------------------------------------------------

  /** orders projected to the red-family shape. */
  private def ordersYr(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_totalprice"),
      year(col("o_orderdate").cast("date")).as("order_yr"))

  /** Exact integer cents of a raw double price: the double multiply
    * is IEEE-identical in Spark and DuckDB, floor is exact, and the
    * BIGINT sum is order-invariant — immune to every decimal
    * rounding/scale/rendering semantic. */
  private def centsCol: Column =
    floor(col("o_totalprice") * lit(100.0)).cast("long")

  private val centsSqlDuck =
    "CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"

  private val srcCte =
    """src AS (
         SELECT o_orderkey, o_totalprice,
                CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_yr
         FROM orders)"""

  /** Catalog name derived from the root (the s28 convention: reruns
    * in one session never collide with a cached catalog instance). */
  private def registerCatalog(s: SparkSession, root: String): String = {
    val cat = "gq" + java.lang.Long.toHexString(
      org.apache.spark.unsafe.types.UTF8String.fromString(root).hashCode()
        .toLong & 0xffffffffL)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.table.catalog.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"graft-q-$tag").toString

  /** One-row-per-live-commit ledger over the MAIN lineage: ordinal
    * renumbered 1..k (version numbers burn on retries; the live
    * COUNT and each live STATE may not), each row aggregating the
    * table AS OF that commit with `agg`. The version enumeration is
    * metadata-sized (a commit-dir listing), never a data collect. */
  private def versionLedger(store: VersionedTableStore, name: String)(
      agg: DataFrame => DataFrame): DataFrame = {
    val vs = store.versions(name).sorted
    vs.zipWithIndex.map { case (v, i) =>
      agg(store.readVersion(name, v))
        .withColumn("ord", lit(i + 1).cast("int"))
    }.reduce(_.unionByName(_))
  }

  /** The orders-family ledger row: exact count + exact cent-sum. */
  private def ordersLedgerAgg(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).cast("long").as("n"),
      coalesce(sum(centsCol), lit(0L)).cast("long").as("cents"))

  /** Per-year BIGINT rollup of an orders-shaped frame. */
  private def yearRollup(df: DataFrame): DataFrame =
    df.groupBy(col("order_yr"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(centsCol).cast("long").as("cents"))

  private def yearRollupSql(liveWhere: String): String =
    s"""WITH $srcCte,
       live AS (SELECT * FROM src WHERE $liveWhere)
       SELECT order_yr, CAST(count(*) AS BIGINT) AS n,
              $centsSqlDuck AS cents
       FROM live GROUP BY order_yr"""

  /** One oracle ledger row: literal ordinal + aggregates of a WHERE
    * slice of src (empty slice = the coalesced zero row). */
  private def ledgerRowSql(ord: Int, where: String): String =
    s"""SELECT CAST($ord AS INT) AS ord, CAST(count(*) AS BIGINT) AS n,
        CAST(coalesce(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)), 0)
          AS BIGINT) AS cents
        FROM src WHERE $where"""

  // ----------------------------------------------------------------
  // s29 family: catalog SQL DML loop
  // (CREATE / INSERT<1999 / INSERT=2000 / DELETE yr=1996 /
  //  DELETE price<100k AND yr=1997)
  // ----------------------------------------------------------------

  /** S29a: state after the two INSERTs, before any DELETE. */
  def s29aInsertState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    o.createOrReplaceTempView("s29a_src")
    val root = tmpRoot("s29a")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ord
              (o_orderkey BIGINT, o_totalprice DOUBLE, order_yr INT)
              PARTITIONED BY (order_yr)""")
    s.sql(s"""INSERT INTO $cat.default.ord
              SELECT o_orderkey, o_totalprice, order_yr
              FROM s29a_src WHERE order_yr < 1999""")
    s.sql(s"""INSERT INTO $cat.default.ord
              SELECT o_orderkey, o_totalprice, order_yr
              FROM s29a_src WHERE order_yr = 2000""")
    s.sql(s"""SELECT order_yr, CAST(count(*) AS BIGINT) AS n,
                     $centsSqlSpark AS cents
              FROM $cat.default.ord GROUP BY order_yr""")
  }

  private val centsSqlSpark =
    "CAST(sum(CAST(floor(o_totalprice * 100.0D) AS BIGINT)) AS BIGINT)"

  val s29aInsertStateSql: String =
    yearRollupSql("order_yr < 1999 OR order_yr = 2000")

  /** S29b: state after the partition-predicate DELETE (yr=1996),
    * before the data-predicate DELETE. */
  def s29bDelete1State(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    o.createOrReplaceTempView("s29b_src")
    val root = tmpRoot("s29b")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ord
              (o_orderkey BIGINT, o_totalprice DOUBLE, order_yr INT)
              PARTITIONED BY (order_yr)""")
    s.sql(s"""INSERT INTO $cat.default.ord
              SELECT o_orderkey, o_totalprice, order_yr
              FROM s29b_src WHERE order_yr < 1999""")
    s.sql(s"""INSERT INTO $cat.default.ord
              SELECT o_orderkey, o_totalprice, order_yr
              FROM s29b_src WHERE order_yr = 2000""")
    s.sql(s"DELETE FROM $cat.default.ord WHERE order_yr = 1996")
    s.sql(s"""SELECT order_yr, CAST(count(*) AS BIGINT) AS n,
                     $centsSqlSpark AS cents
              FROM $cat.default.ord GROUP BY order_yr""")
  }

  val s29bDelete1StateSql: String =
    yearRollupSql(
      "(order_yr < 1999 OR order_yr = 2000) AND order_yr <> 1996")

  /** S29c: the full-flow version ledger — one row per live commit
    * (create-empty, insert1, insert2, delete1, delete2), each
    * aggregated via time travel. A burned-and-doubled or lost commit
    * flips rows_match; a per-state diff flips the hash on the
    * ordinals at/after the diverging statement. */
  def s29cLedger(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    o.createOrReplaceTempView("s29c_src")
    val root = tmpRoot("s29c")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ord
              (o_orderkey BIGINT, o_totalprice DOUBLE, order_yr INT)
              PARTITIONED BY (order_yr)""")
    s.sql(s"""INSERT INTO $cat.default.ord
              SELECT o_orderkey, o_totalprice, order_yr
              FROM s29c_src WHERE order_yr < 1999""")
    s.sql(s"""INSERT INTO $cat.default.ord
              SELECT o_orderkey, o_totalprice, order_yr
              FROM s29c_src WHERE order_yr = 2000""")
    s.sql(s"DELETE FROM $cat.default.ord WHERE order_yr = 1996")
    s.sql(s"""DELETE FROM $cat.default.ord
              WHERE o_totalprice < 100000.0D AND order_yr = 1997""")
    val store = new VersionedTableStore(s, root)
    versionLedger(store, "ord")(ordersLedgerAgg)
  }

  val s29cLedgerSql: String =
    s"""WITH $srcCte
       ${ledgerRowSql(1, "1 = 0")}
       UNION ALL ${ledgerRowSql(2, "order_yr < 1999")}
       UNION ALL ${ledgerRowSql(3, "order_yr < 1999 OR order_yr = 2000")}
       UNION ALL ${ledgerRowSql(4,
      "(order_yr < 1999 OR order_yr = 2000) AND order_yr <> 1996")}
       UNION ALL ${ledgerRowSql(5,
      """(order_yr < 1999 OR order_yr = 2000) AND order_yr <> 1996
         AND NOT (o_totalprice < 100000.0 AND order_yr = 1997)""")}"""

  // ----------------------------------------------------------------
  // s33 family: write-audit-publish
  // (commitFull <=1996 / publish 1997 / reject poisoned 1998)
  // ----------------------------------------------------------------

  private def s33Audit: DataFrame => Boolean = df =>
    graft.quality.Validator.run(df, Seq(
      graft.quality.NotNull("o_orderkey"),
      graft.quality.Unique(Seq("o_orderkey")),
      graft.quality.ValuesBetween("o_totalprice", 0.0, 1e7)))
      .forall(_.passed)

  /** S33a: the base commitFull alone — the statement every other
    * red store gate also starts from. */
  def s33aBaseState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s33a"))
    store.commitFull(o.filter(col("order_yr") <= 1996), "ord_w",
      Seq("order_yr"))
    yearRollup(store.read("ord_w"))
  }

  val s33aBaseStateSql: String = yearRollupSql("order_yr <= 1996")

  /** S33b: base + the CLEAN publish only (no poison leg) — isolates
    * writeAuditPublish's stage-validate-promote loop from the
    * rejected batch's stage-and-reclaim. */
  def s33bPublishState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s33b"))
    store.commitFull(o.filter(col("order_yr") <= 1996), "ord_w",
      Seq("order_yr"))
    val pub = store.writeAuditPublish(o.filter(col("order_yr") === 1997),
      "ord_w", "d1997", s33Audit, Seq("order_yr"), delta = true)
    // row-count guard (s29 discipline): verdict flip => empty result
    yearRollup(store.read("ord_w")).filter(lit(pub.isDefined))
  }

  val s33bPublishStateSql: String = yearRollupSql("order_yr <= 1997")

  /** S33c: full-flow ledger. The rejected 1998 batch must leave NO
    * live main commit — exactly two rows (base, publish), or
    * rows_match flips. */
  def s33cLedger(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s33c"))
    store.commitFull(o.filter(col("order_yr") <= 1996), "ord_w",
      Seq("order_yr"))
    store.writeAuditPublish(o.filter(col("order_yr") === 1997),
      "ord_w", "d1997", s33Audit, Seq("order_yr"), delta = true)
    val poisoned = o.filter(col("order_yr") === 1998)
      .withColumn("o_orderkey", when(col("o_totalprice") > lit(200000.0),
        lit(null)).otherwise(col("o_orderkey")))
    store.writeAuditPublish(poisoned, "ord_w", "d1998", s33Audit,
      Seq("order_yr"), delta = true)
    versionLedger(store, "ord_w")(ordersLedgerAgg)
  }

  val s33cLedgerSql: String =
    s"""WITH $srcCte
       ${ledgerRowSql(1, "order_yr <= 1996")}
       UNION ALL ${ledgerRowSql(2, "order_yr <= 1997")}"""

  // ----------------------------------------------------------------
  // s34 family: merge-on-read deletes + compact
  // (commitFull all / deleteKeys >400k / deleteKeys 100..150k /
  //  MoR read / compact / applied read)
  // ----------------------------------------------------------------

  private def s34Store(s: SparkSession, dir: String, tag: String,
      secondKeys: Boolean): (VersionedTableStore, String, DataFrame) = {
    val o = ordersYr(s, dir)
    val root = tmpRoot(tag)
    val store = new VersionedTableStore(s, root)
    store.commitFull(o, "ord_m", Seq("order_yr"))
    store.deleteKeys("ord_m",
      o.filter(col("o_totalprice") > lit(400000.0)).select("o_orderkey"),
      Seq("o_orderkey"))
    if (secondKeys)
      store.deleteKeys("ord_m",
        o.filter(col("o_totalprice").between(100000.0, 150000.0))
          .select("o_orderkey"),
        Seq("o_orderkey"))
    (store, root, o)
  }

  /** S34a: both key sets registered, MoR read only — no compact. */
  def s34aMorState(s: SparkSession, dir: String): DataFrame = {
    val (store, _, _) = s34Store(s, dir, "s34a", secondKeys = true)
    yearRollup(store.read("ord_m"))
  }

  val s34aMorStateSql: String = yearRollupSql(
    """NOT (o_totalprice > 400000.0)
       AND NOT (o_totalprice BETWEEN 100000.0 AND 150000.0)""")

  /** S34b: FIRST key set only, MoR read — names which key batch
    * diverges if s34a is red. */
  def s34bKey1State(s: SparkSession, dir: String): DataFrame = {
    val (store, _, _) = s34Store(s, dir, "s34b", secondKeys = false)
    yearRollup(store.read("ord_m"))
  }

  val s34bKey1StateSql: String =
    yearRollupSql("NOT (o_totalprice > 400000.0)")

  /** S34c: full flow, POST-compact read only — isolates the physical
    * apply from the MoR anti-join path (parent s34 hashes both). */
  def s34cAppliedState(s: SparkSession, dir: String): DataFrame = {
    val (store, _, _) = s34Store(s, dir, "s34c", secondKeys = true)
    store.compact("ord_m")
    yearRollup(store.read("ord_m"))
  }

  val s34cAppliedStateSql: String = s34aMorStateSql

  /** S34d: full-flow ledger — full, minus keys1, minus keys1+2,
    * compacted (data-identical to ord 3). Four rows exactly: a
    * double-landed key set or a lost compact flips rows_match. */
  def s34dLedger(s: SparkSession, dir: String): DataFrame = {
    val (store, _, _) = s34Store(s, dir, "s34d", secondKeys = true)
    store.compact("ord_m")
    versionLedger(store, "ord_m")(ordersLedgerAgg)
  }

  val s34dLedgerSql: String = {
    val afterK1 = "NOT (o_totalprice > 400000.0)"
    val afterK2 =
      """NOT (o_totalprice > 400000.0)
         AND NOT (o_totalprice BETWEEN 100000.0 AND 150000.0)"""
    s"""WITH $srcCte
       ${ledgerRowSql(1, "1 = 1")}
       UNION ALL ${ledgerRowSql(2, afterK1)}
       UNION ALL ${ledgerRowSql(3, afterK2)}
       UNION ALL ${ledgerRowSql(4, afterK2)}"""
  }

  // ----------------------------------------------------------------
  // s35 family: branch / merge
  // ----------------------------------------------------------------

  /** S35a: the BRANCH head after its two commits (1995 takedown
    * rewrite + 1997 append), read through the catalog's named-ref
    * time travel — no main rewrite, no merge. */
  def s35aBranchState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val root = tmpRoot("s35a")
    val store = new VersionedTableStore(s, root)
    store.commitFull(o.filter(col("order_yr") <= 1996), "ord_b",
      Seq("order_yr"))
    store.createBranch("ord_b", "etl")
    store.commitPartitions(
      o.filter(col("order_yr") === 1995 &&
        col("o_totalprice") <= lit(200000.0)),
      "ord_b", Seq("order_yr"), branch = "etl")
    store.commitPartitions(o.filter(col("order_yr") === 1997),
      "ord_b", Seq("order_yr"), branch = "etl")
    val cat = registerCatalog(s, root)
    s.sql(s"""SELECT order_yr, CAST(count(*) AS BIGINT) AS n,
                     $centsSqlSpark AS cents
              FROM $cat.default.ord_b VERSION AS OF 'etl'
              GROUP BY order_yr""")
  }

  val s35aBranchStateSql: String = yearRollupSql(
    """(order_yr = 1995 AND o_totalprice <= 200000.0)
       OR order_yr = 1996 OR order_yr = 1997""")

  /** S35b: MAIN after its independent 1996 rewrite, before the
    * merge — the branch's commits must be invisible here (their
    * visibility WOULD flip this hash, which is the point). */
  def s35bMainState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s35b"))
    store.commitFull(o.filter(col("order_yr") <= 1996), "ord_b",
      Seq("order_yr"))
    store.createBranch("ord_b", "etl")
    store.commitPartitions(
      o.filter(col("order_yr") === 1995 &&
        col("o_totalprice") <= lit(200000.0)),
      "ord_b", Seq("order_yr"), branch = "etl")
    store.commitPartitions(o.filter(col("order_yr") === 1997),
      "ord_b", Seq("order_yr"), branch = "etl")
    store.commitPartitions(
      o.filter(col("order_yr") === 1996 &&
        col("o_totalprice") <= lit(300000.0)),
      "ord_b", Seq("order_yr"))
    yearRollup(store.read("ord_b"))
  }

  val s35bMainStateSql: String = yearRollupSql(
    """order_yr = 1995
       OR (order_yr = 1996 AND o_totalprice <= 300000.0)""")

  /** S35c: full-flow ledger over the MAIN lineage (branch commits
    * never serve main): base, 1996 rewrite, merge. */
  def s35cLedger(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s35c"))
    store.commitFull(o.filter(col("order_yr") <= 1996), "ord_b",
      Seq("order_yr"))
    store.createBranch("ord_b", "etl")
    store.commitPartitions(
      o.filter(col("order_yr") === 1995 &&
        col("o_totalprice") <= lit(200000.0)),
      "ord_b", Seq("order_yr"), branch = "etl")
    store.commitPartitions(o.filter(col("order_yr") === 1997),
      "ord_b", Seq("order_yr"), branch = "etl")
    store.commitPartitions(
      o.filter(col("order_yr") === 1996 &&
        col("o_totalprice") <= lit(300000.0)),
      "ord_b", Seq("order_yr"))
    store.mergeBranch("ord_b", "etl")
    store.dropBranch("ord_b", "etl")
    versionLedger(store, "ord_b")(ordersLedgerAgg)
  }

  val s35cLedgerSql: String =
    s"""WITH $srcCte
       ${ledgerRowSql(1, "order_yr <= 1996")}
       UNION ALL ${ledgerRowSql(2,
      "order_yr = 1995 OR (order_yr = 1996 AND o_totalprice <= 300000.0)")}
       UNION ALL ${ledgerRowSql(3,
      """(order_yr = 1995 AND o_totalprice <= 200000.0)
         OR (order_yr = 1996 AND o_totalprice <= 300000.0)
         OR order_yr = 1997""")}"""

  // ----------------------------------------------------------------
  // s36 family: branch-scoped row-level DML
  // ----------------------------------------------------------------

  private def s36BranchDmls(o: DataFrame,
      store: VersionedTableStore): Unit = {
    store.commitFull(o.filter(col("order_yr") <= 1997), "ord_d",
      Seq("order_yr"))
    store.createBranch("ord_d", "fix")
    store.deleteWhereOn("ord_d", "fix",
      col("order_yr") === 1996 && col("o_totalprice") > lit(300000.0))
    store.updateWhereOn("ord_d", "fix",
      col("order_yr") === 1995 && col("o_totalprice") < lit(50000.0),
      Map("o_totalprice" -> (col("o_totalprice") + lit(1000.0))))
  }

  /** The branch-side algebra: 1996 cut at 300k, 1995 under-50k rows
    * re-priced +1000 (exact double add: the integer shift leaves the
    * fraction bits untouched, so the cent floor is tie-stable). */
  private val s36BranchWhere =
    """order_yr <= 1997
       AND NOT (order_yr = 1996 AND o_totalprice > 300000.0)"""

  private val s36CentsCase =
    """CASE WHEN order_yr = 1995 AND o_totalprice < 50000.0
            THEN o_totalprice + 1000.0 ELSE o_totalprice END"""

  /** S36a: the BRANCH head right after its two DMLs. */
  def s36aBranchState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val root = tmpRoot("s36a")
    val store = new VersionedTableStore(s, root)
    s36BranchDmls(o, store)
    val cat = registerCatalog(s, root)
    s.sql(s"""SELECT order_yr, CAST(count(*) AS BIGINT) AS n,
                     $centsSqlSpark AS cents
              FROM $cat.default.ord_d VERSION AS OF 'fix'
              GROUP BY order_yr""")
  }

  val s36aBranchStateSql: String =
    s"""WITH $srcCte,
       live AS (SELECT order_yr, $s36CentsCase AS o_totalprice
                FROM src WHERE $s36BranchWhere)
       SELECT order_yr, CAST(count(*) AS BIGINT) AS n,
              $centsSqlDuck AS cents
       FROM live GROUP BY order_yr"""

  /** S36b: MAIN after its independent 1998 append, pre-merge — the
    * branch DML must be invisible (visibility flips this hash). */
  def s36bMainState(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s36b"))
    s36BranchDmls(o, store)
    store.commitPartitions(o.filter(col("order_yr") === 1998),
      "ord_d", Seq("order_yr"))
    yearRollup(store.read("ord_d"))
  }

  val s36bMainStateSql: String = yearRollupSql("order_yr <= 1998")

  /** S36c: full-flow MAIN ledger: base, 1998 append, merge. */
  def s36cLedger(s: SparkSession, dir: String): DataFrame = {
    val o = ordersYr(s, dir)
    val store = new VersionedTableStore(s, tmpRoot("s36c"))
    s36BranchDmls(o, store)
    store.commitPartitions(o.filter(col("order_yr") === 1998),
      "ord_d", Seq("order_yr"))
    store.mergeBranch("ord_d", "fix")
    store.dropBranch("ord_d", "fix")
    versionLedger(store, "ord_d")(ordersLedgerAgg)
  }

  val s36cLedgerSql: String = {
    val mergedCents =
      s"""SELECT CAST(3 AS INT) AS ord, CAST(count(*) AS BIGINT) AS n,
          CAST(coalesce(sum(CAST(floor(p * 100.0) AS BIGINT)), 0)
            AS BIGINT) AS cents
          FROM (SELECT $s36CentsCase AS p FROM src WHERE $s36BranchWhere
                UNION ALL
                SELECT o_totalprice FROM src WHERE order_yr = 1998)"""
    s"""WITH $srcCte
       ${ledgerRowSql(1, "order_yr <= 1997")}
       UNION ALL ${ledgerRowSql(2, "order_yr <= 1998")}
       UNION ALL $mergedCents"""
  }

  // ----------------------------------------------------------------
  // s44 family: row-level SQL DML through hidden partitioning
  // (CREATE days(ts) / INSERT / DELETE user%97=3 / UPDATE redact)
  // ----------------------------------------------------------------

  private def eventsSrc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value").cast(DecimalType(18, 6)).as("value"))

  /** Exact integer micros of the table's DECIMAL(18,6) value column:
    * the product is integer-valued by construction, so truncation
    * and rounding casts agree in both engines. */
  private val microsSqlSpark =
    "CAST(sum(CAST(value * 1000000 AS BIGINT)) AS BIGINT)"
  private val microsSqlDuck =
    "CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)"

  private def s44Create(s: SparkSession, tag: String,
      view: String): (String, String) = {
    val root = tmpRoot(tag)
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ev
              (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
               event_type STRING, value DECIMAL(18,6))
              PARTITIONED BY (days(ts))""")
    s.sql(s"INSERT INTO $cat.default.ev SELECT * FROM $view")
    (root, cat)
  }

  private def s44Rollup(s: SparkSession, cat: String): DataFrame =
    s.sql(
      s"""SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS users,
                 $microsSqlSpark AS val_micros
          FROM $cat.default.ev
          GROUP BY CAST(ts AS DATE), event_type""")

  private def s44RollupSql(where: String): String =
    s"""WITH e AS (
         SELECT event_id, ts, user_id, event_type,
                CAST(value AS DECIMAL(18,6)) AS value
         FROM events)
       SELECT CAST(ts AS DATE) AS day, event_type,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT user_id) AS BIGINT) AS users,
              $microsSqlDuck AS val_micros
       FROM e WHERE $where GROUP BY CAST(ts AS DATE), event_type"""

  /** S44a: state right after the INSERT through the days(ts)
    * transform — before any DML. The first data-carrying driver gate
    * of the hidden-partition WRITE path alone (s43's date range
    * matched zero source rows — vacuously green; see s43b). */
  def s44aInsertState(s: SparkSession, dir: String): DataFrame = {
    eventsSrc(s, dir).createOrReplaceTempView("s44a_src")
    val (_, cat) = s44Create(s, "s44a", "s44a_src")
    s44Rollup(s, cat)
  }

  val s44aInsertStateSql: String = s44RollupSql("1 = 1")

  /** S44b: + the non-translatable DELETE (group-based rewrite through
    * the transform layout), before the UPDATE. */
  def s44bDeleteState(s: SparkSession, dir: String): DataFrame = {
    eventsSrc(s, dir).createOrReplaceTempView("s44b_src")
    val (_, cat) = s44Create(s, "s44b", "s44b_src")
    s.sql(s"DELETE FROM $cat.default.ev WHERE user_id % 97 = 3")
    s44Rollup(s, cat)
  }

  val s44bDeleteStateSql: String = s44RollupSql("user_id % 97 <> 3")

  /** S44c: full-flow ledger: create-empty, insert, delete, update —
    * one BIGINT row per live commit via store time travel. */
  def s44cLedger(s: SparkSession, dir: String): DataFrame = {
    eventsSrc(s, dir).createOrReplaceTempView("s44c_src")
    val (root, cat) = s44Create(s, "s44c", "s44c_src")
    s.sql(s"DELETE FROM $cat.default.ev WHERE user_id % 97 = 3")
    s.sql(s"""UPDATE $cat.default.ev SET event_type = 'redacted'
              WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'""")
    val store = new VersionedTableStore(s, root)
    versionLedger(store, "ev")(df => df.agg(
      count(lit(1)).cast("long").as("n"),
      countDistinct(col("user_id")).cast("long").as("users"),
      coalesce(sum((col("value") * lit(1000000)).cast("long")), lit(0L))
        .cast("long").as("val_micros")))
  }

  val s44cLedgerSql: String = {
    def row(ord: Int, where: String): String =
      s"""SELECT CAST($ord AS INT) AS ord, CAST(count(*) AS BIGINT) AS n,
          CAST(count(DISTINCT user_id) AS BIGINT) AS users,
          CAST(coalesce(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
            AS BIGINT)), 0) AS BIGINT) AS val_micros
          FROM events WHERE $where"""
    s"""${row(1, "1 = 0")}
       UNION ALL ${row(2, "1 = 1")}
       UNION ALL ${row(3, "user_id % 97 <> 3")}
       UNION ALL ${row(4, "user_id % 97 <> 3")}"""
  }

  /** S44d: the parent's exact statement flow on a BIGINT-micros
    * table — the decimal column never exists, so if the s44 family
    * stays red while THIS greens, the divergence is the
    * double→DECIMAL(18,6) cast at insert; if both red, it is the
    * transform-DML row set itself. */
  def s44dMicrosTable(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      floor(col("value") * lit(1000000.0)).cast("long").as("micros"))
      .createOrReplaceTempView("s44d_src")
    val root = tmpRoot("s44d")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ev
              (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
               event_type STRING, micros BIGINT)
              PARTITIONED BY (days(ts))""")
    s.sql(s"INSERT INTO $cat.default.ev SELECT * FROM s44d_src")
    s.sql(s"DELETE FROM $cat.default.ev WHERE user_id % 97 = 3")
    s.sql(s"""UPDATE $cat.default.ev SET event_type = 'redacted'
              WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'""")
    s.sql(
      s"""SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS users,
                 CAST(sum(micros) AS BIGINT) AS val_micros
          FROM $cat.default.ev
          GROUP BY CAST(ts AS DATE), event_type""")
  }

  val s44dMicrosTableSql: String =
    """WITH e AS (
         SELECT ts, user_id,
                CAST(floor(value * 1000000.0) AS BIGINT) AS micros,
                event_type
         FROM events WHERE user_id % 97 <> 3),
       upd AS (
         SELECT CAST(ts AS DATE) AS day, user_id, micros,
                CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00'
                     THEN 'redacted' ELSE event_type END AS event_type
         FROM e)
       SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT user_id) AS BIGINT) AS users,
              CAST(sum(micros) AS BIGINT) AS val_micros
       FROM upd GROUP BY day, event_type"""

  /** S43b: the s43 hidden-partition INSERT shape pointed at dates the
    * source actually has — s43's 1992 predicates match ZERO rows of
    * the driver's 1995–2001 orders, so it has been vacuously green
    * (0 = 0) since it shipped. s43 stays untouched (green gates are
    * never restructured); THIS gate carries rows through the
    * days(odt) write + stat-pruned read path. */
  def s43bHiddenData(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"),
      floor(col("o_totalprice")).cast("long").as("amt"),
      col("o_orderdate").cast("timestamp").as("odt"))
    o.createOrReplaceTempView("s43b_src")
    val root = tmpRoot("s43b")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ev
              (o_orderkey BIGINT, amt BIGINT, odt TIMESTAMP)
              PARTITIONED BY (days(odt))""")
    s.sql(s"""INSERT INTO $cat.default.ev
              SELECT o_orderkey, amt, odt FROM s43b_src
              WHERE odt < TIMESTAMP '1995-04-01 00:00:00'""")
    s.sql(s"""INSERT INTO $cat.default.ev
              SELECT o_orderkey, amt, odt FROM s43b_src
              WHERE odt >= TIMESTAMP '1995-04-01 00:00:00'
                AND odt < TIMESTAMP '1995-07-01 00:00:00'""")
    s.sql(
      s"""SELECT CAST(month(odt) AS INT) AS mon,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(amt) AS BIGINT) AS total
          FROM $cat.default.ev
          WHERE odt >= TIMESTAMP '1995-02-01 00:00:00'
            AND odt < TIMESTAMP '1995-06-01 00:00:00'
          GROUP BY month(odt)""")
  }

  val s43bHiddenDataSql: String =
    """WITH src AS (
         SELECT CAST(floor(o_totalprice) AS BIGINT) AS amt,
                CAST(o_orderdate AS DATE) AS od
         FROM orders)
       SELECT CAST(month(od) AS INT) AS mon,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(amt) AS BIGINT) AS total
       FROM src
       WHERE od >= DATE '1995-02-01' AND od < DATE '1995-06-01'
       GROUP BY month(od)"""

  // ----------------------------------------------------------------
  // spectrogram triangulation
  // ----------------------------------------------------------------

  /** The storeless pure-SQL twin of mm_audio_spectrogram: the SAME
    * closed-form samples and quantized-basis DFT, expressed entirely
    * as declarative Spark (sequence/explode + a broadcast basis join)
    * — no WAV codec, no mapPartitions. Same oracle text as the
    * original. If this greens on the driver while the original stays
    * red, the divergence lives in the codec/mapPartitions leg; if
    * both red, it is compare-side. (r14 verdict: both WERE red while
    * the words sibling was green — compare-side DECIMAL(38,0)
    * rendering — so since r15 this twin, like the parent, emits the
    * hi/lo BIGINT word representation.) */
  def spectrogramSqlTwin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val basis = MultimodalOps.SpecCosQ.indices
      .map(i => (i, MultimodalOps.SpecCosQ(i), MultimodalOps.SpecSinQ(i)))
      .toDF("idx", "cos_q", "sin_q")
    val bins = MultimodalOps.SpecBins.toDF("bin")
    val w = MultimodalOps.SpecFrame
    val sums = Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("ns", (lit(800L) + col("doc_id") % 400L).cast("int"))
      .withColumn("t", explode(sequence(lit(0), col("ns") - 1)))
      .filter(col("t") < col("ns") - col("ns") % w)
      .withColumn("smp",
        ((col("doc_id") % MultimodalOps.PxDocMod) * 31 +
          col("t") * 17) % 65536 - 32768)
      .withColumn("f", expr(s"t div $w"))
      .withColumn("j", col("t") % w)
      .crossJoin(broadcast(bins))
      .join(broadcast(basis),
        (col("bin") * col("j")) % w === col("idx"))
      .groupBy(col("doc_id"), col("f"), col("bin"))
      .agg(sum(col("smp") * col("cos_q")).as("re_q"),
        (-sum(col("smp") * col("sin_q"))).as("im_q"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    MultimodalOps.powerToWords(
      sums.groupBy(col("doc_id"), col("bin"))
        .agg(count(lit(1)).cast("int").as("n_frames"),
          sum(dec(col("re_q")) * col("re_q") + dec(col("im_q")) * col("im_q"))
            .cast("decimal(38,0)").as("power_sum")))
  }

  val spectrogramSqlTwinSql: String = MultimodalOps.audioSpectrogramWordsSql

  /** The hi/lo word split of the ORIGINAL codec-path spectrogram:
    * power_sum decomposed as two exact BIGINTs (base 1e18), so any
    * HUGEINT↔DECIMAL(38,0) conversion or rendering drift on the
    * compare side is structurally out of the loop. This sibling was
    * the gate that proved the r14 reds were compare-side (it came
    * back GREEN carrying the identical computation); since r15 the
    * parent `mm_audio_spectrogram` ships the same words form, so the
    * two are now byte-identical by construction — this row is the
    * confirmation twin, scheduled for retirement in r16 alongside
    * the statement-prefix siblings once the parents hold green. */
  def spectrogramWords(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.audioSpectrogram(s, dir)

  val spectrogramWordsSql: String = MultimodalOps.audioSpectrogramWordsSql

  // ----------------------------------------------------------------
  // s46/s47: transform-layout composition (VERDICT r13 #4)
  // ----------------------------------------------------------------

  /** S46: merge-on-read deletes + compact THROUGH hidden partitioning
    * — the r13 composition specs (HiddenPartitionSpec) under the hash
    * gate. Two key-set takedowns land on a days(ts) table with zero
    * data rewrite; the per-day rollup reads through the catalog (MoR
    * anti-join on the transform layout), compact applies the keys
    * physically, and the SAME rollup re-runs — both states hashed,
    * BIGINT-only columns. At 100 TB: a takedown costs one key-set
    * write; compact rewrites only dirs that still hold matches. */
  def s46TransformMor(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      floor(col("value") * lit(1000000.0)).cast("long").as("micros"))
    e.createOrReplaceTempView("s46_src")
    val root = tmpRoot("s46")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ev46
              (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
               event_type STRING, micros BIGINT)
              PARTITIONED BY (days(ts))""")
    s.sql(s"INSERT INTO $cat.default.ev46 SELECT * FROM s46_src")
    val store = new VersionedTableStore(s, root)
    store.deleteKeys("ev46",
      e.filter(col("user_id") % 113 === 7).select("event_id"),
      Seq("event_id"))
    store.deleteKeys("ev46",
      e.filter(col("micros") > lit(400000000L)).select("event_id"),
      Seq("event_id"))
    def rollup(): DataFrame = s.sql(
      s"""SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(micros) AS BIGINT) AS total
          FROM $cat.default.ev46 GROUP BY CAST(ts AS DATE)""")
    val pendingBefore = store.pendingDeletes("ev46").size
    val mor = rollup().localCheckpoint(true)
    store.compact("ev46")
    val applied = rollup()
    val pendingAfter = store.pendingDeletes("ev46").size
    mor.withColumn("state", lit("mor"))
      .unionByName(applied.withColumn("state", lit("applied")))
      // row-count guard (s29 discipline): assertion flip => empty
      .filter(lit(pendingBefore >= 2 && pendingAfter == 0))
  }

  val s46TransformMorSql: String =
    """WITH e AS (
         SELECT CAST(ts AS DATE) AS day, user_id,
                CAST(floor(value * 1000000.0) AS BIGINT) AS micros
         FROM events),
       live AS (
         SELECT * FROM e
         WHERE user_id % 113 <> 7 AND micros <= 400000000),
       roll AS (
         SELECT day, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(micros) AS BIGINT) AS total
         FROM live GROUP BY day)
       SELECT day, n, total, s.state
       FROM roll CROSS JOIN (VALUES ('mor'), ('applied')) s(state)"""

  /** S47: the CHANGE FEED over hidden-partition row-level DML — the
    * s44 statement flow replayed as a bounded `graft-changes` read
    * from the post-insert version to the head: net deletes for the
    * purged user rows, net updates (with exact pre-images) for the
    * redacted window. Version bounds come from the live store head
    * AFTER each statement (never literals — CAS retries burn
    * numbers). Scale: the diff prunes unchanged day dirs via the
    * shared-dir manifest compare, so the feed costs the touched
    * partitions only. */
  def s47TransformChanges(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      floor(col("value") * lit(1000000.0)).cast("long").as("micros"))
    e.createOrReplaceTempView("s47_src")
    val root = tmpRoot("s47")
    val cat = registerCatalog(s, root)
    s.sql(s"""CREATE TABLE $cat.default.ev47
              (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
               event_type STRING, micros BIGINT)
              PARTITIONED BY (days(ts))""")
    s.sql(s"INSERT INTO $cat.default.ev47 SELECT * FROM s47_src")
    val store = new VersionedTableStore(s, root)
    val vIns = store.currentVersion("ev47")
    s.sql(s"DELETE FROM $cat.default.ev47 WHERE user_id % 97 = 3")
    s.sql(s"""UPDATE $cat.default.ev47 SET event_type = 'redacted'
              WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'""")
    val vHead = store.currentVersion("ev47")
    s.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW s47_changes
          USING `graft-changes`
          OPTIONS (root '$root', table 'ev47', keys 'event_id',
                   includePre 'true', fromVersion '$vIns',
                   toVersion '$vHead')""")
    s.sql(
      """SELECT change_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(micros) AS BIGINT) AS post_micros,
               CAST(count(DISTINCT user_id) AS BIGINT) AS users
         FROM s47_changes GROUP BY change_type""")
  }

  val s47TransformChangesSql: String =
    """WITH e AS (
         SELECT event_id, ts, user_id, event_type,
                CAST(floor(value * 1000000.0) AS BIGINT) AS micros
         FROM events),
       changes AS (
         -- deletes carry their last-known values in the post columns
         SELECT 'delete' AS change_type, user_id, micros
         FROM e WHERE user_id % 97 = 3
         UNION ALL
         SELECT 'update', user_id, micros
         FROM e
         WHERE user_id % 97 <> 3
           AND ts >= TIMESTAMP '2024-01-25 00:00:00'
           AND event_type <> 'redacted')
       SELECT change_type, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(micros) AS BIGINT) AS post_micros,
              CAST(count(DISTINCT user_id) AS BIGINT) AS users
       FROM changes GROUP BY change_type"""

  // ----------------------------------------------------------------
  // session invariants echo
  // ----------------------------------------------------------------

  /** The session confs every cross-engine gate DEPENDS on, echoed as
    * data: the whole oracle-parity design assumes the suite runs
    * under Sessions' pinned UTC zone, nanos-as-long events reads, and
    * Spark 4's ANSI default. Locally that is true by construction;
    * on the driver box it is an ASSUMPTION — this gate turns it into
    * a read. A red row here would re-scope the red-family forensics
    * from engine internals to harness configuration in one glance.
    * (JVM-default zone / locale / charset are echoed through the
    * bench JSON's `env` block instead — they are not contracts, so
    * they must not cost a correctness row.) */
  def diagSessionInvariants(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // getOption, not get(key, fallback): the fallback string is
    // type-validated, so a non-boolean "unset" placeholder would
    // CRASH the gate on an unconfigured harness instead of reporting
    // the divergence as a red row. ANSI defaults true in Spark 4, so
    // an unset conf satisfies the contract.
    def opt(k: String, dflt: String): String =
      s.conf.getOption(k).getOrElse(dflt)
    Seq(
      ("session_tz", s.conf.get("spark.sql.session.timeZone")),
      ("nanos_as_long",
        opt("spark.sql.legacy.parquet.nanosAsLong", "unset")),
      ("ansi", opt("spark.sql.ansi.enabled", "true")),
      ("fieldid_read",
        opt("spark.sql.parquet.fieldId.read.enabled", "unset")))
      .toDF("invariant", "value")
  }

  val diagSessionInvariantsSql: String =
    """SELECT * FROM (VALUES
         ('session_tz', 'UTC'),
         ('nanos_as_long', 'true'),
         ('ansi', 'true'),
         ('fieldid_read', 'true')) v(invariant, value)"""

  // ----------------------------------------------------------------
  // registration
  // ----------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s29a_insert_state" -> (s29aInsertState _),
    "s29b_delete1_state" -> (s29bDelete1State _),
    "s29c_ledger" -> (s29cLedger _),
    "s33a_base_state" -> (s33aBaseState _),
    "s33b_publish_state" -> (s33bPublishState _),
    "s33c_ledger" -> (s33cLedger _),
    "s34a_mor_state" -> (s34aMorState _),
    "s34b_key1_state" -> (s34bKey1State _),
    "s34c_applied_state" -> (s34cAppliedState _),
    "s34d_ledger" -> (s34dLedger _),
    "s35a_branch_state" -> (s35aBranchState _),
    "s35b_main_state" -> (s35bMainState _),
    "s35c_ledger" -> (s35cLedger _),
    "s36a_branch_state" -> (s36aBranchState _),
    "s36b_main_state" -> (s36bMainState _),
    "s36c_ledger" -> (s36cLedger _),
    "s43b_hidden_data" -> (s43bHiddenData _),
    "s44a_insert_state" -> (s44aInsertState _),
    "s44b_delete_state" -> (s44bDeleteState _),
    "s44c_ledger" -> (s44cLedger _),
    "s44d_micros_table" -> (s44dMicrosTable _),
    "s46_transform_mor" -> (s46TransformMor _),
    "s47_transform_changes" -> (s47TransformChanges _),
    "mm_audio_spectrogram_sqltwin" -> (spectrogramSqlTwin _),
    "mm_audio_spectrogram_words" -> (spectrogramWords _),
    "diag_session_invariants" -> (diagSessionInvariants _))

  val oracleSql: Map[String, String] = Map(
    "s29a_insert_state" -> s29aInsertStateSql,
    "s29b_delete1_state" -> s29bDelete1StateSql,
    "s29c_ledger" -> s29cLedgerSql,
    "s33a_base_state" -> s33aBaseStateSql,
    "s33b_publish_state" -> s33bPublishStateSql,
    "s33c_ledger" -> s33cLedgerSql,
    "s34a_mor_state" -> s34aMorStateSql,
    "s34b_key1_state" -> s34bKey1StateSql,
    "s34c_applied_state" -> s34cAppliedStateSql,
    "s34d_ledger" -> s34dLedgerSql,
    "s35a_branch_state" -> s35aBranchStateSql,
    "s35b_main_state" -> s35bMainStateSql,
    "s35c_ledger" -> s35cLedgerSql,
    "s36a_branch_state" -> s36aBranchStateSql,
    "s36b_main_state" -> s36bMainStateSql,
    "s36c_ledger" -> s36cLedgerSql,
    "s43b_hidden_data" -> s43bHiddenDataSql,
    "s44a_insert_state" -> s44aInsertStateSql,
    "s44b_delete_state" -> s44bDeleteStateSql,
    "s44c_ledger" -> s44cLedgerSql,
    "s44d_micros_table" -> s44dMicrosTableSql,
    "s46_transform_mor" -> s46TransformMorSql,
    "s47_transform_changes" -> s47TransformChangesSql,
    "mm_audio_spectrogram_sqltwin" -> spectrogramSqlTwinSql,
    "mm_audio_spectrogram_words" -> spectrogramWordsSql,
    "diag_session_invariants" -> diagSessionInvariantsSql)
}
