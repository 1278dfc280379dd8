package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SQL-text MERGE shim must accept the reference's statements
  * VERBATIM (build_stock_fact_table.py:104-111 update-all;
  * build_stock_dimensions.py:88-102 selective) and produce results
  * identical to the UpsertWriter API path. */
class MergeSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new TableStore(spark,
    Files.createTempDirectory("graft-mergesql").toString)

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
  }

  test("reference update-all MERGE verbatim == upsertAll") {
    val target = Seq(
      ("AAPL", "2024-01-02", 100.0), ("MSFT", "2024-01-02", 200.0))
      .toDF("stock_symbol", "trade_date", "close_price")
    val batch = Seq(
      ("AAPL", "2024-01-02", 101.5), ("NVDA", "2024-01-02", 300.0))
      .toDF("stock_symbol", "trade_date", "close_price")

    val viaSql = fresh()
    viaSql.createOrReplace(target, "fact_stock_daily_price")
    batch.createOrReplaceTempView("new_fact_data")
    // the statement exactly as the reference's f-string renders it
    // (glue_catalog-qualified table name and all)
    MergeSql.merge(viaSql, """
            MERGE INTO glue_catalog.stock_db.fact_stock_daily_price t
            USING new_fact_data s
            ON t.stock_symbol = s.stock_symbol AND t.trade_date = s.trade_date
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)

    val viaApi = fresh()
    viaApi.createOrReplace(target, "fact_stock_daily_price")
    UpsertWriter.upsertAll(viaApi, "fact_stock_daily_price", batch,
      Seq("stock_symbol", "trade_date"))

    assert(sortedRows(viaSql.read("fact_stock_daily_price")) ===
      sortedRows(viaApi.read("fact_stock_daily_price")))
    assert(viaSql.read("fact_stock_daily_price").count() === 3)
  }

  test("reference selective MERGE verbatim == upsertSelective (first_seen preserved)") {
    val target = Seq(
      ("AAPL", "Apple Inc", "tech", "2023-05-01", "2024-01-01"),
      ("MSFT", "Microsoft", "tech", "2023-06-01", "2024-01-01"))
      .toDF("symbol", "company_name", "sector", "first_seen_date", "last_seen_date")
    val batch = Seq(
      ("AAPL", "Apple Inc.", "technology", "2024-01-02", "2024-01-02"),
      ("NVDA", "NVIDIA", "technology", "2024-01-02", "2024-01-02"))
      .toDF("symbol", "company_name", "sector", "first_seen_date", "last_seen_date")

    val viaSql = fresh()
    viaSql.createOrReplace(target, "dim_stock")
    batch.createOrReplaceTempView("new_dim_stock")
    MergeSql.merge(viaSql, """
            MERGE INTO glue_catalog.stock_db.dim_stock t
            USING new_dim_stock s
            ON t.symbol = s.symbol
            WHEN MATCHED THEN UPDATE SET
                t.company_name = s.company_name,
                t.sector = s.sector,
                t.last_seen_date = s.last_seen_date
            WHEN NOT MATCHED THEN INSERT *
        """)

    val viaApi = fresh()
    viaApi.createOrReplace(target, "dim_stock")
    UpsertWriter.upsertSelective(viaApi, "dim_stock", batch,
      Seq("symbol"), preserve = Seq("first_seen_date"))

    assert(sortedRows(viaSql.read("dim_stock")) ===
      sortedRows(viaApi.read("dim_stock")))
    // the matched row kept its original first_seen_date but took the
    // new mutable fields; the inserted row carries its own values
    val aapl = viaSql.read("dim_stock").filter($"symbol" === "AAPL")
      .select("company_name", "first_seen_date", "last_seen_date")
      .as[(String, String, String)].head()
    assert(aapl === (("Apple Inc.", "2023-05-01", "2024-01-02")))
  }

  test("MERGE through the versioned store commits a rollback-able snapshot") {
    val root = Files.createTempDirectory("graft-mergesql-v").toString
    val vs = new VersionedTableStore(spark, root)
    vs.commitFull(Seq(("AAPL", 100.0)).toDF("symbol", "px"), "t")
    Seq(("AAPL", 101.0), ("NVDA", 300.0)).toDF("symbol", "px")
      .createOrReplaceTempView("merge_batch")
    MergeSql.merge(vs, """MERGE INTO t USING merge_batch s ON t.symbol = s.symbol
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(vs.read("t").count() === 2)
    vs.rollbackTo("t", 1)
    assert(vs.read("t").as[(String, Double)].collect().toSeq === Seq(("AAPL", 100.0)))
  }

  test("matched-DELETE: unconditional, conditional, with and without INSERT") {
    val target = Seq(("AAPL", 100.0), ("MSFT", 200.0), ("IBM", 50.0))
      .toDF("symbol", "px")
    val batch = Seq(("AAPL", 180.0), ("MSFT", 90.0), ("NVDA", 300.0))
      .toDF("symbol", "px")

    // conditional delete + insert: AAPL deleted (batch px > 150), MSFT
    // kept (clause doesn't fire), IBM untouched, NVDA inserted
    val st1 = fresh()
    st1.createOrReplace(target, "fact_px")
    batch.createOrReplaceTempView("px_batch")
    MergeSql.merge(st1, """MERGE INTO stock_db.fact_px t USING px_batch s
      ON t.symbol = s.symbol
      WHEN MATCHED AND s.px > 150 THEN DELETE
      WHEN NOT MATCHED THEN INSERT *""")
    assert(sortedRows(st1.read("fact_px")) ===
      sortedRows(Seq(("MSFT", 200.0), ("IBM", 50.0), ("NVDA", 300.0))
        .toDF("symbol", "px")))

    // unconditional delete, no insert: every matched key removed
    val st2 = fresh()
    st2.createOrReplace(target, "fact_px")
    MergeSql.merge(st2, """MERGE INTO fact_px t USING px_batch s
      ON t.symbol = s.symbol WHEN MATCHED THEN DELETE""")
    assert(sortedRows(st2.read("fact_px")) ===
      sortedRows(Seq(("IBM", 50.0)).toDF("symbol", "px")))

    // SQL path == API path, on the versioned store (delete commits a
    // rollback-able snapshot like any other MERGE)
    val root = Files.createTempDirectory("graft-mergesql-del").toString
    val vs = new VersionedTableStore(spark, root)
    vs.commitFull(target, "fact_px")
    MergeSql.merge(vs, """MERGE INTO fact_px t USING px_batch s
      ON t.symbol = s.symbol
      WHEN MATCHED AND s.px > 150 THEN DELETE
      WHEN NOT MATCHED THEN INSERT *""")
    val viaApi = fresh()
    viaApi.createOrReplace(target, "fact_px")
    UpsertWriter.deleteMerge(viaApi, "fact_px", batch, Seq("symbol"),
      matchCondition = Some("s.px > 150"), insertUnmatched = true)
    assert(sortedRows(vs.read("fact_px")) === sortedRows(viaApi.read("fact_px")))
    vs.rollbackTo("fact_px", 1)
    assert(vs.read("fact_px").count() === 3)
  }

  test("matched-DELETE condition on NULL evaluates to no-fire, keeping the row") {
    val st = fresh()
    st.createOrReplace(Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v"), "tnull")
    Seq(("A", Option.empty[Double]), ("B", Some(9.0)))
      .toDF("k", "v").createOrReplaceTempView("null_batch")
    MergeSql.merge(st, """MERGE INTO tnull t USING null_batch s
      ON t.k = s.k WHEN MATCHED AND s.v > 5 THEN DELETE""")
    // A's condition is NULL > 5 = NULL -> clause does not fire
    assert(sortedRows(st.read("tnull")) ===
      sortedRows(Seq(("A", 1.0)).toDF("k", "v")))
  }

  test("mixed DELETE + UPDATE + INSERT statement: first TRUE clause wins per row") {
    val target = Seq(("AAPL", 100.0, "A"), ("MSFT", 200.0, "A"), ("IBM", 50.0, "A"))
      .toDF("symbol", "px", "st")
    val batch = Seq(("AAPL", 180.0, "R"), ("MSFT", 90.0, "R"), ("NVDA", 300.0, "R"))
      .toDF("symbol", "px", "st")
    val st = fresh()
    st.createOrReplace(target, "fact_mixed")
    batch.createOrReplaceTempView("mixed_batch")
    MergeSql.merge(st, """MERGE INTO fact_mixed t USING mixed_batch s
      ON t.symbol = s.symbol
      WHEN MATCHED AND s.px > 150 THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    // AAPL: delete fires; MSFT: delete misses, update-all fires;
    // IBM untouched; NVDA inserted
    assert(sortedRows(st.read("fact_mixed")) === sortedRows(Seq(
      ("MSFT", 90.0, "R"), ("IBM", 50.0, "A"), ("NVDA", 300.0, "R"))
      .toDF("symbol", "px", "st")))
  }

  test("clause order matters: UPDATE before DELETE shields rows both conditions hit") {
    val target = Seq(("A", 10.0), ("B", 20.0)).toDF("k", "v")
    val batch = Seq(("A", 100.0), ("B", 1.0)).toDF("k", "v")
    val st = fresh()
    st.createOrReplace(target, "t_ord")
    batch.createOrReplaceTempView("ord_batch")
    // A's source row satisfies BOTH conditions; the update clause is
    // first, so A updates (not deleted); B fails both, stays as-is
    MergeSql.merge(st, """MERGE INTO t_ord t USING ord_batch s ON t.k = s.k
      WHEN MATCHED AND s.v > 50 THEN UPDATE SET *
      WHEN MATCHED AND s.v > 50 THEN DELETE""")
    assert(sortedRows(st.read("t_ord")) ===
      sortedRows(Seq(("A", 100.0), ("B", 20.0)).toDF("k", "v")))
  }

  test("expression assignments: accumulator merge t.cnt = t.cnt + s.cnt") {
    val target = Seq(("A", 5L, "x"), ("B", 7L, "y")).toDF("k", "cnt", "note")
    val batch = Seq(("A", 3L, "ignored"), ("C", 1L, "new")).toDF("k", "cnt", "note")
    val st = fresh()
    st.createOrReplace(target, "t_acc")
    batch.createOrReplaceTempView("acc_batch")
    MergeSql.merge(st, """MERGE INTO t_acc t USING acc_batch s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.cnt = t.cnt + s.cnt
      WHEN NOT MATCHED THEN INSERT *""")
    // A: cnt 5+3, note preserved (unassigned); B untouched; C inserted
    assert(sortedRows(st.read("t_acc")) === sortedRows(Seq(
      ("A", 8L, "x"), ("B", 7L, "y"), ("C", 1L, "new")).toDF("k", "cnt", "note")))
  }

  test("SET list splits on top-level commas only (multi-arg calls survive)") {
    val target = Seq(("A", 1.234), ("B", 5.678)).toDF("k", "v")
    val batch = Seq(("A", 2.0)).toDF("k", "v")
    val st = fresh()
    st.createOrReplace(target, "t_round")
    batch.createOrReplaceTempView("round_batch")
    MergeSql.merge(st, """MERGE INTO t_round t USING round_batch s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = round(t.v + s.v, 1)
      WHEN NOT MATCHED THEN INSERT *""")
    assert(sortedRows(st.read("t_round")) === sortedRows(
      Seq(("A", 3.2), ("B", 5.678)).toDF("k", "v")))
  }

  test("conditional selective update only fires where the condition is TRUE") {
    val target = Seq(("A", 1.0, "old"), ("B", 2.0, "old")).toDF("k", "v", "tag")
    val batch = Seq(("A", 9.0, "new"), ("B", 0.5, "new")).toDF("k", "v", "tag")
    val st = fresh()
    st.createOrReplace(target, "t_cond")
    batch.createOrReplaceTempView("cond_batch")
    MergeSql.merge(st, """MERGE INTO t_cond t USING cond_batch s ON t.k = s.k
      WHEN MATCHED AND s.v > t.v THEN UPDATE SET t.v = s.v, t.tag = s.tag""")
    // A: 9 > 1 -> updated; B: 0.5 > 2 false -> untouched; no insert clause
    assert(sortedRows(st.read("t_cond")) === sortedRows(Seq(
      ("A", 9.0, "new"), ("B", 2.0, "old")).toDF("k", "v", "tag")))
  }

  test("statements outside the MERGE grammar fail loudly, naming the construct") {
    val vs = fresh()
    // column-list INSERT and INSERT-before-MATCHED are grammar since
    // r8 -- both must parse (functional coverage below + oracle gates)
    MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *
      WHEN MATCHED THEN DELETE""")
    val badCount = intercept[IllegalArgumentException] {
      MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)""")
    }
    assert(badCount.getMessage.contains("VALUES"))
    val badStar = intercept[IllegalArgumentException] {
      MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""")
    }
    assert(badStar.getMessage.contains("no source row"))
    val badTwoIns = intercept[IllegalArgumentException] {
      MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(badTwoIns.getMessage.contains("more than one INSERT"))
    val bad2 = intercept[IllegalArgumentException] {
      MergeSql.parse("""MERGE INTO t USING s ON t.k < s.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(bad2.getMessage.contains("column equality"))
    // expression assignments are supported since r7; a SET item with
    // no target column is still rejected
    val bad3 = intercept[IllegalArgumentException] {
      MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET 5
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(bad3.getMessage.contains("SET assignment"))
    // ...and a SET target on the wrong alias is named in the error
    val bad4 = intercept[IllegalArgumentException] {
      MergeSql.parse("""MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET s.v = s.v
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(bad4.getMessage.contains("not a target column"))
    assert(vs != null)
  }

  test("catalog registration survives a same-named temp view (shadow regression)") {
    // single-part names resolve temp views FIRST: an unqualified
    // DROP TABLE IF EXISTS used to be diverted to the temp view,
    // leaving the catalog table in place for the next CREATE to
    // collide with (surfaced as a cross-suite flake when another
    // spec leaked a temp view named like a store table)
    val st = fresh()
    spark.range(1).toDF("x").createOrReplaceTempView("t_shadow")
    try {
      st.createOrReplace(Seq((1, 2)).toDF("a", "b"), "t_shadow")
      st.createOrReplace(Seq((3, 4)).toDF("a", "b"), "t_shadow") // re-register
      assert(spark.table("spark_catalog.default.t_shadow")
        .as[(Int, Int)].collect().toSeq === Seq((3, 4)))
      // the temp view is untouched -- the store never resolves
      // through it
      assert(spark.table("t_shadow").columns.toSeq === Seq("x"))
    } finally {
      spark.catalog.dropTempView("t_shadow")
      spark.sql("DROP TABLE IF EXISTS spark_catalog.default.t_shadow")
    }
  }

  test("UPDATE-only MERGE accepts a source NARROWER than the target") {
    // Iceberg/Delta allow it: with no INSERT clause and no SET *, the
    // source only needs its join keys and the columns it assigns --
    // nothing may force schema parity or reference absent s.columns
    val store = fresh()
    store.createOrReplace(
      Seq(("a", 1, "keepA"), ("b", 2, "keepB")).toDF("k", "v", "tag"), "t")
    Seq(("a", 10), ("c", 30)).toDF("k", "v").createOrReplaceTempView("nsrc")
    MergeSql.merge(store, """
      MERGE INTO t t USING nsrc s ON t.k = s.k
      WHEN MATCHED AND s.v > t.v THEN UPDATE SET t.v = s.v
    """)
    assert(sortedRows(store.read("t")) === sortedRows(
      Seq(("a", 10, "keepA"), ("b", 2, "keepB")).toDF("k", "v", "tag")))
  }

  test("DELETE/UPDATE statements accept a target alias; literals survive") {
    import graft.pipeline.WarehouseSql
    import org.apache.spark.sql.functions.col
    val store = fresh()
    store.createOrReplace(
      Seq((1, 5, "u.y"), (2, 50, "b"), (3, 7, "c"), (4, 8, "u.z"))
        .toDF("k", "x", "s"), "t")
    WarehouseSql.delete(store, "DELETE FROM t AS u WHERE u.x > 10")
    assert(store.read("t").select("k").as[Int].collect().sorted.toSeq ===
      Seq(1, 3, 4))
    WarehouseSql.update(store, "UPDATE t u SET u.x = u.x + 1 WHERE u.k = 1")
    assert(store.read("t").filter(col("k") === 1)
      .select("x").as[Int].head() === 6)
    // a string literal that happens to contain `u.` is not rewritten
    // -- in EITHER quote form (Spark expr() reads double-quoted text
    // as a string literal too). Each probe targets a row that ONLY
    // matches when the literal survives intact: a stripper regression
    // (matching s = 'y' / 'z' instead) would leave the row alive and
    // fail the assertion.
    WarehouseSql.delete(store, "DELETE FROM t AS u WHERE u.s = 'u.y'")
    assert(store.read("t").select("k").as[Int].collect().sorted.toSeq ===
      Seq(3, 4), "single-quoted literal was rewritten")
    WarehouseSql.delete(store, "DELETE FROM t AS u WHERE u.s = \"u.z\"")
    assert(store.read("t").select("k").as[Int].collect().sorted.toSeq ===
      Seq(3), "double-quoted literal was rewritten")
  }

  test("alias stripping spares a struct path whose middle segment = alias") {
    import org.apache.spark.sql.functions.{col, struct}
    import graft.pipeline.WarehouseSql
    val store = fresh()
    // column a holds struct u holds field b: the condition path a.u.b
    // contains the target alias `u` MID-PATH -- stripping it would
    // yield the unresolvable (or worse, wrong) a.b
    val df = Seq((1, 7), (2, 99)).toDF("k", "b")
      .select(col("k"), struct(struct(col("b")).as("u")).as("a"))
    store.createOrReplace(df, "ts_path")
    WarehouseSql.delete(store, "DELETE FROM ts_path AS u WHERE a.u.b > 10")
    assert(store.read("ts_path").select("k").as[Int].collect().toSeq === Seq(1))
    // ...while a genuine alias qualifier still strips, backtick form
    // included
    WarehouseSql.delete(store, "DELETE FROM ts_path AS u WHERE u.`k` = 1")
    assert(store.read("ts_path").count() === 0L)
  }

  test("NOT MATCHED BY SOURCE: delete and flag target rows the source dropped") {
    val store = fresh()
    store.createOrReplace(Seq(
      ("a", 1.0, "live"), ("b", 2.0, "live"), ("c", 3.0, "live"),
      ("d", 4.0, "live")).toDF("k", "v", "status"), "t_sync")
    Seq(("a", 10.0, "live"), ("e", 50.0, "live"))
      .toDF("k", "v", "status").createOrReplaceTempView("sync_src")
    MergeSql.merge(store, """
      MERGE INTO t_sync t USING sync_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED BY SOURCE AND t.v >= 3 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.status = 'orphaned'
      WHEN NOT MATCHED THEN INSERT *""")
    // a: matched update; b: target-only, v<3 -> flagged; c,d: target-
    // only v>=3 -> deleted (first BY SOURCE clause wins); e: inserted
    assert(sortedRows(store.read("t_sync")) === sortedRows(Seq(
      ("a", 10.0, "live"), ("b", 2.0, "orphaned"), ("e", 50.0, "live"))
      .toDF("k", "v", "status")))
  }

  test("column-list INSERT: unassigned target columns NULL, condition honored") {
    val store = fresh()
    store.createOrReplace(
      Seq(("a", 1.0, "tag-a")).toDF("k", "v", "tag"), "t_ins")
    Seq(("a", 10.0), ("b", 20.0), ("c", 999.0))
      .toDF("k", "v").createOrReplaceTempView("ins_src")
    MergeSql.merge(store, """
      MERGE INTO t_ins t USING ins_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED AND s.v < 100 THEN INSERT (k, v) VALUES (s.k, s.v * 2)""")
    // b inserted with tag NULL and v doubled; c blocked by the insert
    // condition; the narrower source is legal with a column list
    val rows = store.read("t_ins").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) "NULL" else r.getString(2))).sorted.toSeq
    assert(rows === Seq(("a", 10.0, "tag-a"), ("b", 40.0, "NULL")))
  }

  test("BY SOURCE through the versioned store matches the plain store") {
    val plain = fresh()
    val versioned = new VersionedTableStore(spark,
      Files.createTempDirectory("graft-mergesql-vs").toString)
    for (store <- Seq[WarehouseWrites](plain, versioned)) {
      store.createOrReplace(
        Seq(("x", 1.0), ("y", 2.0)).toDF("k", "v"), "t_bs2")
      Seq(("x", 5.0)).toDF("k", "v").createOrReplaceTempView("bs2_src")
      MergeSql.merge(store, """
        MERGE INTO t_bs2 t USING bs2_src s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(sortedRows(plain.read("t_bs2")) ===
      sortedRows(versioned.read("t_bs2")))
    assert(sortedRows(plain.read("t_bs2")) ===
      sortedRows(Seq(("x", 1.0)).toDF("k", "v")))
  }
}
