package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hidden partitioning ([[PartitionTransforms]]): days/bucket/truncate
  * layouts where the derived value lives only in directory paths —
  * the Iceberg transform model scoped to the append + read + evolve
  * surface. Pinned on planted data: layout shape on disk, schema
  * hygiene (no hidden columns surface), stats pruning on the SOURCE
  * column, disjoint-day delta appends, copy-on-write DML re-deriving
  * the layout, bloom point lookups over bucket layouts, and the loud
  * identity-only guards. */
class HiddenPartitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new VersionedTableStore(spark,
    Files.createTempDirectory("graft-hp").toString)

  private def tsDf(n: Int) = spark.range(n).select(
    col("id"),
    // four distinct days starting 1996-01-01 UTC
    timestamp_millis(lit(820454400000L) + (col("id") % 4) * 86400000L +
      col("id") * 1000L).as("ts"),
    concat(lit("v"), col("id")).as("v"))

  test("days(ts): hidden layout on disk, clean schema, day-pruned reads") {
    val vs = fresh()
    vs.commitFull(tsDf(400), "t", Seq("days(ts)"), statsColumns = Seq("ts"))
    // disk: four ts_day=... dirs; schema: NO ts_day column
    val snap = vs.snapshotView("t", None)
    assert(snap.entries.map(_._1).toSet ===
      (1 to 4).map(d => f"ts_day=1996-01-0$d%d").toSet)
    assert(vs.read("t").columns.toSeq === Seq("id", "ts", "v"))
    assert(vs.read("t").count() === 400L)
    // stats pruning on the SOURCE column: one day's range touches one
    // partition's files
    // ts stats record as timestamp strings (lexicographic = chrono);
    // the timestamp range reader prunes whole days at plan time
    val oneDay = vs.readWhereTimestamp("t", "ts",
      "1996-01-02", "1996-01-02 23:59:59")
    assert(oneDay.count() === 100L)
    assert(oneDay.inputFiles.length < vs.read("t").inputFiles.length)
  }

  test("disjoint-day appends commit as partition deltas") {
    val vs = fresh()
    val base = tsDf(400)
    vs.commitFull(base.filter(col("ts") < lit("1996-01-03").cast("timestamp")),
      "t", Seq("days(ts)"))
    val before = vs.snapshotView("t", None).entries.toMap
    vs.commitPartitions(
      base.filter(col("ts") >= lit("1996-01-03").cast("timestamp")),
      "t", Seq("days(ts)"))
    val after = vs.snapshotView("t", None).entries.toMap
    // old days keep their exact dirs (zero rewrite), new days appear
    assert(after("ts_day=1996-01-01") === before("ts_day=1996-01-01"))
    assert(after.keySet.contains("ts_day=1996-01-04"))
    assert(vs.read("t").count() === 400L)
  }

  test("copy-on-write DML re-derives the layout; moved rows land correctly") {
    val vs = fresh()
    vs.commitFull(tsDf(400), "t", Seq("days(ts)"))
    // delete one day's rows by SOURCE predicate
    vs.deleteWhere("t",
      col("ts") >= lit("1996-01-04").cast("timestamp"), Seq("days(ts)"))
    assert(vs.read("t").count() === 300L)
    // update a NON-source column: rows stay in their day dirs
    vs.updateWhere("t", col("id") === 1L,
      Map("v" -> lit("patched")), Seq("days(ts)"))
    assert(vs.read("t").filter(col("v") === "patched").count() === 1L)
    // assigning the partition SOURCE rejects (rows would move)
    assertThrows[IllegalArgumentException](vs.updateWhere("t",
      col("id") === 2L,
      Map("ts" -> lit("1999-01-01").cast("timestamp")), Seq("days(ts)")))
  }

  test("bucket layout + bloom index: point lookups prune to one bucket") {
    val vs = fresh()
    vs.commitFull(spark.range(4000).select(col("id"),
      concat(lit("p"), col("id")).as("payload")), "t", Seq("bucket8(id)"))
    assert(vs.snapshotView("t", None).entries.map(_._1)
      .forall(_.startsWith("id_bucket=")))
    assert(vs.read("t").columns.toSeq === Seq("id", "payload"))
    vs.buildBloomIndex("t", "id")
    val hit = vs.readPointIndexed("t", "id", 1234L)
    assert(hit.select("payload").as[String].collect().toSeq === Seq("p1234"))
    assert(hit.inputFiles.length < vs.read("t").inputFiles.length)
  }

  test("truncate layout groups string prefixes; guards fire loudly") {
    val vs = fresh()
    val df = Seq(("AAPL", 1), ("AABC", 2), ("MSFT", 3), ("MSAT", 4))
      .toDF("sym", "x")
    vs.commitFull(df, "t", Seq("truncate2(sym)"))
    assert(vs.snapshotView("t", None).entries.map(_._1).toSet ===
      Set("sym_trunc=AA", "sym_trunc=MS"))
    assert(vs.read("t").count() === 4L)
    // identity-only machinery rejects with the scope message
    val e = intercept[IllegalArgumentException](
      vs.commitPartitionsReplacing(df, "t", Seq("truncate2(sym)"),
        Seq(Seq("AA"))))
    assert(e.getMessage.contains("hidden partitioning"))
    // renaming / retyping the SOURCE column rejects
    assertThrows[IllegalArgumentException](vs.renameColumn("t", "sym", "s2"))
    // evolving IN a column named like the hidden layout column
    // rejects (it would be silently overwritten at write time)
    assertThrows[IllegalArgumentException](
      vs.evolveSchema("t", "sym STRING, x INT, sym_trunc STRING"))
    // validation: derived-name collision and bad source types reject
    assertThrows[IllegalArgumentException](vs.commitFull(
      df.withColumn("sym_trunc", lit("boom")), "t2", Seq("truncate2(sym)")))
    assertThrows[IllegalArgumentException](vs.commitFull(
      df, "t3", Seq("days(x)")))
  }

  test("months/years/hours layouts shape and read correctly") {
    val vs = fresh()
    vs.commitFull(tsDf(400)
      .withColumn("ts", col("ts") + expr("make_interval(0, CAST(id % 3 AS INT))")),
      "t", Seq("months(ts)"))
    assert(vs.snapshotView("t", None).entries.map(_._1).toSet ===
      Set("ts_month=1996-01", "ts_month=1996-02", "ts_month=1996-03"))
    assert(vs.read("t").count() === 400L)
    val vs2 = fresh()
    vs2.commitFull(tsDf(100), "t", Seq("years(ts)"))
    assert(vs2.snapshotView("t", None).entries.map(_._1).toSet ===
      Set("ts_year=1996"))
    val vs3 = fresh()
    vs3.commitFull(tsDf(50), "t", Seq("hours(ts)"))
    assert(vs3.snapshotView("t", None).entries.map(_._1)
      .forall(_.matches("ts_hour=1996-01-0\\d-00")))
    assert(vs3.read("t").columns.toSeq === Seq("id", "ts", "v"))
  }

  test("SQL surface: CREATE PARTITIONED BY (days(ts)), INSERT, SELECT, travel") {
    val root = Files.createTempDirectory("graft-hp-sql").toString
    spark.conf.set("spark.sql.catalog.hpc", "graft.table.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.hpc.root", root)
    try {
      spark.sql("CREATE TABLE hpc.default.ev " +
        "(id BIGINT, ts TIMESTAMP, v STRING) PARTITIONED BY (days(ts))")
      tsDf(400).createOrReplaceTempView("hp_src")
      spark.sql("INSERT INTO hpc.default.ev SELECT id, ts, v FROM hp_src")
      // hidden: SELECT * shows the declared columns only
      assert(spark.sql("SELECT * FROM hpc.default.ev").columns.toSeq ===
        Seq("id", "ts", "v"))
      assert(spark.sql("SELECT count(*) FROM hpc.default.ev")
        .as[Long].head() === 400L)
      // the user filters the SOURCE column; no hidden-column knowledge
      assert(spark.sql("SELECT count(*) FROM hpc.default.ev " +
        "WHERE ts >= TIMESTAMP '1996-01-04 00:00:00'")
        .as[Long].head() === 100L)
      // a second day-disjoint INSERT is a delta; travel serves v1
      spark.sql("INSERT INTO hpc.default.ev VALUES " +
        "(9999, TIMESTAMP '1996-02-01 00:00:00', 'late')")
      assert(spark.sql("SELECT count(*) FROM hpc.default.ev")
        .as[Long].head() === 401L)
      // v1 = CREATE (empty); the 400-row INSERT is v2
      assert(spark.sql("SELECT count(*) FROM hpc.default.ev VERSION AS OF 2")
        .as[Long].head() === 400L)
      // row-level DML keeps the identity-only contract, loudly
      val e = intercept[Exception](spark.sql(
        "UPDATE hpc.default.ev SET v = 'x' WHERE id = 1"))
      assert(e.getMessage.contains("hidden partitioning") ||
        Option(e.getCause).exists(_.getMessage.contains("hidden partitioning")))
    } finally {
      spark.conf.unset("spark.sql.catalog.hpc")
      spark.conf.unset("spark.sql.catalog.hpc.root")
    }
  }
}
