package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.TestSpark

/** The graft `TableCatalog`: store tables as first-class Spark SQL
  * citizens — qualified reads, VERSION/TIMESTAMP AS OF time travel,
  * INSERT INTO/OVERWRITE, DDL, and the scan-planning contract
  * (partition pruning + manifest-stats skipping through Spark's own
  * v2 parquet scans). */
class GraftCatalogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-catalog").toString
  spark.conf.set("spark.sql.catalog.gtest",
    "graft.table.catalog.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gtest.root", root)
  spark.conf.set("spark.sql.catalog.gtest.stats.measures", "v")

  private val store = new VersionedTableStore(spark, root,
    statsFor = n => if (n == "measures") Seq("v") else Nil)

  private def rows(yrs: Range, perYr: Int, bump: Long = 0) =
    yrs.flatMap(y => (0 until perYr).map(i =>
      (y, y.toLong * 1000 + i + bump, s"r$y-$i"))).toDF("yr", "v", "tag")

  test("qualified SELECT reads the store table; filters push to parquet") {
    store.commitFull(rows(1996 to 1998, 10), "measures", Seq("yr"), Seq("v"))
    val out = spark.sql(
      "SELECT tag, v FROM gtest.default.measures WHERE v % 2 = 0")
    assert(out.count() === 15)
    val scan = out.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    // the scan is Spark's own parquet batch scan with pushdown active
    assert(scan.scan.description().contains("PushedFilters"))
  }

  test("partition pruning reaches the manifest-pinned file index") {
    val pruned = spark.sql(
      "SELECT * FROM gtest.default.measures WHERE yr = 1997")
    assert(pruned.count() === 10)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    val files = scan.scan.asInstanceOf[
      org.apache.spark.sql.execution.datasources.v2.FileScan]
      .fileIndex.inputFiles
    // inputFiles is pre-pruning; the planned partitions are what count
    val planned = scan.inputRDD.partitions.length
    assert(planned >= 1)
    val full = spark.sql("SELECT * FROM gtest.default.measures")
    val fullScan = full.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(files.length === fullScan.scan.asInstanceOf[
      org.apache.spark.sql.execution.datasources.v2.FileScan]
      .fileIndex.inputFiles.length)
    assert(planned < fullScan.inputRDD.partitions.length)
  }

  test("manifest-stats skipping drops disjoint partitions from listFiles") {
    val snap = store.snapshotView("measures", None)
    assert(snap.stats.nonEmpty)
    val idx = org.apache.spark.sql.graft.GraftScanPlanning.fileIndex(
      spark, new org.apache.spark.sql.types.StructType()
        .add("yr", "int"), snap.entries, snap.stats)
    val v = AttributeReference("v", LongType)()
    // v in [1997000, 1997009] -> only yr=1997's files survive
    val hit = idx.listFiles(Nil, Seq(
      GreaterThanOrEqual(v, Literal(1997000L)),
      LessThanOrEqual(v, Literal(1997009L))))
    val dirs = hit.flatMap(_.files.map(_.getPath.getParent.getName)).toSet
    assert(dirs === Set("yr=1997"))
    // no stats for the column -> conservative, everything scans
    val u = AttributeReference("unknown", LongType)()
    val all = idx.listFiles(Nil, Seq(GreaterThanOrEqual(u, Literal(0L))))
    assert(all.flatMap(_.files.map(_.getPath.getParent.getName)).toSet
      .size === 3)
  }

  test("VERSION AS OF and TIMESTAMP AS OF serve pinned snapshots") {
    val t0 = 1000000L
    store.clockMs = () => t0
    store.commitFull(rows(2000 to 2000, 3), "history", Seq("yr"))
    store.clockMs = () => t0 + 10000
    store.commitFull(rows(2000 to 2001, 3, bump = 7), "history", Seq("yr"))
    val v1 = spark.sql(
      "SELECT * FROM gtest.default.history VERSION AS OF 1")
    assert(v1.count() === 3)
    assert(v1.agg(sum($"v")).as[Long].head ===
      rows(2000 to 2000, 3).agg(sum($"v")).as[Long].head)
    val head = spark.sql("SELECT * FROM gtest.default.history")
    assert(head.count() === 6)
    // micros timestamp between the two commits resolves to v1
    val tsv1 = spark.sql(
      s"SELECT * FROM gtest.default.history TIMESTAMP AS OF " +
        s"timestamp_micros(${(t0 + 5000) * 1000})")
    assert(tsv1.count() === 3)
  }

  test("INSERT INTO: disjoint partitions append as a delta; overlap rewrites") {
    store.commitFull(rows(1996 to 1996, 4), "app2", Seq("yr"))
    val before = store.snapshotView("app2", None)
    // disjoint year: true append, the 1996 rel keeps its immutable dir
    spark.sql(
      "INSERT INTO gtest.default.app2 VALUES (2042L, 'a', 1997)").collect()
    val after = store.snapshotView("app2", None)
    assert(after.version === before.version + 1)
    assert(after.entries.toMap.apply("yr=1996") ===
      before.entries.toMap.apply("yr=1996"))
    assert(after.entries.toMap.contains("yr=1997"))
    assert(spark.sql("SELECT count(*) FROM gtest.default.app2")
      .as[Long].head === 5)
    // overlapping year: append semantics preserved via rewrite
    spark.sql(
      "INSERT INTO gtest.default.app2 VALUES (77L, 'b', 1996)").collect()
    assert(spark.sql(
      "SELECT count(*) FROM gtest.default.app2 WHERE yr = 1996")
      .as[Long].head === 5)
    assert(spark.sql("SELECT count(*) FROM gtest.default.app2")
      .as[Long].head === 6)
    // INSERT OVERWRITE replaces the whole snapshot
    spark.sql(
      "INSERT OVERWRITE gtest.default.app2 VALUES (1L, 'z', 1999)").collect()
    assert(spark.sql("SELECT v, tag, yr FROM gtest.default.app2")
      .as[(Long, String, Int)].collect().toSeq === Seq((1L, "z", 1999)))
  }

  test("SQL DDL round trip: CREATE, list, exists, INSERT, rename, drop") {
    spark.sql("CREATE TABLE gtest.default.ddl (k INT, s STRING) " +
      "PARTITIONED BY (k)")
    assert(spark.sql("SHOW TABLES IN gtest.default").as[(String, String, Boolean)]
      .collect().map(_._2).contains("ddl"))
    spark.sql("INSERT INTO gtest.default.ddl VALUES ('one', 1), ('two', 2)")
    assert(spark.sql("SELECT s FROM gtest.default.ddl WHERE k = 2")
      .as[String].collect().toSeq === Seq("two"))
    // RENAME TO resolves its target inside the same catalog
    spark.sql("ALTER TABLE gtest.default.ddl RENAME TO default.ddl2")
    assert(spark.sql("SELECT count(*) FROM gtest.default.ddl2")
      .as[Long].head === 2)
    spark.sql("DROP TABLE gtest.default.ddl2")
    assert(!store.exists("ddl2"))
  }

  test("store-API commits and catalog reads interleave consistently") {
    store.commitFull(rows(1990 to 1991, 2), "mix", Seq("yr"))
    assert(spark.sql("SELECT count(*) FROM gtest.default.mix")
      .as[Long].head === 4)
    store.deleteWhere("mix", col("yr") === 1990, Seq("yr"))
    assert(spark.sql("SELECT count(*) FROM gtest.default.mix")
      .as[Long].head === 2)
  }
}
