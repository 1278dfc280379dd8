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

  test("SQL DELETE FROM commits a copy-on-write snapshot; TRUNCATE empties") {
    store.commitFull(rows(1996 to 1998, 4), "del", Seq("yr"))
    val before = store.snapshotView("del", None)
    // partition-scoped delete: untouched years keep their immutable dirs
    spark.sql("DELETE FROM gtest.default.del WHERE yr = 1997")
    val after = store.snapshotView("del", None)
    assert(after.version === before.version + 1)
    assert(spark.sql("SELECT count(*) FROM gtest.default.del")
      .as[Long].head === 8)
    assert(!after.entries.toMap.contains("yr=1997"))
    assert(after.entries.toMap.apply("yr=1996") ===
      before.entries.toMap.apply("yr=1996"))
    // data-column predicate (conjunction, IN, comparison) translates too
    spark.sql("DELETE FROM gtest.default.del " +
      "WHERE v >= 1996002 AND tag IN ('r1996-2', 'r1996-3')")
    assert(spark.sql("SELECT count(*) FROM gtest.default.del")
      .as[Long].head === 6)
    // history is intact: the pre-delete snapshot still reads in full
    assert(spark.sql(
      s"SELECT count(*) FROM gtest.default.del VERSION AS OF ${before.version}")
      .as[Long].head === 12)
    spark.sql("TRUNCATE TABLE gtest.default.del")
    assert(spark.sql("SELECT count(*) FROM gtest.default.del")
      .as[Long].head === 0)
    // schema survives the truncate
    assert(spark.sql("SELECT * FROM gtest.default.del").columns.toSeq ===
      Seq("v", "tag", "yr"))
  }

  test("untranslatable DELETE predicates are rejected up front, not half-run") {
    store.commitFull(rows(2001 to 2001, 3), "del2", Seq("yr"))
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gtest.default.del2 WHERE length(tag) > 99")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
    assert(spark.sql("SELECT count(*) FROM gtest.default.del2")
      .as[Long].head === 3)
  }

  test("ALTER TABLE ADD/DROP COLUMNS: metadata-only, history keeps old schema") {
    store.commitFull(rows(1996 to 1997, 2), "evo", Seq("yr"))
    val before = store.snapshotView("evo", None)
    spark.sql("ALTER TABLE gtest.default.evo ADD COLUMNS (score DOUBLE)")
    val after = store.snapshotView("evo", None)
    // zero data I/O: every data dir is shared with the pre-ALTER head
    assert(after.entries === before.entries)
    assert(after.version === before.version + 1)
    // pre-evolution files read the new column as NULL
    val head = spark.sql(
      "SELECT tag, score FROM gtest.default.evo WHERE yr = 1996")
    assert(head.columns.toSeq === Seq("tag", "score"))
    assert(head.collect().forall(_.isNullAt(1)))
    // new writes carry it; old rows stay NULL
    spark.sql("INSERT INTO gtest.default.evo VALUES (9L, 'n', 0.5D, 1998)")
    assert(spark.sql("SELECT count(*) FROM gtest.default.evo " +
      "WHERE score IS NOT NULL").as[Long].head === 1)
    // time travel serves the PRE-evolution schema
    assert(!spark.sql(
      s"SELECT * FROM gtest.default.evo VERSION AS OF ${before.version}")
      .columns.contains("score"))
    // DROP: projection-only; the values live on in history
    spark.sql("ALTER TABLE gtest.default.evo DROP COLUMN tag")
    assert(spark.sql("SELECT * FROM gtest.default.evo").columns.toSeq ===
      Seq("v", "score", "yr"))
    assert(spark.sql(
      s"SELECT tag FROM gtest.default.evo VERSION AS OF ${before.version}")
      .count() === 4)
    // guarded: partition column, rename, non-nullable add all reject
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.default.evo DROP COLUMN yr") }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.default.evo RENAME COLUMN v TO w") }
    assert(spark.sql("SELECT * FROM gtest.default.evo").columns.toSeq ===
      Seq("v", "score", "yr"))
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
