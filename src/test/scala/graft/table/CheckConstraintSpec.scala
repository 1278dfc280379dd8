package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Enforced CHECK constraints on the versioned store: ADD validates
  * existing rows (one predicate scan), every write path then
  * re-validates ITS OWN freshly-written files before the manifest CAS
  * — no snapshot can ever serve a violating row, and a rejected write
  * leaves no trace. SQL semantics: NULL passes, only FALSE violates. */
class CheckConstraintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new VersionedTableStore(spark,
    Files.createTempDirectory("graft-ck").toString)

  test("ADD validates existing rows; violating history rejects") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10), (2, -5)).toDF("k", "amt"), "t",
      partitionBy = Seq("k"))
    val e = intercept[CheckViolation](
      vs.addCheckConstraint("t", "amt_pos", "amt >= 0"))
    assert(e.getMessage.contains("amt_pos"))
    // nothing committed: no constraint recorded, history unmoved
    assert(vs.currentVersion("t") === 1L)
    vs.addCheckConstraint("t", "amt_floor", "amt >= -10")
    assert(vs.currentVersion("t") === 2L)
  }

  test("writes re-validate their own files; rejected commits vanish") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10)).toDF("k", "amt"), "t", partitionBy = Seq("k"))
    vs.addCheckConstraint("t", "amt_pos", "amt >= 0")
    val vBefore = vs.currentVersion("t")
    intercept[CheckViolation](
      vs.commitPartitions(Seq((2, -1)).toDF("k", "amt"), "t", Seq("k")))
    // the rejected commit left neither a snapshot nor files
    assert(vs.currentVersion("t") === vBefore)
    assert(vs.read("t").count() === 1L)
    vs.commitPartitions(Seq((2, 7)).toDF("k", "amt"), "t", Seq("k"))
    assert(vs.read("t").select("amt").as[Int].collect().sorted.toSeq ===
      Seq(7, 10))
    // NULL passes (SQL CHECK semantics): nullable batch lands
    vs.commitPartitions(
      Seq((3, Option.empty[Int])).toDF("k", "amt"), "t", Seq("k"))
    assert(vs.read("t").count() === 3L)
  }

  test("bad predicates reject at ADD; evolution cannot orphan a check") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10)).toDF("k", "amt"), "t")
    assertThrows[Exception](
      vs.addCheckConstraint("t", "nd", "rand() > 0.5"))
    assertThrows[Exception](
      vs.addCheckConstraint("t", "no_col", "ghost > 0"))
    vs.addCheckConstraint("t", "amt_pos", "amt >= 0")
    // dropping the checked column would brick later writes: rejected
    assertThrows[IllegalArgumentException](
      vs.evolveSchema("t", "k INT"))
    vs.dropCheckConstraint("t", "amt_pos")
    vs.evolveSchema("t", "k INT") // legal once the check is gone
    assert(vs.read("t").columns.toSeq === Seq("k"))
    // drop of a missing constraint: loud unless ifExists
    assertThrows[IllegalArgumentException](
      vs.dropCheckConstraint("t", "nope"))
    vs.dropCheckConstraint("t", "nope", ifExists = true)
  }

  test("staged append epochs validate before the CAS") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10, 1996)).toDF("v", "amt", "yr"), "t", Seq("yr"))
    vs.addCheckConstraint("t", "amt_pos", "amt >= 0")
    val ids = vs.snapshotView("t", None).fieldIds
    val (dirId, path) = vs.newStreamStaging("t")
    FieldIds.stampDf(Seq((2, -3, 1996)).toDF("v", "amt", "yr"), ids)
      .write.parquet(s"$path/yr=1996")
    intercept[CheckViolation](
      vs.commitStagedAppend("t", dirId, Set("yr=1996"), "q:1",
        writerIds = ids))
    assert(vs.read("t").count() === 1L)
    // the rejected epoch's staging was deleted (no orphan dir)
    val fs = new org.apache.hadoop.fs.Path(vs.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))
  }

  test("SQL surface: ADD CONSTRAINT gates INSERT and UPDATE; DROP reopens") {
    val root = Files.createTempDirectory("graft-ck-sql").toString
    spark.conf.set("spark.sql.catalog.ckc", "graft.table.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ckc.root", root)
    try {
      spark.sql("CREATE TABLE ckc.default.t (v STRING, amt INT, yr INT) " +
        "PARTITIONED BY (yr)")
      spark.sql("INSERT INTO ckc.default.t VALUES ('a', 10, 1996)")
      spark.sql("ALTER TABLE ckc.default.t " +
        "ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
      // violating INSERT rejected; state unchanged
      intercept[Exception](spark.sql(
        "INSERT INTO ckc.default.t VALUES ('b', -1, 1996)"))
      assert(spark.sql("SELECT count(*) FROM ckc.default.t")
        .as[Long].head() === 1L)
      // violating row-level UPDATE rejected (executor-staged path)
      intercept[Exception](spark.sql(
        "UPDATE ckc.default.t SET amt = -5 WHERE v = 'a'"))
      assert(spark.sql("SELECT amt FROM ckc.default.t").as[Int].head() === 10)
      // valid writes proceed
      spark.sql("UPDATE ckc.default.t SET amt = 11 WHERE v = 'a'")
      spark.sql("INSERT INTO ckc.default.t VALUES ('c', 0, 1997)")
      assert(spark.sql("SELECT sum(amt) FROM ckc.default.t")
        .as[Long].head() === 11L)
      // DROP CONSTRAINT reopens
      spark.sql("ALTER TABLE ckc.default.t DROP CONSTRAINT amt_pos")
      spark.sql("INSERT INTO ckc.default.t VALUES ('d', -7, 1997)")
      assert(spark.sql("SELECT count(*) FROM ckc.default.t")
        .as[Long].head() === 3L)
    } finally {
      spark.conf.unset("spark.sql.catalog.ckc")
      spark.conf.unset("spark.sql.catalog.ckc.root")
    }
  }

  test("copy-on-write updateWhere validates its rewritten files") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10), (2, 20)).toDF("k", "amt"), "t",
      partitionBy = Seq("k"))
    vs.addCheckConstraint("t", "amt_pos", "amt >= 0")
    intercept[CheckViolation](vs.updateWhere("t",
      org.apache.spark.sql.functions.col("k") === 1,
      Map("amt" -> org.apache.spark.sql.functions.lit(-1)), Seq("k")))
    // rejected rewrite left the table bit-identical
    assert(vs.read("t").select("amt").as[Int].collect().sorted.toSeq ===
      Seq(10, 20))
    vs.updateWhere("t", org.apache.spark.sql.functions.col("k") === 1,
      Map("amt" -> org.apache.spark.sql.functions.lit(11)), Seq("k"))
    assert(vs.read("t").select("amt").as[Int].collect().sorted.toSeq ===
      Seq(11, 20))
  }

  test("renaming a CHECKed column rejects until the constraint drops") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10)).toDF("k", "amt"), "t", partitionBy = Seq("k"))
    vs.addCheckConstraint("t", "amt_pos", "amt >= 0")
    // the predicate is SQL text bound by name: a rename would brick
    // every later write at enforcement time — rejected up front
    val e = intercept[IllegalArgumentException](
      vs.renameColumn("t", "amt", "amount"))
    assert(e.getMessage.contains("amt_pos"))
    vs.dropCheckConstraint("t", "amt_pos")
    vs.renameColumn("t", "amt", "amount")
    vs.addCheckConstraint("t", "amount_pos", "amount >= 0")
    intercept[CheckViolation](
      vs.commitPartitions(Seq((2, -1)).toDF("k", "amount"), "t", Seq("k")))
  }

  test("branch-scoped constraints merge three-way") {
    val vs = fresh()
    vs.commitFull(Seq((1, 10)).toDF("k", "amt"), "t", partitionBy = Seq("k"))
    vs.createBranch("t", "dev")
    vs.addCheckConstraint("t", "amt_pos", "amt >= 0", branch = "dev")
    // isolated: main takes a violating write, the branch rejects it
    vs.commitPartitions(Seq((2, -1)).toDF("k", "amt"), "t", Seq("k"))
    intercept[CheckViolation](vs.commitFull(
      Seq((1, 10), (3, -2)).toDF("k", "amt"), "t", branch = "dev"))
    // merging would carry the branch's constraint onto main — but
    // main's k=2 row VIOLATES it, and the merge validates the data it
    // adopts/retains against checks each side was not written under
    // (the ADD CONSTRAINT discipline applied to the merge's data
    // movement): REJECTED, nothing moves
    intercept[CheckViolation](vs.mergeBranch("t", "dev"))
    assert(vs.snapshotView("t", None).checks === Nil)
    // clean main's violation; the merge then lands and enforces
    vs.deleteWhere("t", $"amt" < 0, Seq("k"))
    vs.mergeBranch("t", "dev")
    assert(vs.snapshotView("t", None).checks ===
      Seq(("amt_pos", "amt >= 0")))
    intercept[CheckViolation](
      vs.commitPartitions(Seq((4, -9)).toDF("k", "amt"), "t", Seq("k")))
  }
}
