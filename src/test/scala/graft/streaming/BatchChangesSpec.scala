package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.VersionedTableStore

/** BATCH reads of the change feed (`spark.read.format("graft-changes")`
  * with fromVersion/toVersion — the Delta `table_changes` analogue):
  * the same net-changelog semantics as the streaming source, planned
  * as one bounded scan. Behaviors pinned on planted data: full-
  * snapshot-as-inserts, net insert/update/delete with pre-images,
  * SQL temp-view surface, loud failures beyond the head, stage
  * reclamation by vacuum. */
class BatchChangesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): VersionedTableStore = new VersionedTableStore(
    spark, Files.createTempDirectory("graft-bc").toString)

  private def readChanges(vs: VersionedTableStore, table: String,
      opts: Map[String, String]): org.apache.spark.sql.DataFrame = {
    var r = spark.read.format("graft-changes")
      .option("root", vs.root).option("table", table)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("(0, head]: the whole snapshot reads as inserts") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t")
    val df = readChanges(vs, "t", Map("keys" -> "k"))
    assert(df.select("k", "change_type", "v").as[(Long, String, String)]
      .collect().toSeq.sorted ===
      Seq((1L, "insert", "a"), (2L, "insert", "b")))
  }

  test("(v1, v2]: net insert/update/delete with pre-images") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t")
    vs.commitFull(Seq((1L, "A"), (3L, "c")).toDF("k", "v"), "t")
    val df = readChanges(vs, "t",
      Map("keys" -> "k", "includePre" -> "true",
        "fromVersion" -> "1", "toVersion" -> "2"))
    val got = df.select("k", "change_type", "v", "pre_v")
      .as[(Long, String, Option[String], Option[String])]
      .collect().toSeq.sortBy(_._1)
    // deletes carry their LAST-KNOWN values in the post columns
    // (the feed's established convention — consumers key on
    // change_type, and a tombstone with values beats one without)
    assert(got === Seq(
      (1L, "update", Some("A"), Some("a")),
      (2L, "delete", Some("b"), Some("b")),
      (3L, "insert", Some("c"), None)))
  }

  test("SQL surface: CREATE TEMP VIEW USING graft-changes") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, 10)).toDF("k", "amt"), "t")
    vs.commitFull(Seq((1L, 10), (2L, 20)).toDF("k", "amt"), "t")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW t_changes
          USING `graft-changes`
          OPTIONS (root '${vs.root}', table 't', keys 'k',
                   fromVersion '1', toVersion '2')""")
    try {
      assert(spark.sql(
        "SELECT k, change_type, amt FROM t_changes ORDER BY k")
        .as[(Long, String, Int)].collect().toSeq ===
        Seq((2L, "insert", 20)))
    } finally spark.sql("DROP VIEW IF EXISTS t_changes")
  }

  test("net collapse: intermediate states fold; delete+reinsert nets to update") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, "a")).toDF("k", "v"), "t")   // v1
    vs.commitFull(Seq((2L, "x")).toDF("k", "v"), "t")   // v2: del 1, ins 2
    vs.commitFull(Seq((1L, "z"), (2L, "x")).toDF("k", "v"), "t") // v3
    val got = readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "1", "toVersion" -> "3"))
      .select("k", "change_type", "v").as[(Long, String, String)]
      .collect().toSeq.sorted
    // 1: a -> z (through an intermediate delete) = net update;
    // 2: absent -> x = insert
    assert(got === Seq((1L, "update", "z"), (2L, "insert", "x")))
  }

  test("empty range plans zero rows; beyond-head and expired bases fail loudly") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, "a")).toDF("k", "v"), "t")
    assert(readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "1", "toVersion" -> "1"))
      .count() === 0L)
    assertThrows[Exception](readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "1", "toVersion" -> "99"))
      .count())
    assertThrows[Exception](readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "77", "toVersion" -> "1"))
      .count())
  }

  test("vacuum reclaims aged-out batch stages, never fresh ones") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, "a")).toDF("k", "v"), "t")
    readChanges(vs, "t", Map("keys" -> "k")).count()
    val fs = new org.apache.hadoop.fs.Path(vs.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stageRoot = new org.apache.hadoop.fs.Path(
      s"${vs.root}/t/_changes_stage")
    assert(fs.exists(stageRoot) && fs.listStatus(stageRoot).nonEmpty)
    // fresh stage survives a vacuum with the default age...
    vs.vacuum("t")
    assert(fs.listStatus(stageRoot).nonEmpty)
    // ...and an aged-out one reclaims (negative age = future cutoff)
    assert(vs.vacuum("t", minAgeMs = -60000L) >= 1L)
    assert(!fs.exists(stageRoot) || fs.listStatus(stageRoot).isEmpty)
  }

  test("repeated reads of one range share a stage instead of accreting dirs") {
    val vs = freshStore()
    vs.commitFull(Seq((1L, "a")).toDF("k", "v"), "t")
    vs.commitFull(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t")
    val fs = new org.apache.hadoop.fs.Path(vs.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stageRoot = new org.apache.hadoop.fs.Path(
      s"${vs.root}/t/_changes_stage")
    def stageDirs(): Seq[String] =
      if (!fs.exists(stageRoot)) Nil
      else fs.listStatus(stageRoot).filter(_.isDirectory)
        .map(_.getPath.getName).toSeq.sorted
    // every physical execution of the same range — repeated actions
    // on one DataFrame, a brand-new query over the range — resolves
    // the published stage rather than materializing a fresh dir
    val df = readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "1", "toVersion" -> "2"))
    df.count(); df.count()
    readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "1", "toVersion" -> "2")).count()
    assert(stageDirs().size === 1, s"stages accreted: ${stageDirs()}")
    // a DIFFERENT range gets its own stage
    readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "0", "toVersion" -> "2")).count()
    assert(stageDirs().size === 2)
    // a vacuumed stage self-heals through its stale pointer
    assert(vs.vacuum("t", minAgeMs = -60000L) >= 2L)
    readChanges(vs, "t",
      Map("keys" -> "k", "fromVersion" -> "1", "toVersion" -> "2")).count()
    assert(stageDirs().size === 1)
  }
}
