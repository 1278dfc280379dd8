package graft.table

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Retry-idempotence of the commit protocol against filesystems whose
  * publish primitive can LIE: on duplicate-reply transports (NFS
  * link(2)/rename(2) — the op lands server-side, the reply is lost,
  * the client's retransmit answers EEXIST) a succeeded publish reports
  * failure. Before round 13 that false loss made every batch caller
  * delete the staged data dir the now-live manifest references (data
  * loss) and made every retry loop re-land the same payload at a new
  * version (duplicates). Two independent defenses, both specced here:
  *
  *  1. casManifest judges the outcome by WHAT IS ON DISK — a reported
  *     loss whose landed commit file carries this writer's payload
  *     byte-for-byte IS a win (a racer can never be byte-identical:
  *     data commits embed a per-writer UUID dir id);
  *  2. statement-level txn markers (the Delta appId+version pattern,
  *     extended from the streaming sink): a replayed logical write
  *     whose marker is already live retires as a no-op.
  */
class CommitIdempotenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
    df.as[(Int, String)].collect().toSeq.sorted

  /** A store whose publish LANDS the commit file but reports failure
    * for `lies` invocations — the NFS duplicate-reply shape. */
  private class DuplicateReplyStore(root: String, var lies: Int)
      extends VersionedTableStore(spark, root) {
    override protected def publishCommit(tmp: Path, p: Path): Boolean = {
      val won = super.publishCommit(tmp, p)
      if (won && lies > 0) { lies -= 1; false } else won
    }
  }

  test("a publish that lands but reports failure is still a committed win") {
    val root = Files.createTempDirectory("graft-dup-reply").toString
    val vs = new DuplicateReplyStore(root, lies = 0)
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t") // v1, honest publish
    val clean = new VersionedTableStore(spark, root)
    vs.lies = 1
    // the lied-about commit must return success (not throw), keep its
    // staged data dir alive, and land exactly once
    val v = vs.commitFull(Seq((2, "b")).toDF("k", "v"), "t")
    assert(v === 2L)
    assert(clean.versions("t") === Seq(1L, 2L))
    assert(rows(clean.read("t")) === Seq((2, "b")))
  }

  test("duplicate-reply inside the deleteKeys retry loop lands ONE key set") {
    val root = Files.createTempDirectory("graft-dup-delete").toString
    val vs = new DuplicateReplyStore(root, lies = 0)
    vs.commitFull(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), "t")
    vs.lies = 1
    val v = vs.deleteKeys("t", Seq(Tuple1(2)).toDF("k"), Seq("k"))
    assert(v === 2L)
    val clean = new VersionedTableStore(spark, root)
    assert(clean.versions("t") === Seq(1L, 2L)) // exactly one delete commit
    assert(clean.pendingDeletes("t").size === 1) // exactly one key set
    assert(rows(clean.read("t")) === Seq((1, "a"), (3, "c")))
  }

  test("a replayed txn-stamped commit retires as a no-op, table unchanged") {
    val root = Files.createTempDirectory("graft-txn-replay").toString
    val vs = new VersionedTableStore(spark, root)
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t") // v1
    // the logical write: append at observed parent 1, marker derived
    // from (statement, parent) the way GraftCatalog.insert does
    val txn = "ins:main:1:false:12345"
    val df = Seq((2, "b")).toDF("k", "v")
    assert(vs.commitFull(vs.read("t").unionByName(df), "t", txn = txn) === 2L)
    // the harness lost the success report and replays the SAME
    // statement: marker is live, the replay must not move the table
    assert(vs.commitFull(vs.read("t").unionByName(df), "t", txn = txn) === 2L)
    assert(vs.versions("t") === Seq(1L, 2L))
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b")))
    // an INTENTIONAL re-run derives its marker from the MOVED parent
    // and lands normally — idempotence never blocks fresh writes
    val txn2 = "ins:main:2:false:12345"
    assert(vs.commitFull(vs.read("t").unionByName(df), "t", txn = txn2) === 3L)
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b"), (2, "b")))
  }

  test("identical consecutive SQL INSERTs both land (no wrongful dedup)") {
    val root = Files.createTempDirectory("graft-sql-twice").toString
    val cat = "gidem"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.table.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.default.t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.table(s"$cat.default.t").count() === 4L)
  }

  test("spark.graft.txn.id gives caller-named cross-execution replay protection") {
    val root = Files.createTempDirectory("graft-txnid").toString
    val cat = "gtxnid"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.table.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      spark.sql(s"CREATE TABLE $cat.default.t (k INT, v STRING)")
      // the caller names the logical write (Delta appId+version /
      // Iceberg WAP-id shape) — a replayed statement retires as a
      // no-op EVEN AFTER its first run moved the head, the scenario a
      // (plan-hash, observed-head) derivation structurally misses
      spark.conf.set("spark.graft.txn.id", "job42-batch7")
      spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 'a')")
      spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 'a')") // replay
      assert(spark.table(s"$cat.default.t").count() === 1L)
      // a fresh id is a fresh logical write
      spark.conf.set("spark.graft.txn.id", "job42-batch8")
      spark.sql(s"INSERT INTO $cat.default.t VALUES (2, 'b')")
      assert(spark.table(s"$cat.default.t").count() === 2L)
      // replay protection scopes to the table target too: the marker
      // on another table does not block this one
      spark.sql(s"CREATE TABLE $cat.default.u (k INT, v STRING)")
      spark.sql(s"INSERT INTO $cat.default.u VALUES (9, 'z')")
      assert(spark.table(s"$cat.default.u").count() === 1L)
    } finally {
      spark.conf.unset("spark.graft.txn.id")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }
}
