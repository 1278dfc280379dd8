package graft.table

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Named branches over the versioned store — the git-branch /
  * Iceberg-ref analogue built on the same manifest CAS as WAP:
  * branch commits are head-invisible, retention-pinned lineages
  * landed back on main by fast-forward (main unmoved) or a
  * three-way partition-granular merge. */
class BranchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(keep: Int = 10) = new VersionedTableStore(spark,
    Files.createTempDirectory("graft-branch").toString, keepSnapshots = keep)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
    df.select("k", "v").as[(Int, String)].collect().toSeq.sorted

  private def fs(vs: VersionedTableStore) =
    new Path(vs.root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("branch commits are isolated: main head never sees them") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a"), (2, "b")).toDF("k", "v"), "t")
    val bv = vs.createBranch("t", "dev")
    assert(bv === 2L)
    vs.commitFull(Seq((1, "a"), (2, "B"), (3, "c")).toDF("k", "v"), "t",
      branch = "dev")
    // main: unchanged head, version list, rows
    assert(vs.currentVersion("t") === 1L)
    assert(vs.versions("t") === Seq(1L))
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b")))
    // branch: fork copy then its own commit
    assert(vs.branchHeadVersion("t", "dev") === 3L)
    assert(rows(vs.readBranch("t", "dev")) ===
      Seq((1, "a"), (2, "B"), (3, "c")))
    assert(vs.branches("t") === Seq(("dev", 3L, 1L)))
  }

  test("the branch-create fork is a zero-copy of the fork point") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev")
    // same rows, and the fork manifest shares the fork point's dirs
    assert(rows(vs.readBranch("t", "dev")) === rows(vs.readVersion("t", 1)))
    val dataDirs = fs(vs).listStatus(new Path(s"${vs.path("t")}/_data"))
      .map(_.getPath.getName).toSeq
    assert(dataDirs.count(_.startsWith("v")) === 1,
      s"branch creation must write no data dirs, saw $dataDirs")
  }

  test("main and branch writers do not conflict with each other") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev")
    // interleave: main, branch, main, branch — all must land
    vs.commitFull(Seq((1, "m1")).toDF("k", "v"), "t")
    vs.commitFull(Seq((1, "b1")).toDF("k", "v"), "t", branch = "dev")
    vs.commitFull(Seq((1, "m2")).toDF("k", "v"), "t")
    vs.commitFull(Seq((1, "b2")).toDF("k", "v"), "t", branch = "dev")
    assert(rows(vs.read("t")) === Seq((1, "m2")))
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "b2")))
    // and same-branch staleness is still caught: a writer that
    // observed an old BRANCH head is rejected
    val stale = vs.Manifest(99, Nil, Nil, branch = "dev")
    intercept[ConcurrentWriteException] {
      vs.casManifest("t", stale, observedParent = 2L) // branch head is 6
    }
  }

  test("branch delta commits share the branch parent's untouched dirs") {
    val vs = fresh()
    val base = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "day")
    vs.commitFull(base, "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    vs.commitPartitions(Seq((2, "B", 20)).toDF("k", "v", "day"), "t",
      Seq("day"), branch = "dev")
    assert(vs.readBranch("t", "dev").select("k", "v")
      .as[(Int, String)].collect().toSeq.sorted === Seq((1, "a"), (2, "B")))
    // day=10 on the branch is served from the ORIGINAL dir (shared),
    // main still reads the old day=20
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b")))
  }

  test("fast-forward lands the branch when main is unmoved, rejects otherwise") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev")
    vs.commitFull(Seq((1, "dev1")).toDF("k", "v"), "t", branch = "dev")
    val v = vs.fastForward("t", "dev")
    assert(vs.currentVersion("t") === v)
    assert(rows(vs.read("t")) === Seq((1, "dev1")))
    // main history shows the published version, not the branch chain
    assert(vs.versions("t") === Seq(1L, v))

    // now main moves; a second branch from the OLD fork cannot FF
    val vs2 = fresh()
    vs2.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs2.createBranch("t", "dev")
    vs2.commitFull(Seq((1, "dev")).toDF("k", "v"), "t", branch = "dev")
    vs2.commitFull(Seq((1, "main")).toDF("k", "v"), "t")
    val e = intercept[ConcurrentWriteException] { vs2.fastForward("t", "dev") }
    assert(e.getMessage.contains("mergeBranch"))
    assert(rows(vs2.read("t")) === Seq((1, "main")))
  }

  test("three-way merge: disjoint partition changes combine, both survive") {
    val vs = fresh()
    val base = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "v", "day")
    vs.commitFull(base, "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    // branch rewrites day=20, main rewrites day=30
    vs.commitPartitions(Seq((2, "BRANCH", 20)).toDF("k", "v", "day"), "t",
      Seq("day"), branch = "dev")
    vs.commitPartitions(Seq((3, "MAIN", 30)).toDF("k", "v", "day"), "t",
      Seq("day"))
    val v = vs.mergeBranch("t", "dev")
    assert(vs.currentVersion("t") === v)
    assert(rows(vs.read("t")) ===
      Seq((1, "a"), (2, "BRANCH"), (3, "MAIN")))
    // lineage audit stays clean after the merge commit
    assert(vs.snapshots("t").filter("NOT lineage_ok").count() === 0L)
  }

  test("three-way merge: overlapping partition changes conflict loudly") {
    val vs = fresh()
    val base = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "day")
    vs.commitFull(base, "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    vs.commitPartitions(Seq((2, "BRANCH", 20)).toDF("k", "v", "day"), "t",
      Seq("day"), branch = "dev")
    vs.commitPartitions(Seq((2, "MAIN", 20)).toDF("k", "v", "day"), "t",
      Seq("day"))
    val e = intercept[BranchMergeConflict] { vs.mergeBranch("t", "dev") }
    assert(e.conflicts === Seq("day=20"))
    // nothing moved: main keeps its own rewrite, branch keeps its own
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "MAIN")))
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "a"), (2, "BRANCH")))
  }

  test("merge carries a branch-side schema evolution; both-sides diverge conflicts") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10)).toDF("k", "v", "day"), "t",
      partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    // the branch adds a NULLABLE column in a new day partition; the
    // merged schema must carry it and pre-evolution files read NULL
    vs.commitPartitions(
      Seq((2, "b", Some("x"), 20)).toDF("k", "v", "w", "day"),
      "t", Seq("day"), branch = "dev")
    val v = vs.mergeBranch("t", "dev")
    val merged = vs.read("t")
    assert(merged.columns.toSeq === Seq("k", "v", "w", "day"))
    assert(merged.count() === 2L)
    assert(merged.filter("day = 10").select("w").collect().head.isNullAt(0))
    assert(v > 0)
  }

  test("retention never expires branch lineage or the dirs it pins") {
    val vs = fresh(keep = 2)
    vs.commitFull(Seq((1, "fork")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev")
    vs.commitFull(Seq((1, "dev1")).toDF("k", "v"), "t", branch = "dev")
    // churn main far past the retention window
    (1 to 6).foreach(i =>
      vs.commitFull(Seq((1, s"m$i")).toDF("k", "v"), "t"))
    assert(vs.versions("t").size === 2) // retention applied on main
    // the fork point expired from MAIN history…
    assert(vs.versions("t").headOption.forall(_ > 1L))
    // …but the branch still reads both its fork copy and its head
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "dev1")))
    assert(rows(vs.readVersion("t", 2)) === Seq((1, "fork")))
    // and the audit sees no dangling dirs anywhere
    val dangling = vs.audit("t").filter(_._1.startsWith("dangling"))
    assert(dangling.forall(_._2 === 0L), s"audit: $dangling")
  }

  test("dropBranch reclaims branch-only dirs, keeps shared ones") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev")
    vs.commitFull(Seq((1, "dev1")).toDF("k", "v"), "t", branch = "dev")
    vs.dropBranch("t", "dev")
    intercept[NoSuchElementException] { vs.readBranch("t", "dev") }
    assert(vs.branches("t") === Nil)
    // main reads untouched; the branch's own data dir is gone
    assert(rows(vs.read("t")) === Seq((1, "a")))
    val orphans = vs.audit("t").find(_._1 == "orphan_dirs").get
    assert(orphans._2 === 0L, s"dropBranch left orphans: $orphans")
    // version numbers are burned: the next commit allocates past them
    assert(vs.commitFull(Seq((1, "b")).toDF("k", "v"), "t") === 4L)
  }

  test("dropBranch after fast-forward keeps the published dirs alive") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev")
    vs.commitFull(Seq((1, "dev1")).toDF("k", "v"), "t", branch = "dev")
    vs.fastForward("t", "dev")
    vs.dropBranch("t", "dev")
    // the FF'd head SHARES the branch commit's dir — must survive
    assert(rows(vs.read("t")) === Seq((1, "dev1")))
    val dangling = vs.audit("t").filter(_._1.startsWith("dangling"))
    assert(dangling.forall(_._2 === 0L), s"audit: $dangling")
  }

  test("branchDiff previews exactly what the merge would land") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "day"),
      "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    vs.commitPartitions(Seq((2, "B", 20), (4, "d", 40))
      .toDF("k", "v", "day"), "t", Seq("day"), branch = "dev")
    val d = vs.branchDiff("t", "dev", keys = Seq("k"))
      .select("k", "change_type").as[(Int, String)].collect().toSeq.sorted
    assert(d === Seq((2, "update"), (4, "insert")))
  }

  test("branch inherits pending merge-on-read deletes from the fork") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a"), (2, "b")).toDF("k", "v"), "t")
    vs.deleteKeys("t", Seq(2).toDF("k"), Seq("k"))
    vs.createBranch("t", "dev")
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "a")))
  }

  test("cherry-pick applies ONE commit's delta, not the whole branch") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "v", "day"), "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev") // v2
    val vA = vs.commitPartitions(Seq((2, "PICKED", 20))
      .toDF("k", "v", "day"), "t", Seq("day"), branch = "dev") // v3
    vs.commitPartitions(Seq((3, "NOT-PICKED", 30))
      .toDF("k", "v", "day"), "t", Seq("day"), branch = "dev") // v4
    vs.cherryPick("t", vA)
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "PICKED"), (3, "c")))
    // the branch is untouched and still carries both commits
    assert(rows(vs.readBranch("t", "dev")) ===
      Seq((1, "a"), (2, "PICKED"), (3, "NOT-PICKED")))
  }

  test("cherry-pick conflicts when the head diverged on the same rel") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "day"),
      "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    val vA = vs.commitPartitions(Seq((2, "BRANCH", 20))
      .toDF("k", "v", "day"), "t", Seq("day"), branch = "dev")
    vs.commitPartitions(Seq((2, "MAIN", 20)).toDF("k", "v", "day"), "t",
      Seq("day"))
    val e = intercept[BranchMergeConflict] { vs.cherryPick("t", vA) }
    assert(e.conflicts === Seq("day=20"))
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "MAIN")))
  }

  test("stress: concurrent main and branch writers never corrupt lineage") {
    val vs = fresh(keep = 50)
    vs.commitFull(Seq((0, "base", 0)).toDF("k", "v", "day"), "t",
      partitionBy = Seq("day"))
    vs.createBranch("t", "b1")
    vs.createBranch("t", "b2")
    // 2 main writers (contend with each other, retry on CAS loss) and
    // one writer per branch (each branch single-writer, so a branch
    // CAS loss would be a cross-lineage conflict leak = test failure)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val branchRetries = new java.util.concurrent.atomic.AtomicInteger(0)
    def spawn(label: String)(body: => Unit): Thread = {
      val th = new Thread(() =>
        try body catch { case e: Throwable => errors.add(e) })
      th.setName(label); th.start(); th
    }
    val mains = (1 to 2).map(w => spawn(s"main-$w") {
      (1 to 4).foreach { i =>
        var done = false
        while (!done) {
          try {
            vs.commitPartitions(
              Seq((w * 100 + i, s"m$w-$i", w * 100 + i))
                .toDF("k", "v", "day"), "t", Seq("day"))
            done = true
          } catch { case _: ConcurrentWriteException => () }
        }
      }
    })
    val branches = Seq("b1", "b2").map(b => spawn(s"writer-$b") {
      (1 to 4).foreach { i =>
        var done = false
        while (!done) {
          // a branch writer can still lose the GLOBAL version
          // allocator race against a main writer (same version, one
          // file-create winner) — that is a retry, not a conflict;
          // what must never happen is a cross-lineage parent check
          // rejecting it, which would deadlock the single writer
          try {
            vs.commitPartitions(
              Seq((i, s"$b-$i", 9000 + i)).toDF("k", "v", "day"), "t",
              Seq("day"), branch = b)
            done = true
          } catch { case _: ConcurrentWriteException =>
            branchRetries.incrementAndGet()
          }
        }
      }
    })
    (mains ++ branches).foreach(_.join(120000))
    assert(errors.isEmpty, s"writer died: ${errors.peek()}")
    // every main write landed exactly once
    val main = vs.read("t")
    assert(main.filter("day >= 100 AND day < 9000").count() === 8L)
    // no branch row leaked onto main, no main row onto a branch head
    assert(main.filter("day >= 9000").count() === 0L)
    Seq("b1", "b2").foreach { b =>
      val bdf = vs.readBranch("t", b)
      assert(bdf.filter("day >= 9000").count() === 4L, s"branch $b")
      assert(bdf.filter("day >= 100 AND day < 9000").count() === 0L,
        s"main rows leaked into branch $b")
    }
    // the durable lineage audit holds across all surviving commits
    assert(vs.snapshots("t").filter("NOT lineage_ok").count() === 0L)
    assert(vs.audit("t").filter(_._1 == "lineage").forall(_._2 === 0L))
  }

  test("schema evolution on a branch: main schema untouched; merge carries it") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10)).toDF("k", "v", "day"), "t",
      partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    val evolved = "k INT,v STRING,day INT,score BIGINT"
    vs.evolveSchema("t", evolved, branch = "dev")
    // branch reads the evolved schema (new column NULL); main doesn't
    assert(vs.readBranch("t", "dev").columns.toSeq ===
      Seq("k", "v", "score", "day")) // partition col appended last
    assert(vs.read("t").columns.toSeq === Seq("k", "v", "day"))
    assert(vs.readBranch("t", "dev").select("score")
      .collect().head.isNullAt(0))
    // merge: main unchanged vs base -> branch's schema wins
    vs.mergeBranch("t", "dev")
    assert(vs.read("t").columns.toSeq === Seq("k", "v", "score", "day"))
  }

  test("branch retention: middles burn, base + recent keep, dirs reclaimed") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.createBranch("t", "dev") // v2 = base
    (1 to 5).foreach(i =>
      vs.commitFull(Seq((1, s"b$i")).toDF("k", "v"), "t", branch = "dev"))
    // versions on the branch: base + 5 commits
    assert(vs.branchVersions("t", "dev").size === 6)
    vs.expireBranchSnapshots("t", "dev", keep = 2)
    val left = vs.branchVersions("t", "dev")
    assert(left.size === 3) // base + last 2
    assert(left.head === 2L)
    // head still reads; merge base intact; expired dirs reclaimed
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "b5")))
    val orphans = vs.audit("t").find(_._1 == "orphan_dirs").get
    assert(orphans._2 === 0L, s"branch expiry left orphans: $orphans")
    val dangling = vs.audit("t").filter(_._1.startsWith("dangling"))
    assert(dangling.forall(_._2 === 0L), s"audit: $dangling")
    // the merge still works from the retained base
    val v = vs.mergeBranch("t", "dev")
    assert(rows(vs.read("t")) === Seq((1, "b5")))
    assert(v > 0)
  }

  test("branch DML: deleteWhereOn/updateWhereOn rewrite the branch, not main") {
    import org.apache.spark.sql.functions.{col, lit}
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "v", "day"), "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    vs.deleteWhereOn("t", "dev", col("k") === 1)
    vs.updateWhereOn("t", "dev", col("k") === 2, Map("v" -> lit("B!")))
    // branch reflects both; main reflects neither
    assert(rows(vs.readBranch("t", "dev")) === Seq((2, "B!"), (3, "c")))
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b"), (3, "c")))
    // untouched day=30 still shares the fork dir on the branch, so
    // the merge after an independent main rewrite of day=30 combines
    vs.commitPartitions(Seq((3, "MAIN", 30)).toDF("k", "v", "day"), "t",
      Seq("day"))
    vs.mergeBranch("t", "dev")
    assert(rows(vs.read("t")) === Seq((2, "B!"), (3, "MAIN")))
  }

  test("compact on a branch collapses its delta chain without touching main") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "day"),
      "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev")
    (1 to 3).foreach(i => vs.commitPartitions(
      Seq((2, s"b$i", 20)).toDF("k", "v", "day"), "t", Seq("day"),
      branch = "dev"))
    val mainDirsBefore = vs.snapshots("t").count()
    vs.compact("t", branch = "dev")
    // branch head now maps every rel to ONE fresh dir set; rows exact
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "a"), (2, "b3")))
    assert(vs.snapshots("t").count() === mainDirsBefore) // main untouched
    // post-compact, EVERY rel counts as branch-changed: merging onto
    // an unmoved main still works (identical-content rels conflict
    // only if main ALSO changed them)
    val v = vs.mergeBranch("t", "dev")
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b3")))
    assert(v > 0)
  }

  test("branch names must be non-numeric refs") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    intercept[IllegalArgumentException] { vs.createBranch("t", "123") }
    intercept[IllegalArgumentException] { vs.createBranch("t", "") }
    intercept[IllegalArgumentException] {
      vs.commitFull(Seq((1, "x")).toDF("k", "v"), "t", branch = "nope")
    }
  }

  test("branch ops on an empty ref reject loudly and never touch main") {
    // main manifests carry branch == "", so an unguarded empty-ref
    // listing would match the ENTIRE live main history: drop_branch
    // ('t','') would d-file every main commit (irreversible table
    // destruction) and expire_branch('t','',1) would expire main
    // middles bypassing tag pinning. Every lifecycle op must reject
    // the ref BEFORE listing.
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t")
    vs.commitFull(Seq((1, "b")).toDF("k", "v"), "t")
    intercept[IllegalArgumentException] { vs.dropBranch("t", "") }
    intercept[IllegalArgumentException] { vs.expireBranchSnapshots("t", "", 1) }
    intercept[IllegalArgumentException] { vs.mergeBranch("t", "") }
    intercept[IllegalArgumentException] { vs.fastForward("t", "") }
    intercept[IllegalArgumentException] { vs.branchDiff("t", "", Seq("k")) }
    intercept[IllegalArgumentException] { vs.dropBranch("t", "1") }
    // main history, head, and rows completely intact after the rejections
    assert(vs.versions("t") === Seq(1L, 2L))
    assert(vs.currentVersion("t") === 2L)
    assert(rows(vs.read("t")) === Seq((1, "b")))
  }

  test("dropBranch reclaims dirs of expired middles the branch head kept alive") {
    // an expired (d-filed) middle's dir survives branch retention
    // while a LIVE branch commit still references it; when dropBranch
    // then retires those referencing commits, the dir must be swept
    // too — not orphaned until some unrelated main expiry pass
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "day"),
      "t", partitionBy = Seq("day"))
    vs.createBranch("t", "dev") // v2 = base
    vs.commitPartitions(Seq((2, "B1", 20)).toDF("k", "v", "day"), "t",
      Seq("day"), branch = "dev") // v3 creates the day=20 dir
    vs.commitPartitions(Seq((1, "A1", 10)).toDF("k", "v", "day"), "t",
      Seq("day"), branch = "dev") // v4 still references v3's day=20 dir
    vs.commitPartitions(Seq((1, "A2", 10)).toDF("k", "v", "day"), "t",
      Seq("day"), branch = "dev") // v5 likewise
    vs.expireBranchSnapshots("t", "dev", keep = 2) // d-files v3 only
    // correct at this point: v3's day=20 dir is NOT reclaimed (v4/v5
    // heads still serve it)
    assert(rows(vs.readBranch("t", "dev")) === Seq((1, "A2"), (2, "B1")))
    vs.dropBranch("t", "dev")
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b")))
    val orphans = vs.audit("t").find(_._1 == "orphan_dirs").get
    assert(orphans._2 === 0L,
      s"dropBranch orphaned an expired middle's dir: $orphans")
  }

  /** Rewind a table to the PRE-IDENTITY on-disk shape (a store
    * created before the field-ID feature): same files, same schema,
    * ledger cleared — the state every pre-r12 table directory is in.
    * Full commits always assign identities now, so the shape can only
    * be fabricated the way it exists in the wild: as a raw manifest. */
  private def clearLedger(vs: VersionedTableStore, pby: Seq[String],
      ddl: String): Unit =
    vs.casManifest("t",
      vs.Manifest(vs.currentVersion("t") + 1, pby, vs.versionsMapping("t"),
        ddl),
      observedParent = vs.currentVersion("t"))

  test("merge rejects adopting pre-identity branch dirs under a ledgered head") {
    // The brick: a branch forked from a pre-identity head keeps
    // writing unstamped files; main later gains a ledger via a full
    // rewrite; the three-way ledger merge (both branch sides == base
    // == empty) would keep MAIN's ledger while adopting the branch's
    // ID-less dirs — per the FieldIds invariant every read of the
    // merged head then fails until rollback. The merge must reject
    // BEFORE its CAS, mirroring commitStagedAppend's writer check.
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "p"),
      "t", partitionBy = Seq("p"))
    clearLedger(vs, Seq("p"), "k INT,v STRING,p INT") // v2: pre-identity
    vs.createBranch("t", "old") // v3: fork carries the empty ledger
    vs.commitPartitions(Seq((3, "c", 30)).toDF("k", "v", "p"), "t",
      Seq("p"), branch = "old") // v4: delta on pre-identity — unstamped
    // main gains identities: a full rewrite assigns the ledger
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "p"),
      "t", partitionBy = Seq("p"))
    val e = intercept[ConcurrentWriteException] { vs.mergeBranch("t", "old") }
    assert(e.getMessage.contains("column identities"))
    // nothing moved: main still serves its rewritten head
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b")))
  }

  test("cherry-pick rejects a pre-identity commit under a ledgered head") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "p"),
      "t", partitionBy = Seq("p"))
    clearLedger(vs, Seq("p"), "k INT,v STRING,p INT")
    vs.createBranch("t", "fix")
    val pick = vs.commitPartitions(Seq((3, "c", 30)).toDF("k", "v", "p"),
      "t", Seq("p"), branch = "fix") // unstamped files, empty ledger
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "p"),
      "t", partitionBy = Seq("p")) // main re-ledgered
    val e = intercept[ConcurrentWriteException] { vs.cherryPick("t", pick) }
    assert(e.getMessage.contains("column identities"))
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b")))
  }

  test("ledgered branch deltas still merge under a ledgered head") {
    // positive control for the identity guard: the normal flow —
    // fork AFTER the table has its ledger, branch deltas stamp the
    // same IDs — must keep merging with zero friction
    val vs = fresh()
    vs.commitFull(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "p"),
      "t", partitionBy = Seq("p"))
    vs.createBranch("t", "dev")
    vs.commitPartitions(Seq((3, "c", 30)).toDF("k", "v", "p"), "t",
      Seq("p"), branch = "dev")
    vs.mergeBranch("t", "dev")
    assert(rows(vs.read("t")) === Seq((1, "a"), (2, "b"), (3, "c")))
  }
}
