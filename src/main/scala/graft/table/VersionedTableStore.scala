package graft.table

import java.util.UUID

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thrown when a commit loses the manifest compare-and-swap: another
  * writer committed the same version first. The losing writer's data
  * files are cleaned up; the table is exactly the winner's commit. */
class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

/** Versioned, append-only table store -- the engine's analogue of the
  * reference's Iceberg format-version-2 warehouse (snapshot commits +
  * rollback, build_stock_fact_table.py:98-100; optimistic commit
  * locking, which the reference leans on via Glue's
  * max_concurrent_runs bound, terraform/modules/glue/main.tf:137).
  *
  * Layout under `root/name`:
  * {{{
  *   _data/v3-ab12cd34/...   immutable parquet dirs, never rewritten
  *   _commits/c00000003      manifest: version -> (partition -> dir)
  * }}}
  *
  * Commit protocol (optimistic, lock-free):
  *  1. read the current manifest (highest COMPLETE commit file);
  *  2. write new data files to a fresh uuid-suffixed dir under
  *     `_data/` -- concurrent writers never collide on data paths;
  *  3. compare-and-swap the pointer: atomically create commit file
  *     `c{v+1}` (create-no-overwrite -- a conditional put on object
  *     stores, O_EXCL on HDFS/posix). Exactly one writer wins; the
  *     loser gets [[ConcurrentWriteException]] and its orphaned data
  *     dir is removed.
  * A crash between (2) and (3) leaves an unreferenced data dir and
  * the OLD pointer intact; a crash mid-(3) leaves a truncated
  * manifest, which readers skip (manifests must end with their
  * `end` marker line to be live).
  *
  * Partition-local commits ([[overwritePartitions]]) write ONLY the
  * touched partitions' files; the new manifest maps untouched
  * partitions to their existing immutable dirs. At 100 TB a daily
  * MERGE therefore commits one day of files plus a manifest -- the
  * same data-sharing shape as Iceberg snapshots -- while every prior
  * snapshot stays readable ([[readVersion]]) until expired
  * ([[expireSnapshots]], auto-run on commit keeping
  * `keepSnapshots`).
  */
class VersionedTableStore(val spark: SparkSession, val root: String,
    val keepSnapshots: Int = 10) extends WarehouseWrites {
  require(keepSnapshots >= 1, "keepSnapshots must be >= 1")

  private def fs =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(name: String): String = s"$root/$name"
  private def commitsPath(name: String) = new Path(s"${path(name)}/_commits")
  private def dataRoot(name: String) = s"${path(name)}/_data"

  /** One snapshot: the table version, its partition columns, and the
    * (partition rel-path -> immutable data dir) mapping; rel-path "."
    * for unpartitioned tables. */
  private[table] case class Manifest(version: Long, partitionBy: Seq[String],
      mapping: Seq[(String, String)])

  private val Header = "graft-manifest-v1"
  private val End = "end"

  private def serialize(m: Manifest): String = {
    val entries = m.mapping.sortBy(_._1)
      .map { case (rel, d) => s"dir\t$d\t$rel" }
    (Seq(Header, s"version=${m.version}",
      s"partitionBy=${m.partitionBy.mkString(",")}") ++ entries :+ End)
      .mkString("\n")
  }

  /** None for truncated or foreign files: a manifest is live only if
    * it parses AND carries its trailing `end` marker (a writer that
    * died mid-write left no committed version). */
  private def parse(text: String): Option[Manifest] = {
    val lines = text.split("\n", -1).toSeq
    if (lines.headOption.contains(Header) && lines.lastOption.contains(End)) {
      val fields = lines.collect {
        case l if l.contains("=") && !l.startsWith("dir\t") =>
          val Array(k, v) = l.split("=", 2); k -> v
      }.toMap
      val mapping = lines.collect {
        case l if l.startsWith("dir\t") =>
          val Array(_, d, rel) = l.split("\t", 3); rel -> d
      }
      val pby = fields("partitionBy") match {
        case "" => Nil; case s => s.split(",").toSeq
      }
      Some(Manifest(fields("version").toLong, pby, mapping))
    } else None
  }

  private def commitFile(name: String, v: Long) =
    new Path(commitsPath(name), f"c$v%08d")

  private def readManifest(p: Path): Option[Manifest] = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0)
        .foreach(n => bytes.write(buf, 0, n))
      parse(new String(bytes.toByteArray, "UTF-8"))
    } finally in.close()
  }

  /** All live snapshot versions, ascending. */
  def versions(name: String): Seq[Long] = {
    val dir = commitsPath(name)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.matches("c\\d{8}"))
      .sortBy(_.getPath.getName)
      .flatMap(st => readManifest(st.getPath))
      .map(_.version)
  }

  private def manifestAt(name: String, v: Long): Option[Manifest] = {
    val p = commitFile(name, v)
    if (fs.exists(p)) readManifest(p) else None
  }

  private def current(name: String): Option[Manifest] = {
    val dir = commitsPath(name)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.matches("c\\d{8}"))
      .sortBy(_.getPath.getName).reverseIterator
      .flatMap(st => readManifest(st.getPath))
      .nextOption()
  }

  def exists(name: String): Boolean = current(name).isDefined

  /** Test seam: the current snapshot's (rel-path -> dir) mapping, so
    * a spec can stage a racing manifest by hand. */
  private[table] def versionsMapping(name: String): Seq[(String, String)] =
    current(name).map(_.mapping).getOrElse(Nil)

  def currentVersion(name: String): Long =
    current(name).map(_.version)
      .getOrElse(throw new NoSuchElementException(s"no snapshots for $name"))

  /** Current-snapshot scan. */
  def read(name: String): DataFrame =
    load(name, current(name)
      .getOrElse(throw new NoSuchElementException(s"no snapshots for $name")))

  /** Time travel: the table exactly as of snapshot `v`. */
  def readVersion(name: String, v: Long): DataFrame =
    load(name, manifestAt(name, v).getOrElse(throw new NoSuchElementException(
      s"$name has no live snapshot $v (expired or never committed)")))

  /** Resolve a manifest to a DataFrame: one pruned parquet relation
    * per distinct data dir (basePath keeps hive partition-column
    * recovery), unioned by name. Delta chains stay short because
    * full commits and [[compact]] collapse them; a scan never fans
    * wider than the number of retained delta commits. */
  private def load(name: String, m: Manifest): DataFrame = {
    val groups = m.mapping.groupBy(_._2).toSeq.sortBy(_._1)
    val parts = groups.map { case (d, entries) =>
      val base = s"${dataRoot(name)}/$d"
      if (m.partitionBy.isEmpty) spark.read.parquet(base)
      else spark.read.option("basePath", base)
        .parquet(entries.map { case (rel, _) => s"$base/$rel" }: _*)
    }
    parts.reduce(_.unionByName(_))
  }

  /** The pointer swap: create-no-overwrite of the commit file (the
    * conditional-put primitive). Exactly one writer creates `c{v}`;
    * losers throw [[ConcurrentWriteException]], never overwrite.
    *
    * Recovery: if the existing `c{v}` is NOT a live manifest (no
    * `end` marker -- a writer died mid-write), it is debris, not a
    * commit; reclaim it and retry once so one crash can't wedge the
    * version counter forever. A live manifest is never deleted. */
  private[table] def casManifest(name: String, m: Manifest): Unit = {
    fs.mkdirs(commitsPath(name))
    val p = commitFile(name, m.version)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(serialize(m).getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException |
             _: org.apache.hadoop.fs.PathExistsException => false
      }
    var won = tryCreate()
    if (!won && fs.exists(p) && readManifest(p).isEmpty) {
      fs.delete(p, false)
      won = tryCreate()
    }
    if (!won) throw new ConcurrentWriteException(
      s"$name snapshot ${m.version} was committed by another writer")
  }

  /** Test seam: runs after data files are staged, before the manifest
    * CAS -- lets a spec interleave a competing commit into the race
    * window deterministically. */
  protected def beforeSwap(name: String, v: Long): Unit = ()

  private def freshDataDir(name: String, v: Long): String =
    s"v$v-${UUID.randomUUID().toString.take(8)}"

  /** List the hive partition rel-paths a parquet write produced
    * (depth = number of partition columns). listStatus returns
    * fs-qualified paths, so the base must be qualified the same way
    * before stripping it off. */
  private def partitionRels(base: Path, depth: Int): Seq[String] = {
    val qBase = fs.makeQualified(base).toString
    def walk(p: Path, d: Int): Seq[String] =
      if (d == 0)
        Seq(fs.makeQualified(p).toString.stripPrefix(qBase).stripPrefix("/"))
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => walk(st.getPath, d - 1))
    walk(base, depth)
  }

  private def writeData(df: DataFrame, name: String, dirId: String,
      partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"${dataRoot(name)}/$dirId")
  }

  private def commit(name: String, df: DataFrame, partitionBy: Seq[String],
      deltaPartitions: Boolean): Long = {
    val parent = current(name)
    parent.foreach { m =>
      require(m.partitionBy == partitionBy,
        s"$name is partitioned by ${m.partitionBy}, got $partitionBy" +
          " (repartitioning a table requires a new table name)")
    }
    val v = parent.map(_.version + 1).getOrElse(1L)
    val dirId = freshDataDir(name, v)
    writeData(df, name, dirId, partitionBy)
    val written: Seq[(String, String)] =
      if (partitionBy.isEmpty) Seq("." -> dirId)
      else partitionRels(new Path(s"${dataRoot(name)}/$dirId"), partitionBy.size)
        .map(_ -> dirId)
    val mapping =
      if (deltaPartitions && parent.isDefined) {
        val overridden = written.map(_._1).toSet
        parent.get.mapping.filterNot { case (rel, _) => overridden(rel) } ++ written
      } else written
    beforeSwap(name, v)
    try casManifest(name, Manifest(v, partitionBy, mapping))
    catch { case e: ConcurrentWriteException =>
      fs.delete(new Path(s"${dataRoot(name)}/$dirId"), true); throw e
    }
    expireSnapshots(name)
    v
  }

  /** Full-snapshot commit (create / replace). Returns the version. */
  def commitFull(df: DataFrame, name: String,
      partitionBy: Seq[String] = Nil): Long =
    commit(name, df, partitionBy, deltaPartitions = false)

  /** Partition-delta commit: only `df`'s partitions get new files;
    * the rest of the new snapshot shares the parent's immutable
    * dirs. Returns the version. */
  def commitPartitions(df: DataFrame, name: String,
      partitionBy: Seq[String]): Long = {
    require(partitionBy.nonEmpty, "commitPartitions needs partition columns")
    commit(name, df, partitionBy, deltaPartitions = true)
  }

  /** Roll the table back to snapshot `v`: a NEW commit whose mapping
    * is `v`'s -- history rolls forward (the bad snapshot stays
    * inspectable until expired), no files move. */
  def rollbackTo(name: String, v: Long): Long = {
    val target = manifestAt(name, v).getOrElse(throw new NoSuchElementException(
      s"$name has no live snapshot $v to roll back to"))
    val head = currentVersion(name)
    val next = Manifest(head + 1, target.partitionBy, target.mapping)
    casManifest(name, next)
    expireSnapshots(name)
    next.version
  }

  /** Rewrite the current snapshot as ONE data dir (a full commit of
    * its own contents) -- collapses a long delta chain, the compaction
    * every manifest-sharing store eventually runs. */
  def compact(name: String): Long = {
    val m = current(name).getOrElse(
      throw new NoSuchElementException(s"no snapshots for $name"))
    commitFull(read(name).localCheckpoint(true), name, m.partitionBy)
  }

  /** Drop snapshots beyond the last `keepSnapshots` and delete data
    * dirs no retained snapshot references. Never touches dirs younger
    * than the expired versions, so an in-flight writer's staged (not
    * yet committed) data is safe. */
  def expireSnapshots(name: String): Unit = {
    val dir = commitsPath(name)
    if (!fs.exists(dir)) return
    val commits = fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.matches("c\\d{8}")).map(_.getPath)
      .sortBy(_.getName)
    if (commits.size <= keepSnapshots) return
    val (expired, retained) = commits.splitAt(commits.size - keepSnapshots)
    val live = retained.flatMap(readManifest).flatMap(_.mapping.map(_._2)).toSet
    val maxExpired = expired.map(_.getName.stripPrefix("c").toLong).max
    val dRoot = new Path(dataRoot(name))
    if (fs.exists(dRoot)) fs.listStatus(dRoot).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        !live(n) && n.matches("v\\d+-.*") &&
          n.drop(1).takeWhile(_.isDigit).toLong <= maxExpired
      }
      .foreach(fs.delete(_, true))
    expired.foreach(fs.delete(_, false))
  }

  /** SQL surface: the current snapshot as a session temp view (a
    * manifest table spans dirs, so it registers as a view rather
    * than a single-location catalog table). */
  def register(name: String): Unit =
    read(name).createOrReplaceTempView(name)

  // WarehouseWrites: UpsertWriter merges through these, so a MERGE
  // against a versioned store is a snapshot commit with rollback.
  def createOrReplace(df: DataFrame, name: String,
      partitionBy: Seq[String]): Unit = { commitFull(df, name, partitionBy); () }

  private[table] def swapIn(df: DataFrame, name: String,
      partitionBy: Seq[String]): Unit = { commitFull(df, name, partitionBy); () }

  def overwritePartitions(df: DataFrame, name: String,
      partitionBy: Seq[String]): Unit = { commitPartitions(df, name, partitionBy); () }

  def drop(name: String): Unit = {
    spark.sql(s"DROP VIEW IF EXISTS `$name`")
    fs.delete(new Path(path(name)), true)
  }
}
