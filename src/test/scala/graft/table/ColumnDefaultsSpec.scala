package graft.table

import java.nio.file.Files

import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column DEFAULT values — the Iceberg/Delta initial-default semantic
  * on the versioned store (see [[ColumnDefaults]]): ADD COLUMN ...
  * DEFAULT is metadata-only, pre-add files read the FROZEN existence
  * default (not NULL), post-add files serve stored values verbatim
  * (genuine NULLs included), and SET DEFAULT moves only what future
  * INSERTs fill. Behaviors derived on paper. */
class ColumnDefaultsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new VersionedTableStore(spark,
    Files.createTempDirectory("graft-cd").toString)

  test("pre-add files read the default; post-add NULLs stay NULL") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a"), (2, "b")).toDF("k", "v"), "t",
      partitionBy = Seq("k"))
    vs.addColumnWithDefault("t", "score", IntegerType, "42")
    // metadata-only: same files, old rows materialize 42
    assert(vs.read("t").select("k", "score").as[(Int, Int)].collect()
      .toSeq.sorted === Seq((1, 42), (2, 42)))
    // a post-add commit holds an explicit NULL and a real value:
    // per-file semantics — the NULL must NOT become 42
    vs.commitPartitions(
      Seq((3, "c", Some(7)), (4, "d", None)).toDF("k", "v", "score"),
      "t", Seq("k"))
    assert(vs.read("t").select("k", "score").as[(Int, Option[Int])]
      .collect().toSeq.sortBy(_._1) ===
      Seq((1, Some(42)), (2, Some(42)), (3, Some(7)), (4, None)))
  }

  test("SET DEFAULT moves inserts only; the existence default is frozen") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t", partitionBy = Seq("k"))
    vs.addColumnWithDefault("t", "score", IntegerType, "42")
    vs.setColumnDefault("t", "score", Some("99"))
    // the pre-add file still reads the value promised at ADD time
    assert(vs.read("t").select("score").as[Int].collect().toSeq === Seq(42))
    // a compact materializes defaults into stored values — results
    // identical before and after (the rewrite reads 42, writes 42)
    vs.compact("t")
    assert(vs.read("t").select("score").as[Int].collect().toSeq === Seq(42))
  }

  test("defaults follow a rename; drop column drops the entry") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t", partitionBy = Seq("k"))
    vs.addColumnWithDefault("t", "score", IntegerType, "42")
    vs.renameColumn("t", "score", "quality")
    assert(vs.read("t").select("quality").as[Int].collect().toSeq === Seq(42))
    vs.evolveSchema("t", "k INT, v STRING") // drop quality
    assert(!vs.read("t").columns.contains("quality"))
    // re-adding the NAME is a fresh column: no stale default revives
    vs.evolveSchema("t", "k INT, v STRING, quality INT")
    assert(vs.read("t").select("quality").as[Option[Int]].collect()
      .toSeq === Seq(None))
  }

  test("validation: bad literals and partition columns reject") {
    val vs = fresh()
    vs.commitFull(Seq((1, "a")).toDF("k", "v"), "t", partitionBy = Seq("k"))
    assertThrows[Exception](
      vs.addColumnWithDefault("t", "s", IntegerType, "'not an int'"))
    assertThrows[Exception](
      vs.addColumnWithDefault("t", "s", IntegerType, "rand()"))
    assertThrows[IllegalArgumentException](
      vs.addColumnWithDefault("t", "v", StringType, "'dup'")) // exists
    assertThrows[IllegalArgumentException](
      vs.setColumnDefault("t", "k", Some("5"))) // partition column
  }

  test("SQL surface: CREATE/ADD/SET/DROP DEFAULT, inserts fill, old rows keep") {
    val root = Files.createTempDirectory("graft-cd-sql").toString
    spark.conf.set("spark.sql.catalog.cdc0", "graft.table.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdc0.root", root)
    try {
      // partition column declared LAST: the catalog reports data
      // columns first, partition columns last (the hive-read order),
      // and positional INSERTs resolve against that order
      spark.sql("CREATE TABLE cdc0.default.t " +
        "(v STRING, tier STRING DEFAULT 'bronze', k INT) PARTITIONED BY (k)")
      spark.sql("INSERT INTO cdc0.default.t (k, v) VALUES (1, 'a')")
      spark.sql("INSERT INTO cdc0.default.t VALUES ('b', DEFAULT, 2)")
      spark.sql("INSERT INTO cdc0.default.t VALUES ('c', 'gold', 3)")
      assert(spark.sql("SELECT k, tier FROM cdc0.default.t ORDER BY k")
        .as[(Int, String)].collect().toSeq ===
        Seq((1, "bronze"), (2, "bronze"), (3, "gold")))
      // ADD COLUMN ... DEFAULT: rows 1-3 predate the column
      spark.sql("ALTER TABLE cdc0.default.t ADD COLUMN score INT DEFAULT 10")
      assert(spark.sql("SELECT sum(score) FROM cdc0.default.t")
        .as[Long].head() === 30L)
      // SET DEFAULT: new inserts fill 20, old rows keep reading 10
      spark.sql("ALTER TABLE cdc0.default.t ALTER COLUMN score SET DEFAULT 20")
      spark.sql("INSERT INTO cdc0.default.t (k, v) VALUES (4, 'd')")
      assert(spark.sql("SELECT k, score FROM cdc0.default.t ORDER BY k")
        .as[(Int, Int)].collect().toSeq ===
        Seq((1, 10), (2, 10), (3, 10), (4, 20)))
      // DROP DEFAULT: an omitting insert now writes NULL
      spark.sql("ALTER TABLE cdc0.default.t ALTER COLUMN score DROP DEFAULT")
      spark.sql("INSERT INTO cdc0.default.t (k, v) VALUES (5, 'e')")
      assert(spark.sql("SELECT score FROM cdc0.default.t WHERE k = 5")
        .as[Option[Int]].head() === None)
      // row-level UPDATE over a pre-add partition composes with the
      // existence default (the rewrite materializes it)
      spark.sql("UPDATE cdc0.default.t SET score = score + 1 WHERE k = 1")
      assert(spark.sql("SELECT score FROM cdc0.default.t WHERE k = 1")
        .as[Int].head() === 11)
    } finally {
      spark.conf.unset("spark.sql.catalog.cdc0")
      spark.conf.unset("spark.sql.catalog.cdc0.root")
    }
  }

  test("a transform SOURCE column may carry a DEFAULT; identity still rejects") {
    // days(ts)'s ts is an ordinary DATA column stored in every file —
    // only IDENTITY partition columns live purely in rel paths. The
    // defaulted value must both fill the row and derive the day dir.
    val root = Files.createTempDirectory("graft-cd-transform").toString
    spark.conf.set("spark.sql.catalog.cdct", "graft.table.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdct.root", root)
    try {
      spark.sql("CREATE TABLE cdct.default.ev (k INT, " +
        "ts TIMESTAMP DEFAULT TIMESTAMP '1996-01-02 03:00:00') " +
        "PARTITIONED BY (days(ts))")
      spark.sql("INSERT INTO cdct.default.ev (k) VALUES (1)")
      spark.sql("INSERT INTO cdct.default.ev VALUES " +
        "(2, TIMESTAMP '1996-01-05 00:00:00')")
      assert(spark.sql("SELECT k, CAST(ts AS DATE) FROM cdct.default.ev " +
        "ORDER BY k").as[(Int, String)].collect().toSeq ===
        Seq((1, "1996-01-02"), (2, "1996-01-05")))
      // the defaulted row landed in its derived day dir
      val vs = new VersionedTableStore(spark, root)
      assert(vs.snapshotView("ev", None).entries.map(_._1).toSet ===
        Set("ts_day=1996-01-02", "ts_day=1996-01-05"))
    } finally {
      spark.conf.unset("spark.sql.catalog.cdct")
      spark.conf.unset("spark.sql.catalog.cdct.root")
    }
  }

  test("CREATE TABLE is atomic: a rejected DEFAULT leaves no table behind") {
    // CREATE-time defaults are validated BEFORE the table-creating
    // commit and threaded into it as one manifest CAS — a rejected
    // clause (here: a default on a partition column, whose values
    // come from rel paths) must not leave a live partial-default
    // table that makes the corrected retry hit TableAlreadyExists
    val root = Files.createTempDirectory("graft-cd-atomic").toString
    spark.conf.set("spark.sql.catalog.cdca", "graft.table.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdca.root", root)
    try {
      intercept[Exception] {
        spark.sql("CREATE TABLE cdca.default.t " +
          "(v STRING, k INT DEFAULT 5) PARTITIONED BY (k)")
      }
      // no live table: the corrected CREATE succeeds
      spark.sql("CREATE TABLE cdca.default.t " +
        "(v STRING, tier STRING DEFAULT 'bronze', k INT) PARTITIONED BY (k)")
      // ...as ONE commit (defaults ride the creating manifest)
      assert(spark.sql("SELECT count(*) FROM cdca.default.t.history")
        .head().getLong(0) === 1L)
      spark.sql("INSERT INTO cdca.default.t (v, k) VALUES ('a', 1)")
      assert(spark.sql("SELECT tier FROM cdca.default.t").head()
        .getString(0) === "bronze")
    } finally {
      spark.conf.unset("spark.sql.catalog.cdca")
      spark.conf.unset("spark.sql.catalog.cdca.root")
    }
  }
}
