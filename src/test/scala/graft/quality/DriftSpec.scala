package graft.quality

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.table.VersionedTableStore

class DriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def store() = new VersionedTableStore(spark,
    Files.createTempDirectory("graft-drift").toString)

  test("drift report: schema evolution + distribution shifts, side by side") {
    val vs = store()
    vs.commitFull(Seq((1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"))
      .toDF("k", "px", "tag"), "t")
    // v2: tag column dropped, qty added, px range doubled, a NULL k
    val v2df = Seq((Some(1), 10.0, 5L), (Some(2), 60.0, 6L),
      (Option.empty[Int], 30.0, 7L), (Some(4), 40.0, 8L))
      .toDF("k", "px", "qty")
    vs.commitFull(v2df, "t")
    val r = Drift.report(vs, "t", 1, 2)
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r.keySet === Set("k", "px", "tag", "qty"))
    assert(r("tag").getString(1) === "removed")
    assert(r("qty").getString(1) === "added")
    assert(r("k").getString(1) === "kept")
    // counts: count(col) skips the NULL k on the TO side
    assert(r("k").getAs[Long]("from_n") === 3L)
    assert(r("k").getAs[Long]("to_n") === 3L)
    assert(r("k").getAs[Long]("to_nulls") === 1L)
    // removed column has NULL to-side stats; added column NULL from-side
    assert(r("tag").isNullAt(r("tag").fieldIndex("to_n")))
    assert(r("qty").isNullAt(r("qty").fieldIndex("from_n")))
    // value range movement is visible as strings of the casted min/max
    assert(r("px").getAs[String]("from_max").toDouble === 30.0)
    assert(r("px").getAs[String]("to_max").toDouble === 60.0)
  }

  test("retyped column flags; alerts cut to moved columns only") {
    val vs = store()
    vs.commitFull(Seq((1, 100), (2, 200)).toDF("k", "v"), "t")
    vs.commitFull(Seq((1L, 100.0), (2L, 200.0)).toDF("k", "v"), "t")
    val r = Drift.report(vs, "t", 1, 2)
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(r === Map("k" -> "retyped", "v" -> "retyped"))

    // calm table -> zero alerts; nulled-out + shifted -> alerts fire
    val vs2 = store()
    vs2.commitFull((1 to 100).map(i => (i, i.toDouble, s"s$i"))
      .toDF("k", "px", "tag"), "t")
    vs2.commitFull((1 to 100).map(i => (i, i.toDouble, s"s$i"))
      .toDF("k", "px", "tag"), "t")
    assert(Drift.alerts(vs2, "t", 1, 2).isEmpty)
    // v3: 20% of px nulled, values scaled 10x
    vs2.commitFull((1 to 100).map(i =>
        (i, if (i % 5 == 0) None else Some(i * 10.0), s"s$i"))
      .toDF("k", "px", "tag"), "t")
    val alerts = Drift.alerts(vs2, "t", 2, 3)
      .collect().map(_.getString(0)).toSet
    assert(alerts === Set("px"), s"expected only px to alert: $alerts")
  }
}
