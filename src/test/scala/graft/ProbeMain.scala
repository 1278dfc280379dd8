package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Throwaway local profiling/plan harness (Test scope only; not part
  * of the engine). Run: sbt "Test/runMain graft.ProbeMain". */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def show(label: String)(df: DataFrame): Unit = {
      println(s"\n================ $label ================")
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(6000))
    }

    // r4: containment bottom-k join
    show("dedup_containment")(_root_.graft.ops.DedupOps.dedupContainment(spark, dir))

    // r5 gates vs r6 benched production ops
    show("s15 gate (oracle)")(
      _root_.graft.queries.AnalyticsQueries.s15TableStatsApproxGate(spark, dir))
    show("s15 production (benched)")(
      _root_.graft.queries.AnalyticsQueries.s15TableStatsApprox(spark, dir))
    show("a4 production (benched)")(
      _root_.graft.queries.AnalyticsQueries.a4PercentilesApprox(spark, dir))

    // r5/r6: versioned store -- manifest-fanned load, partition pruning
    val base = java.nio.file.Files.createTempDirectory("probe-vstore").toString
    val vs = new _root_.graft.table.VersionedTableStore(spark, base)
    import spark.implicits._
    vs.commitFull(Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "day"),
      "pt", Seq("day"))
    vs.commitPartitions(Seq((3, "c", "d3")).toDF("k", "v", "day"), "pt", Seq("day"))
    show("versioned read + day filter (2-dir fan)")(
      vs.read("pt").filter(col("day") === "d3"))

    // r5: validation history write path reads back
    show("validation history scan")({
      val store = new _root_.graft.table.TableStore(spark, s"$base/wh")
      val log = new _root_.graft.quality.ValidationLog(store)
      log.record(_root_.graft.quality.ValidationRun("r1", "t1"), "d",
        Seq("s" -> Seq(_root_.graft.quality.RuleResult("NotNull", "x", passed = true, 0, 1))))
      log.failures
    })

    spark.stop()
  }
}
