package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Diagnostic main: print a gated query's FINAL physical plan (after
  * AQE re-optimization, which `.explain` on an un-executed frame does
  * not show) plus its wall time, for any registered `SparkEntry`
  * query against any table directory.
  *
  * This exists because plan-shape regressions at scale are invisible
  * in the correctness gate (a broadcast that silently flips to a
  * shuffle join returns identical rows, 2x slower) and `.explain`
  * before execution shows only AQE's INITIAL plan. PlanSpec pins the
  * load-bearing shapes in CI; this tool is for interactive "what did
  * AQE actually pick at THIS data size" forensics -- e.g. the r15
  * 10x/30x TPC-H scale probes.
  *
  * Usage: runMain graft.PlanDump <sfDir> <name>[,<name>...] [--formatted]
  *
  * `--formatted` additionally prints `.explain("formatted")` (the
  * operator-numbered layout with PushedFilters/ReadSchema details) --
  * the representation the r15 optimization round's before/after plan
  * records under plans/r15/ use.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val formatted = args.length > 2 && args(2) == "--formatted"
    val spark = core.Sessions.local()
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      // job/stage/shuffle totals over the whole query (construction +
      // collect): for the iterative operators (CC, PageRank, BFS,
      // perceptron) the final frame is just a checkpoint scan, so the
      // honest before/after evidence is how many stages ran and how
      // many bytes the loop shuffled, not the final explain tree.
      val metrics = new PlanDumpListener
      spark.sparkContext.addSparkListener(metrics)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.collect().length
      val ms = (System.nanoTime() - t0) / 1e6
      // listener events are async; a short drain keeps the totals
      // complete without reaching into the private listener bus
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(metrics)
      println(s"=== $name @ $sfDir: $n rows, ${ms.round} ms")
      println(f"--- $name totals: jobs=${metrics.jobs.get}%d " +
        f"stages=${metrics.stages.get}%d tasks=${metrics.tasks.get}%d " +
        f"shuffleReadMB=${metrics.shuffleRead.get / 1e6}%.1f " +
        f"shuffleWriteMB=${metrics.shuffleWrite.get / 1e6}%.1f")
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan // post-AQE final
        case p => p
      }
      println(plan.toString)
      if (formatted) {
        println(s"--- $name explain(formatted):")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}

/** Accumulates job/stage/task counts and shuffle bytes across every
  * job a PlanDump query runs (iterative operators run dozens). */
private[graft] class PlanDumpListener
    extends org.apache.spark.scheduler.SparkListener {
  import java.util.concurrent.atomic.AtomicLong
  val jobs = new AtomicLong
  val stages = new AtomicLong
  val tasks = new AtomicLong
  val shuffleRead = new AtomicLong
  val shuffleWrite = new AtomicLong
  override def onJobStart(
      e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
    jobs.incrementAndGet()
  override def onStageCompleted(
      e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    tasks.addAndGet(e.stageInfo.numTasks.toLong)
    shuffleRead.addAndGet(e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
    shuffleWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }
}
