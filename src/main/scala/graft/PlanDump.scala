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
  * Usage: runMain graft.PlanDump <sfDir> <name>[,<name>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = core.Sessions.local()
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val n = df.collect().length
      val ms = (System.nanoTime() - t0) / 1e6
      println(s"=== $name @ $sfDir: $n rows, ${ms.round} ms")
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan // post-AQE final
        case p => p
      }
      println(plan.toString)
    }
    spark.stop()
  }
}
