package graft

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Planted-skew probe for the j5 range-join salting knob (Test scope
  * only; not part of the engine). Builds an events stream where ~60%
  * of all points land in ONE 5-minute time bucket (a retry storm /
  * incident spike), then times the unsalted bucket equi-join against
  * the salted (G=8) plan. The unsalted plan funnels the hot bucket's
  * entire pair workload through one reducer; the salted plan splits it
  * 8 ways at the cost of replicating the window side.
  * Run: sbt "Test/runMain graft.SkewProbeMain". */
object SkewProbeMain {
  def main(args: Array[String]): Unit = {
    // broadcast disabled: as long as the window side fits a broadcast,
    // a hot bucket is ALREADY parallel (every point partition probes
    // the same hash table) and salting only adds replication overhead
    // -- the shape salting exists for is the at-scale one where the
    // window side exceeds broadcast and the join shuffles on the
    // bucket, funneling the hot key through one reducer
    val spark = _root_.graft.core.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import _root_.graft.queries.AnalyticsQueries

    val W = AnalyticsQueries.RangeWindowUs
    val nHot = 600000L
    val nTail = 400000L
    // hot: ids [0, nHot) all inside bucket 0; tail: uniform over 1000
    // buckets. Every ~100th event is an error (opens a window), so the
    // hot bucket carries ~6000 windows x 600k points = 3.6e9 pair
    // condition evaluations -- enough to bottleneck one reducer.
    val hot = spark.range(nHot).select(
      col("id").as("event_id"),
      (col("id") % 97).as("user_id"),
      ((col("id") * 499L) % W).as("ts_us"),
      when(col("id") % 100 === 0, "error").otherwise("click").as("event_type"))
    val tail = spark.range(nTail).select(
      (col("id") + nHot).as("event_id"),
      (col("id") % 97).as("user_id"),
      (lit(W) * (col("id") % 1000 + 10) + (col("id") * 7919L) % W).as("ts_us"),
      when(col("id") % 100 === 0, "error").otherwise("click").as("event_type"))
    val ev = hot.unionByName(tail).localCheckpoint(true)
    println(s"[skew] events=${ev.count()}, hot-bucket share=" +
      f"${ev.filter(col("ts_us") < W).count().toDouble / ev.count()}%.2f")

    def time(label: String)(df: DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[skew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      n
    }
    // warmup both shapes on a slice, then measure best-of-2
    time("warmup unsalted")(AnalyticsQueries.j5RangeJoinOf(ev.limit(50000)))
    time("warmup salted")(AnalyticsQueries.j5RangeJoinOf(ev.limit(50000), 8))
    def bestOf2(label: String)(mk: => DataFrame): (Double, Long) = {
      val samples = for (_ <- 1 to 2) yield {
        val t0 = System.nanoTime()
        val n = mk.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = samples.map(_._1).min
      println(f"[skew] $label: best-of-2 $best%.2f s (${samples.head._2} rows)")
      (best, samples.head._2)
    }
    // (a) AQE skew-join ACTIVE (batch default): does AQE already split
    // the hot bucket of the shuffled join?
    val (aqeT, n0) = bestOf2("unsalted, AQE skew-join on")(
      AnalyticsQueries.j5RangeJoinOf(ev))
    // (b)/(c) skew-join OFF -- the shape a Structured Streaming join
    // (no AQE) or a shuffled-hash path lives in
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (plainT, n1) = bestOf2("unsalted, skew-join off")(
      AnalyticsQueries.j5RangeJoinOf(ev))
    val (saltT, n8) = bestOf2("salted G=8, skew-join off")(
      AnalyticsQueries.j5RangeJoinOf(ev, 8))
    require(n0 == n1 && n1 == n8, s"row counts diverged: $n0 / $n1 / $n8")
    println(f"[skew] RESULT: aqe-skew $aqeT%.2f s, no-aqe unsalted $plainT%.2f s, " +
      f"no-aqe salted $saltT%.2f s (salting speedup w/o AQE: ${plainT / saltT}%.1fx)")
    spark.stop()
  }
}
