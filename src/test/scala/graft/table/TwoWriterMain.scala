package graft.table

import org.apache.spark.sql.SparkSession

/** Subprocess entry for [[CrossProcessCommitSpec]]: one REAL JVM
  * writer hammering a shared store root. Each iteration commits a
  * single disjoint partition (a delta commit — data never conflicts,
  * so every contention is a pure manifest-CAS race) and retries on
  * [[ConcurrentWriteException]] the way a real caller would. The
  * point of being a separate PROCESS: the in-JVM race specs
  * (CommitRaceSpec-style) serialize some interleavings through shared
  * JVM state; two processes exercise the filesystem's actual
  * create-no-overwrite / link(2) semantics with zero shared memory —
  * the closest local approximation of the driver-box fs suspect.
  *
  * argv: root writerId commits. Exits 0 on success; prints one line
  * `writer=<id> committed=<n> casRetries=<k>` for the spec to parse.
  */
object TwoWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-two-writer-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vs = new VersionedTableStore(spark, root)
    var retries = 0
    (0 until n).foreach { i =>
      val df = Seq((s"$writerId$i", i.toLong)).toDF("p", "v")
      var done = false
      var attempts = 0
      while (!done) {
        try {
          vs.commitPartitions(df, "t", Seq("p"))
          done = true
        } catch {
          case _: ConcurrentWriteException =>
            retries += 1
            attempts += 1
            require(attempts < 200, s"writer $writerId livelocked at $i")
        }
      }
    }
    // println is the probe's reporting channel to the parent spec
    println(s"writer=$writerId committed=$n casRetries=$retries")
    spark.stop()
  }
}
