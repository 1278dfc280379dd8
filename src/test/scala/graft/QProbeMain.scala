package graft

/** Scratch probe (r15 optimization round): run a gated query twice
  * with an all-thread stack sampler and print the hot-frame
  * histogram. Test/runMain graft.QProbeMain <name> [dir]
  */
object QProbeMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { run =>
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val samplerName = "q-probe-sampler"
      val sampler = new Thread(() => {
        while (sampling) {
          import scala.jdk.CollectionConverters._
          for ((th, st) <- Thread.getAllStackTraces.asScala
               if th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                 th.getName != samplerName) {
            val interesting = st.find { e =>
              val c = e.getClassName
              !c.startsWith("java.lang.Thread") && !c.startsWith("jdk.") &&
              !c.startsWith("sun.") && !c.startsWith("java.util.concurrent") &&
              !c.startsWith("java.net") && !c.startsWith("io.netty") &&
              !c.startsWith("java.io.FileDescriptor")
            }
            interesting.foreach { e =>
              val grp = th.getName match {
                case n if n.startsWith("Executor task launch") => "task"
                case n => n.replaceAll("[0-9]+", "N")
              }
              hist.merge(grp + ": " + e.getClassName + "." + e.getMethodName,
                1, (a, b) => a + b)
            }
          }
          Thread.sleep(20)
        }
      }, samplerName)
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val n = df.collect().length
      sampling = false
      println(f"PROBE run$run $name ${(System.nanoTime() - t0) / 1e9}%.2f s $n rows")
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2).take(14).foreach { case (k, c) =>
        println(s"PROBE   run$run $c x $k")
      }
    }
    spark.stop()
  }
}
