package graft

/** Scratch probe (r15 optimization round): statement-level timing of
  * the s44_transform_dml flow to find where the gate's seconds go.
  * Not part of the suite; run with Test/runMain graft.S44ProbeMain.
  */
object S44ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val m = new graft.PlanDumpListener
      spark.sparkContext.addSparkListener(m)
      val main = Thread.currentThread()
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val samplerName = "s44-probe-sampler"
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
              val key = th.getName.replaceAll("[0-9]+", "N") + ": " +
                e.getClassName + "." + e.getMethodName
              hist.merge(key, 1, (a, b) => a + b)
            }
            if (st.exists(_.getMethodName.contains("encoderFor")) &&
                hist.merge("__dumped", 1, (a, b) => a + b) <= 2)
              println("PROBE FULLSTACK " + th.getName + ":\n  " +
                st.take(60).mkString("\n  "))
          }
          Thread.sleep(20)
        }
      }, samplerName)
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      val r = f
      sampling = false
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(m)
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${m.jobs.get}%d stages=${m.stages.get}%d tasks=${m.tasks.get}%d")
      import scala.jdk.CollectionConverters._
      hist.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (k, n) =>
        println(s"PROBE   $tag frame $n x $k")
      }
      r
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    (1 to 2).foreach { run =>
      val e = graft.core.Tables.events(spark, dir).select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("value"))
      e.createOrReplaceTempView("s44_src")
      val root = java.nio.file.Files.createTempDirectory("graft-probe-s44").toString
      val cat = "gp" + run
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.table.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      t(s"run$run:create")(spark.sql(
        s"""CREATE TABLE $cat.default.ev
            (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
             event_type STRING, value DECIMAL(18,6))
            PARTITIONED BY (days(ts))"""))
      t(s"run$run:insert")(spark.sql(
        s"INSERT INTO $cat.default.ev SELECT * FROM s44_src"))
      t(s"run$run:delete")(spark.sql(
        s"DELETE FROM $cat.default.ev WHERE user_id % 97 = 3"))
      t(s"run$run:update")(spark.sql(
        s"""UPDATE $cat.default.ev SET event_type = 'redacted'
            WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'"""))
      t(s"run$run:select")(spark.sql(
        s"""SELECT CAST(ts AS DATE) AS day, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS users,
                   CAST(sum(CAST(value * 1000000 AS BIGINT)) AS BIGINT)
                     AS val_micros
            FROM $cat.default.ev
            GROUP BY CAST(ts AS DATE), event_type""").collect())
    }
    spark.stop()
  }
}
