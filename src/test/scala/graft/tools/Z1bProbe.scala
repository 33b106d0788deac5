package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probe: phase walls + job/stage counts for the z1b Z-order
  * lifecycle (append -> clustered compact -> pruned scan), so the
  * dominant phase is measured, not guessed. Test scope — a measurement
  * harness, not a runtime surface. Usage:
  *   sbt "Test/runMain graft.tools.Z1bProbe [sfDir] [cpus]"
  */
object Z1bProbe {
  @volatile private var jobs = 0
  @volatile private var stages = 0

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.drop(1).headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(e.jobId)
        if (t0 != 0L)
          println(f"[job] id=${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    })
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).count())

    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs; val s0 = stages; val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s ${dt}%7.3f s  jobs=${jobs - j0}%3d stages=${stages - s0}%3d")
      r
    }

    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      val path = java.nio.file.Files.createTempDirectory("graft_z1b_probe_")
        .toString + "/t"
      val t = graft.sources.ZTable.create(spark, path,
        graft.sources.ZTableSpec(strictOrder = false))
      val ev = phase("load") { graft.Tables.events(spark, sfDir) }
      phase("append") { t.append(ev) }
      phase("compact") { t.compact(clusterBy = Seq("user_id")) }
      phase("scan+agg(noop)") {
        t.scan("2024-01-05 00:00:00", "2024-01-15 23:59:59")
          .where(col("user_id") < 100)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
          .orderBy(col("user_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
