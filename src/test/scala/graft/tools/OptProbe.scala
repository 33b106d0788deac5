package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 optimization probe: phase-level walls + Spark job/stage
  * counts for the fixpoint queries (d7/d9/g3) so per-round overhead is
  * measured, not guessed. Test scope — a measurement harness, not a
  * runtime surface. Usage:
  *   sbt "Test/runMain graft.tools.OptProbe [sfDir] [cpus]"
  */
object OptProbe {
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
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
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    for (rep <- 1 to 2) {
      println(s"== rep $rep ==")
      // d9 decomposition
      val docs = graft.Tables.documents(spark, sfDir)
      val edges = graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.shingles(docs, "doc_id", "text", 3),
        thrNum = 4, thrDen = 5, maxDocFreq = 500)
      phase("d9.mining(noop)") {
        edges.write.format("noop").mode("overwrite").save()
      }
      val comp = phase("d9.componentsStar") {
        graft.operators.Dedup.componentsStar(edges)
      }
      phase("d9.output(noop)") {
        comp.select(col("id").as("member"), col("comp").as("root"))
          .orderBy("member")
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
      val comp2 = phase("d7.components") {
        graft.operators.Dedup.components(edges)
      }
      phase("d7.output(noop)") {
        comp2.select(col("id").as("member"), col("comp").as("root"))
          .orderBy("member")
          .write.format("noop").mode("overwrite").save()
      }
      sweep()
      // g3 decomposition
      val li = graft.Tables.lineitem(spark, sfDir)
        .where(col("l_orderkey") % 200 === 0)
        .select(col("l_orderkey"), col("l_suppkey"))
      val gedges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
        .distinct()
      phase("g3.edges(noop)") {
        gedges.write.format("noop").mode("overwrite").save()
      }
      val core = phase("g3.kcore") {
        graft.operators.Graph.kcore(gedges, k = 5,
          onRound = (r, s) => println(f"[probe]   kcore round $r: ${s}%6.3f s"))
      }
      phase("g3.output(noop)") {
        core.orderBy("id").write.format("noop").mode("overwrite").save()
      }
      sweep()
    }
    spark.stop()
  }
}
