package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

object PlanCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val captured = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        captured.add((f, qe.executedPlan.toString))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val path = java.nio.file.Files.createTempDirectory("graft_plancap_").toString + "/t"
    val t = graft.sources.ZTable.create(spark, path,
      graft.sources.ZTableSpec(strictOrder = false))
    t.append(graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val n = t.compact(clusterBy = Seq("user_id"))
    Thread.sleep(3000)
    println(s"[cap] rewritten=$n plans=${captured.size}")
    import scala.jdk.CollectionConverters._
    captured.asScala.zipWithIndex.foreach { case ((f, p), i) =>
      println(s"[cap] --- plan $i func=$f len=${p.length} hasShift=${p.contains("shiftleft")} hasZ=${p.contains("z__")}")
      println(p.linesIterator.take(12).map("[cap]   " + _).mkString("\n"))
    }
    spark.stop()
  }
}
