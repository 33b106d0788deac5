package graft

import org.apache.spark.sql.AnalysisException

import graft.functions.Project

// top-level: nested case classes can't host Spark encoders (Spark 4.1)
case class EventSlim(event_id: Long, value: Double)
case class EventWrong(event_id: Long, no_such_column: String)

class ProjectSpec extends SparkSpec {
  import spark.implicits._

  test("case-class fields drive the select list and prune the scan (P2)") {
    assert(Project.columnsOf[EventSlim] == Seq("event_id", "value"))
    val ds = Project.projectAs[EventSlim](Tables.events(spark, sf001))
    val plan = ds.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // only the declared fields reach the parquet reader
    assert(plan.contains("ReadSchema: struct<event_id:bigint,value:double>"), plan)
    val first = ds.orderBy($"event_id").head
    assert(first.event_id >= 0L)
  }

  test("a field missing from the source is a static analysis error (P3)") {
    intercept[AnalysisException] {
      Project.projectAs[EventWrong](Tables.events(spark, sf001))
    }
  }
}
