package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's tail-capture contract (no Spark session needed): the
  * driver that grades each round keeps only the LAST ~2000 chars of the
  * bench's stdout, so the FINAL printed line must (a) always fit that
  * window, (b) parse as standalone JSON, and (c) name every failed
  * query with enough of its message to diagnose without the full log —
  * the r8 artifact showed n_errors=1 with no way to tell which query
  * broke or why. */
class BenchSpec extends AnyFunSuite {

  // a scala.util.parsing-free JSON sanity check: balanced braces outside
  // strings, no raw control chars, and key extraction by regex is enough
  // for lines this code itself generates
  private def parseKeys(line: String): Map[String, String] = {
    assert(line.startsWith("{") && line.endsWith("}"), line.take(80))
    "\"([a-z][a-z0-9_]*)\":".r.findAllMatchIn(line).map(_.group(1)).toSet
      .map((k: String) => k -> "").toMap
  }

  private def mkResults(n: Int): Seq[(String, Option[Double])] =
    (1 to n).map(i => f"q${i}%03d_some_query_name" -> Some(i * 0.123))

  test("clean 171-query run: final line fits the tail window and carries the summary") {
    val lines = Bench.outputLines(mkResults(171), Map.empty,
      "/root/testdata/sf0.1", "32", 3, cal0Sec = 1.234)
    // first line is the complete map (for the log), final line the
    // bounded summary the driver parses
    assert(lines.size > 2)
    val fin = lines.last
    assert(fin.length <= 1700, s"final line ${fin.length} chars")
    val keys = parseKeys(fin)
    for (k <- Seq("metric", "value", "cal0", "n_queries", "n_errors", "errors",
                  "queries_slowest", "sf", "cpus", "reps"))
      assert(keys.contains(k), s"final line missing $k")
    assert(fin.contains(""""n_errors":0"""))
    assert(fin.contains(""""errors":{}"""))
    // the calibration probe rides BOTH the full line and the tail line
    // (merge_baseline.py reads it per pass) and is never in the total
    assert(lines.head.contains(""""cal0":1.234"""))
    assert(fin.contains(""""cal0":1.234"""))
    assert(fin.contains(""""value":""") && !fin.contains(""""value":1.234"""))
  }

  test("failed queries ride the final line by NAME with a truncated message") {
    val results = mkResults(171).map {
      case (k, _) if k == "q042_some_query_name" => k -> None
      case kv => kv
    }
    val boom = "requirement failed: merge: source columns [a,b] differ " +
      "from table columns [a,b,c] " + ("x" * 300)
    val lines = Bench.outputLines(results,
      Map("q042_some_query_name" -> boom), "/root/testdata/sf0.1", "32", 3)
    val fin = lines.last
    assert(fin.length <= 1900, s"final line ${fin.length} chars")
    assert(fin.contains(""""n_errors":1"""))
    assert(fin.contains("\"q042_some_query_name\":\"requirement failed"))
    // message truncated to 120 chars — the x-padding must NOT survive
    assert(!fin.contains("x" * 130))
    // the failed query's timing slot is null in the full map (first line)
    assert(lines.head.contains("\"q042_some_query_name\":null"))
  }

  test("worst case: every query failing still yields a single bounded final line") {
    val results = mkResults(40).map { case (k, _) => k -> None }
    val errs = results.map { case (k, _) =>
      k -> ("analysis: " + ("m" * 500)) }.toMap
    val lines = Bench.outputLines(results, errs, "/sf", "32", 3)
    val fin = lines.last
    assert(fin.contains(""""n_errors":40"""))
    assert(fin.startsWith("{") && fin.endsWith("}"))
    assert(!fin.contains("m" * 130))
    // named errors cap at 6 + a truncation marker, so the final line
    // never outgrows the tail window no matter how many queries fail
    assert(fin.length <= 2000, s"final line ${fin.length} chars")
    assert(fin.contains("\"_truncated\":\"+34 more\""))
  }

  test("pathological error content: escaped tail stays bounded and valid JSON") {
    // control chars escape to \uXXXX (6x expansion) — the 120-char cap
    // must apply AFTER escaping or six such messages overrun the window
    val results = mkResults(171).map { case (k, _) => k -> None }
    val errs = results.take(8).map { case (k, _) =>
      k -> ("\u0001\u0002" * 200 + "\\" * 5 + "\"quoted\"") }.toMap
    val lines = Bench.outputLines(results, errs, "/sf", "32", 3)
    val fin = lines.last
    assert(fin.length <= 2000, s"final line ${fin.length} chars")
    // the cap must never cut mid-escape — EVERY emitted line still
    // parses as JSON (jackson ships with Spark)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.foreach(l => om.readTree(l))
    val tail = om.readTree(fin)
    assert(tail.get("n_errors").asInt == 8)
    assert(tail.get("errors").size == 7) // 6 named + _truncated marker
  }

  test("cal0 probe actually EXECUTES under the session's ANSI posture") {
    // The outputLines tests never run the workload; the first cal0
    // definition shipped with a raw splitmix multiply that threw
    // ARITHMETIC_OVERFLOW under Spark 4's ANSI default and killed
    // every bench pass at the probe. This executes the real thing.
    val spark = SparkSpec.session
    val wall = Bench.cal0(spark)
    assert(wall > 0.0 && wall < 120.0, f"cal0 wall $wall%.2f s")
  }

  test("small result sets short-circuit: full line doubles as the final line") {
    val lines = Bench.outputLines(mkResults(5), Map.empty, "/sf", "8", 1,
      cal0Sec = 0.987)
    assert(lines.size == 2 && lines.head == lines.last)
    assert(lines.head.contains(""""queries":{"""))
    assert(lines.head.contains(""""cal0":0.987"""))
  }
}
