package graft

import org.apache.spark.sql.functions._

import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("fragment join equals the naive theta join incl. boundaries and long spans") {
    // intervals in raw micros: points, unit spans, a span covering many
    // buckets, exact-boundary touches; bucket width 10µs forces
    // multi-bucket fragmentation and the report-once path
    val ls = Seq((1L, 0L, 0L), (2L, 5L, 5L), (3L, 9L, 11L), (4L, 0L, 95L), (5L, 42L, 43L))
    val rs = Seq((10L, 0L, 4L), (11L, 5L, 14L), (12L, 11L, 11L), (13L, 90L, 120L), (14L, 44L, 50L))
    def df(xs: Seq[(Long, Long, Long)], id: String, a: String, b: String) =
      xs.toDF("i", "s", "e").select(col("i").as(id),
        timestamp_micros(col("s")).as(a), timestamp_micros(col("e")).as(b))
    val left = df(ls, "lid", "ls", "le")
    val right = df(rs, "rid", "rs", "re")
    val got = Intervals.overlapJoin(left, col("ls"), col("le"),
        right, col("rs"), col("re"), bucketMicros = 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "report-once must not duplicate")
    val naive = ls.flatMap { case (li, s, e) =>
      rs.collect { case (ri, s2, e2) if s <= e2 && s2 <= e => (li, ri) }
    }.toSet
    assert(got.toSet == naive)
  }
}
