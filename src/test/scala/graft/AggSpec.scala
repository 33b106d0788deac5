package graft

import graft.queries.Relational

/** Sketch-aggregate sanity: HLL++ estimates must land within the
  * configured relative error of the exact distinct counts. */
class AggSpec extends SparkSpec {

  test("approx_count_distinct is within 10% of exact per group") {
    val approx = Relational.approxDistinct(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Relational.distinctAgg(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (p, s)) <- approx) {
      val (pe, se) = exact(k)
      assert(math.abs(p - pe).toDouble / pe < 0.10, s"$k parts: $p vs $pe")
      assert(math.abs(s - se).toDouble / se < 0.10, s"$k supps: $s vs $se")
    }
  }
}
