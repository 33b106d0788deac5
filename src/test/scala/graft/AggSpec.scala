package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Sketch-aggregate sanity: HLL++ estimates must land within the
  * configured relative error of the exact distinct counts. */
class AggSpec extends SparkSpec {

  test("bottom-k quantile sketch: lossless merge on any split, exact at n <= k") {
    import graft.functions.BottomKSketch
    val sk = BottomKSketch(8)
    val rows = (1L to 30L).map(i => (f"${(i * 7) % 30}%02d-$i", i, i * 1.5))
    val whole = sk.finish(rows.foldLeft(sk.zero)(sk.reduce))
    for (cut <- Seq(1, 11, 29)) {
      val (a, b) = rows.splitAt(cut)
      val merged = sk.finish(sk.merge(
        a.foldLeft(sk.zero)(sk.reduce), b.foldLeft(sk.zero)(sk.reduce)))
      assert(merged.pri.toSeq == whole.pri.toSeq &&
        merged.id.toSeq == whole.id.toSeq && merged.v.toSeq == whole.v.toSeq,
        s"merge at $cut diverged")
    }
    // n <= k: the sketch IS the data, nearest-rank quantiles are exact
    val wide = BottomKSketch(100)
    val all = wide.finish(rows.take(10).foldLeft(wide.zero)(wide.reduce))
    assert(BottomKSketch.quantile(all, 0.5) == rows.take(10).map(_._3).sorted.apply(4))
    assert(BottomKSketch.quantile(all, 1.0) == rows.take(10).map(_._3).max)
    assert(BottomKSketch.quantile(all, 0.01) == rows.take(10).map(_._3).min)
  }

  test("Percentiles.exactBy bit-equals the percentile() aggregate: ties, odd/even, singletons") {
    // r13 pin: the sort-based order-statistics replacement (a8/a15/dq3)
    // must reproduce the built-in's doubles EXACTLY — including the
    // no-interpolation short-circuits (integral position; equal
    // bracketing keys) whose algebraic blend differs in the last ulp.
    import spark.implicits._
    val rnd = new scala.util.Random(20260817)
    val rows: Seq[(String, java.lang.Double)] = (1 to 4000).map { i =>
      val g = s"g${i % 7}"
      // heavy ties (quantized) + irrational-ish tails + singleton group
      // + scattered nulls (r14: nulls ride the window instead of a
      // pre-filter — non-null order statistics must be unaffected)
      val v: java.lang.Double =
        if (i % 11 == 0) null
        else if (i % 3 == 0) (rnd.nextInt(40) / 4.0)
        else rnd.nextDouble() * 1e6 / 3.0
      (if (i == 1) "solo" else g, v)
    } ++ Seq(("allnull", null: java.lang.Double),
      ("allnull", null: java.lang.Double)) // r14 ADVICE: the degenerate
      // all-null group must SURVIVE with null percentiles, like the
      // built-in and the DuckDB quantile_cont oracle
    val df = rows.toDF("g", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95, "p100" -> 1.0)
    def bits(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None
      else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(i)))
    val ours = graft.functions.Percentiles.exactBy(df, "g", col("v"), ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => bits(r, i + 1))).toMap
    val ref = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.map(_._2).mkString("D,")}D))").as("a"))
      .collect().map { r =>
        val arr = if (r.isNullAt(1)) ps.map(_ => None)
          else r.getSeq[java.lang.Double](1).map(v =>
            Option(v).map(x => java.lang.Double.doubleToRawLongBits(x)))
        r.getString(0) -> arr
      }.toMap
    assert(ours.keySet == ref.keySet)
    assert(ours.contains("allnull"))
    for ((g, vs) <- ours; i <- ps.indices)
      assert(vs(i) == ref(g)(i), s"group $g ${ps(i)._1}: ${vs(i)} != ${ref(g)(i)}")
  }

  test("a14 rollup: merged day sketches equal the single-pass sketch (sf0.001)") {
    val r = Relational.quantileRollup(spark, sf001).head
    assert(r.getAs[Boolean]("merge_ok"))
    assert(r.getAs[Long]("n_sample") == 512L)
    assert(r.getAs[Double]("q50_est") <= r.getAs[Double]("q90_est"))
  }

  test("session_window matches an independent gaps-and-islands formulation (sf0.001)") {
    // Cross-formulation gate for st5: the session_window operator vs a
    // lag + cumulative-sum island assignment over the same events.
    val events = Tables.events(spark, sf001)
    val got = queries.Events.sessionize(spark, sf001)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy("user_id").orderBy("ts")
    val islands = events
      .withColumn("brk", when(lag(col("ts"), 1).over(w).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >= 6L * 3600 * 1000000, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("session_start"),
        (max(col("ts")) + expr("INTERVAL 6 HOURS")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == islands)
  }

  test("approx_count_distinct is within the 3x-rsd contract per group") {
    // a11 now carries the HLL accuracy contract as in-row flags (the
    // oracle gate); the spec asserts the flags and that the exact
    // counts agree with the independent distinctAgg query.
    val rows = Relational.approxDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} hll_parts_ok false")
      assert(r.getBoolean(4), s"${r.getString(0)} hll_supps_ok false")
    }
    val approxExact = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Relational.distinctAgg(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approxExact == exact)
  }

  test("HLL sketch union is lossless: day-merged estimate == direct estimate") {
    val r = Relational.sketchRollup(spark, sf001).head()
    // hll_ok encodes BOTH union losslessness and the 5% error bound
    assert(r.getAs[Boolean]("hll_ok"),
      s"n_days=${r.getAs[Long]("n_days")} exact=${r.getAs[Long]("exact_users")}")
    assert(r.getAs[Long]("n_days") > 20L)
  }
}
