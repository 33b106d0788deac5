package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.util.Dec._

/** Time-series queries over the `events` table — the direct analog of the
  * reference's scan surface:
  *
  *  - s1/p4: partitioned time-range scan with projection (reference
  *    `src/table/scan.rs:62-88`, inclusive bounds) — here a parquet scan
  *    with the ts predicate and column list pushed down to the reader;
  *    Catalyst's partition/row-group pruning replaces the reference's
  *    overlap test + binary-search seek (`src/table/scan.rs:174-248`).
  *  - p5: symbol-membership filter (reference `src/server/ohlcv.rs:21-28,
  *    90-98`) → `isin`.
  *  - a4: OHLCV resampling ticks→bars (reference's agg1m tables,
  *    `tests/main.rs:13-25`; resolution flooring `src/table/write.rs:62-65`)
  *    → tumbling `window()` + min_by/max_by for deterministic open/close.
  *  - a2: the sum/count queries that are the reference's only shipped
  *    aggregates (`tests/main.rs:122-151`).
  */
object Events {

  /** S1+P4: inclusive time-range scan, projected columns only. The range
    * predicate is applied to the RAW nanos column so it pushes into
    * parquet row-group pruning (`ns div 1000 >= F` ⟺ `ns >= F*1000`;
    * `ns div 1000 <= T` ⟺ `ns <= T*1000+999`); filtering the derived
    * timestamp instead would push only IsNotNull and scan everything. */
  def scanRange(spark: SparkSession, dir: String): DataFrame = {
    val fromNs = java.time.LocalDateTime.parse("2024-01-10T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    val toNs = java.time.LocalDateTime.parse("2024-01-20T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L + 999L
    Tables.eventsRawTs(spark, dir)
      .where(col("ts") >= fromNs && col("ts") <= toNs)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  val scanRangeSql: String =
    """SELECT event_id, ts, user_id, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
      |ORDER BY event_id""".stripMargin

  /** S1 via the optimizer rule: the same inclusive range scan, but
    * filtering the DERIVED timestamp column naively —
    * plans.NanosPushdownRule injects the equivalent raw-nanos conjunct so
    * the predicate still reaches parquet row-group pruning (PlanSpec
    * asserts it). Shares s1's oracle: identical results required. */
  def scanDerived(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.NanosPushdownRule.install(spark)
    Tables.events(spark, dir)
      .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
             col("ts") <= lit("2024-01-20 00:00:00").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** P5: symbol-membership filter (isin) + a general predicate (P6). */
  def filterIn(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase") && col("value") > 100.0)
      .select("event_id", "ts", "event_type", "value")
      .orderBy("event_id")

  val filterInSql: String =
    """SELECT event_id, ts, event_type, value
      |FROM events
      |WHERE event_type IN ('click', 'purchase') AND value > 100.0
      |ORDER BY event_id""".stripMargin

  /** A4: resample events into 1-hour OHLCV bars per event_type.
    * open/close use min_by/max_by on event_id (events are generated in ts
    * order, event_id strictly increasing → deterministic first/last; ties
    * impossible on a unique key, unlike ts). Map-side partial agg; the
    * shuffle carries only (bucket, type) groups. */
  def ohlcvResample(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        sumMoney(col("value")).as("volume"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n"))
      .orderBy("bucket", "event_type")

  val ohlcvResampleSql: String =
    s"""SELECT date_trunc('hour', ts) AS bucket, event_type,
       |  min_by(value, event_id) AS open,
       |  max(value) AS high,
       |  min(value) AS low,
       |  max_by(value, event_id) AS close,
       |  ${sqlSumMoney("value")} AS volume,
       |  COUNT(*) AS n
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** COHORT1: weekly retention triangle — users grouped by first-active
    * week (cohort), counted per week offset they were active again. Two
    * aggregations and one join, all keyed on user_id; offsets are exact
    * integer arithmetic (both weeks are Monday-truncated, so the day
    * difference is always a multiple of 7). The classic product-metrics
    * companion to funnel1. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    val active = e.distinct()
    active.join(first, Seq("user_id"))
      .select(col("cohort"),
        expr("CAST(datediff(wk, cohort) div 7 AS BIGINT)").as("offset"),
        col("user_id"))
      .groupBy(col("cohort"), col("offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "offset")
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      |first AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT cohort, CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS offset,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM active JOIN first USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** FUNNEL1: conversion-funnel analysis — per user, the earliest
    * strictly-ordered view -> click -> purchase chain (the sequenced
    * pattern match behind product funnels; a bounded MATCH_RECOGNIZE).
    * Three filtered min-aggregations chained by joins, all keyed on
    * user_id — one shuffle key end to end, linear at any scale. Strict
    * `>` comparisons are safe across engines because event timestamps
    * are µs-aligned (the ns->µs floor is lossless). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.where(col("event_type") === "click").join(v, Seq("user_id"))
      .where(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.where(col("event_type") === "purchase").join(c, Seq("user_id"))
      .where(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy("user_id")
  }

  val funnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |      GROUP BY e.user_id)
      |SELECT v.user_id, t_view, t_click, t_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  /** A12: GAP-FILLED OHLCV bars — the reference's own open TODO
    * (`src/server/ohlcv.rs:56` wants "duration like" dense output; its
    * shipped endpoint emits only non-empty bars). Empty hours get
    * open=high=low=close = forward-filled previous close, volume 0,
    * n 0 — the convention charting frontends expect.
    *
    * Scale shape: the dense grid is span-sized (hours × symbols, a
    * dimension), the left join and the forward-fill window both key on
    * the symbol — so post-aggregation work is bounded by BAR count, not
    * tick count; the only tick-sized stage is the same partial-agg scan
    * a4 runs. Forward-fill is `last(close) IGNORE NULLS` over buckets
    * within each symbol — no global sort, no self-join per gap. */
  def ohlcvDense(spark: SparkSession, dir: String): DataFrame = {
    val bars = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        sumMoney(col("value")).as("volume"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n"))
    val grid = bars.groupBy(col("event_type"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("event_type"),
        explode(sequence(col("b0"), col("b1"), expr("interval 1 hour"))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(bars, Seq("event_type", "bucket"), "left")
      .withColumn("c_ff", last(col("close"), ignoreNulls = true).over(w))
      .select(col("bucket"), col("event_type"),
        coalesce(col("open"), col("c_ff")).as("open"),
        coalesce(col("high"), col("c_ff")).as("high"),
        coalesce(col("low"), col("c_ff")).as("low"),
        coalesce(col("close"), col("c_ff")).as("close"),
        coalesce(col("volume"), lit(0.0)).as("volume"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("bucket", "event_type")
  }

  val ohlcvDenseSql: String =
    s"""WITH bars AS (
       |  SELECT date_trunc('hour', ts) AS bucket, event_type,
       |    min_by(value, event_id) AS open, max(value) AS high,
       |    min(value) AS low, max_by(value, event_id) AS close,
       |    ${sqlSumMoney("value")} AS volume, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |spans AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
       |          FROM bars GROUP BY 1),
       |grid AS (SELECT event_type,
       |           unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
       |         FROM spans),
       |j AS (SELECT g.event_type, g.bucket, b.open, b.high, b.low, b.close,
       |             b.volume, b.n
       |      FROM grid g LEFT JOIN bars b
       |        ON g.event_type = b.event_type AND g.bucket = b.bucket),
       |f AS (SELECT event_type, bucket, open, high, low, close, volume, n,
       |        last_value(close IGNORE NULLS) OVER (PARTITION BY event_type
       |          ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS c_ff
       |      FROM j)
       |SELECT bucket, event_type,
       |  coalesce(open, c_ff) AS open, coalesce(high, c_ff) AS high,
       |  coalesce(low, c_ff) AS low, coalesce(close, c_ff) AS close,
       |  coalesce(volume, 0.0) AS volume, coalesce(n, 0) AS n
       |FROM f ORDER BY bucket, event_type""".stripMargin

  /** A3: the reference's `/ohlcv` endpoint shape (reference
    * `src/server/ohlcv.rs:88-134`): time-range + symbol filter, resample
    * to 1-hour bars, assemble per-symbol time-ordered bar arrays with
    * group min/max ts (Ohlcv.assemble), then posexplode back to flat
    * rows so the DuckDB oracle can hash-compare the assembled ORDER
    * (idx) and the assembly-level aggregates (min_ts/max_ts). The raw
    * ns-range predicate pushes to parquet row-group pruning (s1's
    * pattern). */
  def ohlcvAssemble(spark: SparkSession, dir: String): DataFrame = {
    val fromNs = java.time.LocalDateTime.parse("2024-01-05T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    val toNs = java.time.LocalDateTime.parse("2024-01-25T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L + 999L
    val ticks = Tables.eventsRawTs(spark, dir)
      .where(col("ts") >= fromNs && col("ts") <= toNs &&
        col("event_type").isin("click", "view"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val bars = ticks
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        sumMoney(col("value")).as("volume"))
      .select(col("window.start").as("ts"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
    graft.operators.Ohlcv.assemble(bars, "event_type", Seq("click", "view"),
        lit("2024-01-05 00:00:00").cast("timestamp"),
        lit("2024-01-25 00:00:00").cast("timestamp"))
      .select(col("event_type"), col("min_ts"), col("max_ts"),
        posexplode(col("bars")).as(Seq("pos", "bar")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("idx"),
        col("bar.ts").as("t"), col("bar.open").as("open"),
        col("bar.high").as("high"), col("bar.low").as("low"),
        col("bar.close").as("close"), col("bar.volume").as("volume"),
        col("min_ts"), col("max_ts"))
      .orderBy("event_type", "idx")
  }

  val ohlcvAssembleSql: String =
    s"""WITH bars AS (
       |  SELECT date_trunc('hour', ts) AS bts, event_type,
       |    min_by(value, event_id) AS open,
       |    max(value) AS high,
       |    min(value) AS low,
       |    max_by(value, event_id) AS close,
       |    ${sqlSumMoney("value")} AS volume
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
       |    AND ts <= TIMESTAMP '2024-01-25 00:00:00'
       |    AND event_type IN ('click', 'view')
       |  GROUP BY 1, 2)
       |SELECT event_type,
       |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY bts) AS BIGINT) AS idx,
       |  bts AS t, open, high, low, close, volume,
       |  min(bts) OVER (PARTITION BY event_type) AS min_ts,
       |  max(bts) OVER (PARTITION BY event_type) AS max_ts
       |FROM bars
       |ORDER BY event_type, idx""".stripMargin

  /** ST4 batch face: gap-based session windows per user — the batch
    * expression of streaming/Ingest.sessionize, so the streaming
    * semantics get an oracle gate. A session closes after 6 idle hours
    * (`session_window`); its end is last_event + gap, exactly Spark's
    * merged-window semantics. The shuffle carries user_id groups and
    * session state is bounded per user — at 100 TB this is one shuffle
    * + sorted within keys, no global sort. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val sessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), s AS (
       |  SELECT user_id, ts, value,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM e
       |)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL '6 hours' AS session_end,
       |  count(*) AS n_events, ${sqlSumMoney("value")} AS sum_value
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** A2: the reference's sum/count shape (`tests/main.rs:122-151`) on
    * events: per-type totals. */
  def sumCount(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sumMoney(col("value")).as("sum_value"),
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  val sumCountSql: String =
    s"""SELECT event_type,
       |  ${sqlSumMoney("value")} AS sum_value,
       |  COUNT(*) AS n,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** TS1: per-user EWMA of `value` over time (α=0.25 — exact binary, so
    * the double recurrence is bit-identical in any IEEE engine) — the
    * recursive per-series fold no SQL window expresses, run as
    * operators.TimeSeries' one-shuffle sorted fold. The oracle replays
    * the recurrence with a recursive CTE, so per-series ordering, state
    * carry-over, and series isolation are all hash-gated. */
  def ewmaValue(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.ewma(
      Tables.events(spark, dir)
        .where(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("ts"), col("value")),
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
      valCol = "value", alpha = 0.25)
      .select(col("user_id"), col("event_id"), round(col("ewma"), 6).as("ewma_r"))
      .orderBy("user_id", "ts", "event_id")

  /** TS2: tick-rule trade classification (the Lee–Ready tick test) —
    * +1 on an uptick, −1 on a downtick, and a ZERO-TICK CARRIES the
    * last known direction: the classic lag + last-IGNORE-NULLS window
    * composition over per-symbol time order (one key shuffle, state
    * inside the window frame). Null until a first price change exists. */
  def tickRule(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(col("value"), 1).over(w)
    val tick = when(prev.isNull, lit(null).cast("int"))
      .when(col("value") > prev, lit(1))
      .when(col("value") < prev, lit(-1))
      .otherwise(lit(null).cast("int"))
    Tables.events(spark, dir)
      .where(col("user_id") < 50)
      .withColumn("dir", last(tick, ignoreNulls = true).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("dir"))
      .orderBy("event_id")
  }

  val tickRuleSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN lag(value) OVER w IS NULL THEN NULL
      |         WHEN value > lag(value) OVER w THEN 1
      |         WHEN value < lag(value) OVER w THEN -1 END AS tick
      |  FROM events WHERE user_id < 50
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |  CAST(last_value(tick IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS INTEGER) AS dir
      |FROM t ORDER BY event_id""".stripMargin

  val ewmaValueSql: String =
    """WITH RECURSIVE s AS (
      |  SELECT user_id, event_id, value,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
      |  FROM events WHERE user_id < 20),
      |e AS (
      |  SELECT user_id, event_id, value, rn, value AS ewma FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.event_id, s.value, s.rn,
      |         0.25 * s.value + 0.75 * e.ewma
      |  FROM s JOIN e ON s.user_id = e.user_id AND s.rn = e.rn + 1)
      |SELECT user_id, event_id, round(ewma, 6) AS ewma_r
      |FROM e ORDER BY user_id, rn""".stripMargin

  /** SKEW3: ts1's recursive EWMA fold with every even user collapsed to
    * user 0 — one series owns ~half the rows. The fold is O(n) state
    * O(1) per key, so a hot series costs one long sequential chain in
    * one task; the bench row next to ts1 keeps that visible. */
  def ewmaValueHot(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.ewma(
      Tables.events(spark, dir)
        .where(col("user_id") < 40)
        .withColumn("user_id",
          when(col("user_id") % 2 === 0, lit(0L)).otherwise(col("user_id")))
        .select(col("user_id"), col("event_id"), col("ts"), col("value")),
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
      valCol = "value", alpha = 0.25)
      .select(col("user_id"), col("event_id"), round(col("ewma"), 6).as("ewma_r"))
      .orderBy("user_id", "ts", "event_id")

  val ewmaValueHotSql: String =
    """WITH RECURSIVE s AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS user_id,
      |    event_id, value,
      |    CAST(row_number() OVER (
      |      PARTITION BY CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END
      |      ORDER BY ts, event_id) AS BIGINT) AS rn
      |  FROM events WHERE user_id < 40),
      |e AS (
      |  SELECT user_id, event_id, value, rn, value AS ewma FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.event_id, s.value, s.rn,
      |         0.25 * s.value + 0.75 * e.ewma
      |  FROM s JOIN e ON s.user_id = e.user_id AND s.rn = e.rn + 1)
      |SELECT user_id, event_id, round(ewma, 6) AS ewma_r
      |FROM e ORDER BY user_id, rn""".stripMargin

  /** SKEW4: funnel1's three-stage min-ts funnel with the same hot-user
    * collapse — the groupBys and joins all key on the skewed id. */
  def funnelHot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("user_id",
        when(col("user_id") % 2 === 0, lit(0L)).otherwise(col("user_id")))
      .select("user_id", "event_type", "ts")
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.where(col("event_type") === "click").join(v, Seq("user_id"))
      .where(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.where(col("event_type") === "purchase").join(c, Seq("user_id"))
      .where(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy("user_id")
  }

  val funnelHotSql: String =
    """WITH h AS (SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS user_id,
      |    event_type, ts FROM events),
      |v AS (SELECT user_id, min(ts) AS t_view FROM h
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM h e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM h e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |      GROUP BY e.user_id)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin
}
