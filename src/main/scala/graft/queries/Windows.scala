package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.operators.AsOfJoin
import graft.util.Dec._

/** Window functions (SURVEY.md §2.5 — absent from the reference, implied
  * by its time-series domain) and the as-of join built on one shuffle.
  *
  * Determinism notes: every window ORDER BY includes a unique tiebreak
  * key; windowed sums go through DECIMAL so frame-order (Spark) vs
  * segment-tree (DuckDB) evaluation cannot diverge.
  */
object Windows {

  /** W1: ranking — top-3 orders per customer by price. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** W2: lag/lead — per-user deltas between consecutive events. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select("event_id", "user_id", "value", "prev_value", "next_type")
      .orderBy("event_id")
  }

  val windowLagSql: String =
    """SELECT event_id, user_id, value,
      |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
      |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** W3: moving frame — 7-day trailing revenue over daily totals. Two-level:
    * daily pre-agg shrinks the window input to ~one row per day, so the
    * window itself is driver-cheap even at 100 TB of raw events. */
  def windowMoving(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("rev"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("rev7", sum(col("rev")).over(w).cast(DoubleType))
      .select(col("day"), col("rev").cast(DoubleType).as("rev"), col("rev7"))
      .orderBy("day")
  }

  val windowMovingSql: String =
    s"""WITH daily AS (
       |  SELECT date_trunc('day', ts) AS day,
       |         SUM(${sqlDec2("value")}) AS rev
       |  FROM events GROUP BY 1)
       |SELECT day, CAST(rev AS DOUBLE) AS rev,
       |  CAST(SUM(rev) OVER (ORDER BY day
       |       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7
       |FROM daily
       |ORDER BY day""".stripMargin

  /** W4: sliding-window resample — 1-hour windows every 15 minutes (the
    * reference's literal TODO, `src/server/ohlcv.rs:56` "duration like
    * 5Minutes"). Each event lands in 4 overlapping windows; the oracle
    * reconstructs the same assignment with an explicit series unnest. */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  val slidingWindowSql: String =
    s"""SELECT time_bucket(INTERVAL 15 MINUTE, ts) - i * INTERVAL 15 MINUTE AS w_start,
       |  event_type, COUNT(*) AS n, ${sqlSumMoney("value")} AS sum_value
       |FROM events, UNNEST(range(0, 4)) t(i)
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** W5: distribution window functions — ntile/percent_rank/cume_dist/
    * first_value/nth_value, the remaining SQL-standard window family
    * (w1-w4 cover ranking, offset, frames, and time windows). Unique
    * tiebreak in the window order keeps every function deterministic;
    * percent_rank and cume_dist are integer-ratio doubles, so both
    * engines compute identical values with no rounding needed. */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("qtile", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("cheapest", first_value(col("o_orderkey")).over(w))
      .withColumn("second", nth_value(col("o_orderkey"), 2).over(w))
      .select("o_orderkey", "o_orderpriority", "qtile", "pr", "cd",
        "cheapest", "second")
      .orderBy("o_orderkey")
  }

  val windowDistributionSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS qtile,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd,
      |  FIRST_VALUE(o_orderkey) OVER w AS cheapest,
      |  NTH_VALUE(o_orderkey, 2) OVER w AS second
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** J6: as-of join — each purchase matched to the same user's latest
    * click at-or-before it (operators.AsOfJoin: one shuffle, no blowup). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val clicks = e.where(col("event_type") === "click")
      .select("event_id", "ts", "user_id", "value")
    AsOfJoin.asof(purchases, clicks,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightCols = Seq("value"), rightTiebreak = "event_id", prefix = "click_")
      .orderBy("event_id")
  }

  /** J8: the same as-of join through the NATIVE custom operator
    * (plans.AsOfJoinNode/Exec) — per-partition merge join over
    * co-partitioned sorted children. Shares j6's oracle: the two
    * implementations must agree bit-for-bit. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("click_user"), col("value").as("click_value"))
    graft.plans.AsOfJoinNative.asof(purchases, clicks,
        leftKey = "user_id", rightKey = "click_user",
        leftTs = "ts", rightTs = "click_ts", rightTie = "click_id")
      .select("event_id", "ts", "user_id", "value", "click_ts", "click_value")
      .orderBy("event_id")
  }

  /** J11: as-of join with a STALENESS TOLERANCE — the reference-domain
    * "quote must be at most N old to price this trade" bound. Same
    * single-shuffle plan as j6; matches older than 3 days null out.
    * The oracle adds the freshness predicate inside the LATERAL. */
  def asofJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val clicks = e.where(col("event_type") === "click")
      .select("event_id", "ts", "user_id", "value")
    AsOfJoin.asof(purchases, clicks,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightCols = Seq("value"), rightTiebreak = "event_id", prefix = "click_",
        toleranceMicros = Some(3L * 86400L * 1000000L))
      .orderBy("event_id")
  }

  val asofJoinToleranceSql: String =
    """WITH p AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.ts, p.user_id, p.value,
      |       cb.click_ts, cb.click_value
      |FROM p LEFT JOIN LATERAL (
      |  SELECT c.ts AS click_ts, c.value AS click_value
      |  FROM c
      |  WHERE c.user_id = p.user_id AND c.ts <= p.ts
      |    AND c.ts >= p.ts - INTERVAL 3 DAYS
      |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
      |) cb ON TRUE
      |ORDER BY p.event_id""".stripMargin

  /** W6: trailing TIME-RANGE window — per-user 7-day trailing spend
    * (RANGE frame over event time, not a rows frame: ragged tick
    * spacing means "last N rows" ≠ "last N days"). Spark ranges over
    * unix_micros so the inclusive bounds match DuckDB's INTERVAL frame
    * exactly; the sum runs in DECIMAL (order-independent). */
  def trailingRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-7L * 86400L * 1000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("trail7",
        sum(col("value").cast("decimal(12,2)")).over(w).cast("double"))
      .select("event_id", "user_id", "trail7")
      .orderBy("event_id")
  }

  val trailingRangeSql: String =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail7
      |FROM events ORDER BY event_id""".stripMargin

  val asofJoinSql: String =
    """WITH p AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.ts, p.user_id, p.value,
      |       cb.click_ts, cb.click_value
      |FROM p LEFT JOIN LATERAL (
      |  SELECT c.ts AS click_ts, c.value AS click_value
      |  FROM c
      |  WHERE c.user_id = p.user_id AND c.ts <= p.ts
      |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
      |) cb ON TRUE
      |ORDER BY p.event_id""".stripMargin

  /** SKEW2: j6's as-of join under a PATHOLOGICALLY HOT KEY — every even
    * user collapses to user 0, so one key owns ~50% of both sides (the
    * null-ish-default-symbol scenario at 100 TB). Same operator, same
    * oracle shape; the bench row sits next to j6's so a skew-induced
    * blowup is immediately visible round over round. As-of cost per key
    * is O(n log n) sort + linear merge, so the hot key bounds the
    * stage at ~half the table sorted in one task — tolerable here and
    * the reason SkewSpec also gates wall-time vs the uniform run. */
  def asofJoinHot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("user_id",
        when(col("user_id") % 2 === 0, lit(0L)).otherwise(col("user_id")))
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val clicks = e.where(col("event_type") === "click")
      .select("event_id", "ts", "user_id", "value")
    AsOfJoin.asof(purchases, clicks,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightCols = Seq("value"), rightTiebreak = "event_id", prefix = "click_")
      .orderBy("event_id")
  }

  val asofJoinHotSql: String =
    """WITH h AS (SELECT event_id, ts,
      |    CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS user_id,
      |    value, event_type FROM events),
      |  p AS (SELECT event_id, ts, user_id, value FROM h WHERE event_type = 'purchase'),
      |  c AS (SELECT event_id, ts, user_id, value FROM h WHERE event_type = 'click')
      |SELECT p.event_id, p.ts, p.user_id, p.value,
      |       cb.click_ts, cb.click_value
      |FROM p LEFT JOIN LATERAL (
      |  SELECT c.ts AS click_ts, c.value AS click_value
      |  FROM c
      |  WHERE c.user_id = p.user_id AND c.ts <= p.ts
      |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
      |) cb ON TRUE
      |ORDER BY p.event_id""".stripMargin
}
