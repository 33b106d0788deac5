package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Calendar, Fold, Format}
import graft.sources.{ZPartitionBy, ZTable, ZTableSpec}

/** Scalar-function queries (SURVEY.md §2.8), the fold surface (§2.10),
  * introspection (§2.11), and the write-path roundtrip (S5/S6). */
object Scalar {

  /** F5: trading-calendar predicate over the distinct order dates. */
  def calendarQ(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("d"))
      .distinct()
      .withColumn("open", Calendar.isMarketOpenCol(col("d")))
      .orderBy("d")

  /** Oracle: weekday test + the holiday set for 1995-2001 (the orders
    * date range), generated offline from the same reference algorithm. */
  val calendarSql: String =
    """SELECT DISTINCT CAST(o_orderdate AS DATE) AS d,
      |  (isodow(o_orderdate) < 6 AND CAST(o_orderdate AS DATE) NOT IN (
      |   DATE '1995-01-02',DATE '1995-01-16',DATE '1995-02-20',DATE '1995-04-14',
      |   DATE '1995-05-29',DATE '1995-07-04',DATE '1995-09-04',DATE '1995-11-23',
      |   DATE '1995-12-25',DATE '1996-01-01',DATE '1996-01-15',DATE '1996-02-19',
      |   DATE '1996-04-05',DATE '1996-05-27',DATE '1996-07-04',DATE '1996-09-02',
      |   DATE '1996-11-28',DATE '1996-12-25',DATE '1997-01-01',DATE '1997-01-20',
      |   DATE '1997-02-17',DATE '1997-03-28',DATE '1997-05-26',DATE '1997-07-04',
      |   DATE '1997-09-01',DATE '1997-11-27',DATE '1997-12-25',DATE '1998-01-01',
      |   DATE '1998-01-19',DATE '1998-02-16',DATE '1998-04-10',DATE '1998-05-25',
      |   DATE '1998-07-03',DATE '1998-09-07',DATE '1998-11-26',DATE '1998-12-25',
      |   DATE '1999-01-01',DATE '1999-01-18',DATE '1999-02-15',DATE '1999-04-02',
      |   DATE '1999-05-31',DATE '1999-07-05',DATE '1999-09-06',DATE '1999-11-25',
      |   DATE '1999-12-24',DATE '2000-01-03',DATE '2000-01-17',DATE '2000-02-21',
      |   DATE '2000-04-21',DATE '2000-05-29',DATE '2000-07-04',DATE '2000-09-04',
      |   DATE '2000-11-23',DATE '2000-12-25',DATE '2001-01-01',DATE '2001-01-15',
      |   DATE '2001-02-19',DATE '2001-04-13',DATE '2001-05-28',DATE '2001-07-04',
      |   DATE '2001-09-03',DATE '2001-11-22',DATE '2001-12-25')) AS open
      |FROM orders ORDER BY d""".stripMargin

  /** F4: sig-fig currency formatting (reference `src/table/scan.rs:7-34`)
    * — not SQL-expressible; rows-only check, covered by FormatSpec. */
  def currencyQ(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        Format.formatCurrencyCol(col("o_totalprice").cast("float"), 5).as("price_fmt"),
        col("o_totalprice").cast("float").cast("double").as("v"))
      // Oracle gate (t10 TRUE-flag trick): the formatted string is
      // implementation-specific, but two properties are not — it must
      // match the reference's output SHAPE (plain decimal or bare-e
      // scientific), and it must ROUND-TRIP back to the input within
      // sig-fig precision (5 sig figs plain; sigFigs-4 = 1 mantissa
      // decimal ~ 5.2% relative in the >=10^5 scientific branch).
      // FormatSpec pins the exact golden strings; this gate makes the
      // formatter's contract hash-checkable by DuckDB as literal TRUE.
      .select(col("o_orderkey"),
        (col("price_fmt").rlike("^[0-9]+(\\.[0-9]+)?(e[0-9]+)?$") &&
          abs(col("price_fmt").cast("double") - col("v")) <=
            when(col("v") >= 100000d, col("v") * lit(0.052)).otherwise(lit(0.06)))
          .as("fmt_ok"))
      .orderBy("o_orderkey")

  val currencySql: String =
    "SELECT o_orderkey, TRUE AS fmt_ok FROM orders ORDER BY o_orderkey"

  /** F7: JSON extraction from the events props column. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** C1: symbol-dictionary listing (distinct event types). */
  def symbolsQ(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("event_type").as("symbol"))
      .distinct().orderBy("symbol")

  val symbolsSql: String =
    "SELECT DISTINCT event_type AS symbol FROM events ORDER BY symbol"

  /** C2: table first/last ts + row count. */
  def minMaxTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n"))

  val minMaxTsSql: String =
    "SELECT min(ts) AS first_ts, max(ts) AS last_ts, COUNT(*) AS n FROM events"

  /** S6: reference-native-format roundtrip — events written to the
    * per-column little-endian block layout (the reference's actual
    * storage model: one file per column, line-per-symbol dicts) and
    * read back through the graft-native DataSource V2 connector, then
    * hash-compared against DuckDB reading the original parquet. Gates
    * the whole connector path: write, block partitioning, dictionary
    * decode, and the ns->µs ts reconstruction on top. */
  def nativeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_native_q_")
      .toString + "/t"
    graft.sources.GraftNative.write(
      Tables.eventsRawTs(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")),
      tmp)
    spark.read.format("graft-native").load(tmp)
      .select(col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  val nativeRoundtripSql: String =
    """SELECT event_id, ts, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** S6b: NARROW-WIDTH native roundtrip — user_id as a 4-byte i32 and
    * value as a 4-byte f32 (the reference's I32/F32 storage widths, ref
    * src/schema.rs:15 and src/table/read.rs widths), written and read
    * back through graft-native, then aggregated. DuckDB replays the
    * same double→float narrowing with CAST(value AS FLOAT), so the
    * oracle hash-gates that the 4-byte files preserve exactly the
    * narrowed values (both engines widen the identical float back to
    * double for the sum — routed through DECIMAL for order
    * independence). */
  def nativeNarrow(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_narrow_q_")
      .toString + "/t"
    graft.sources.GraftNative.write(
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id").cast("int").as("user_id"),
          col("event_type"), col("value").cast("float").as("value")),
      tmp)
    spark.read.format("graft-native").load(tmp)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("user_id")).cast("long").as("min_user"),
        max(col("user_id")).cast("long").as("max_user"),
        sum(col("value").cast("double").cast("decimal(18,6)"))
          .cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  val nativeNarrowSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(min(CAST(user_id AS INTEGER)) AS BIGINT) AS min_user,
      |  CAST(max(CAST(user_id AS INTEGER)) AS BIGINT) AS max_user,
      |  CAST(SUM(CAST(CAST(CAST(value AS FLOAT) AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** S6c: FULL-WIDTH native roundtrip — every storage width of the
    * reference's type system in one table (ref src/schema.rs:4-20,
    * src/table/read.rs:25-32): i8/u8/i16/u16/i32/u32/i64, a u64 column
    * with values above 2^31, f32/f64, 1-byte (sym8) / 2-byte (sym16) /
    * 4-byte (str) dictionary codes, and a 2-byte MINUTE-RESOLUTION
    * compressed timestamp (ts2@60e9: unsigned minute deltas against the
    * 8-byte per-block min — ref src/schema.rs:141-166,
    * src/table/write.rs:114-120). Row-level hash gate: every value must
    * survive the narrow encodings bitwise; DuckDB recomputes the same
    * derivations from the raw events table. */
  def nativeFullWidth(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fullw_q_")
      .toString + "/t"
    val minuteNs = 60000000000L
    val src = Tables.eventsRawTs(spark, dir).select(
      col("event_id"),
      (expr(s"ts div ${minuteNs}L") * minuteNs).as("ts_m"),
      (col("user_id") % 100).cast("byte").as("i8_v"),
      (col("user_id") % 200).cast("short").as("u8_v"),
      ((col("user_id") * 7) % 20000).cast("short").as("i16_v"),
      (col("user_id") % 60000).cast("int").as("u16_v"),
      col("user_id").cast("int").as("i32_v"),
      ((col("user_id") * 1009L) % 4000000000L).as("u32_v"),
      (col("user_id") * 2147483648L + col("event_id")).as("u64_v"),
      col("value").cast("float").as("f32_v"),
      col("value").as("f64_v"),
      col("event_type").as("sym8_v"),
      concat(col("event_type"), lit("-"),
        (col("user_id") % 300).cast("string")).as("sym16_v"),
      concat(col("event_type"), lit("#"),
        (col("user_id") % 5000).cast("string")).as("str_v"))
    graft.sources.GraftNative.write(src, tmp, Map(
      "ts_m" -> s"ts2@$minuteNs",
      "i8_v" -> "i8", "u8_v" -> "u8", "i16_v" -> "i16", "u16_v" -> "u16",
      "u32_v" -> "u32", "u64_v" -> "u64",
      "sym8_v" -> "sym8", "sym16_v" -> "sym16"))
    spark.read.format("graft-native").load(tmp).orderBy("event_id")
  }

  val nativeFullWidthSql: String =
    """SELECT event_id,
      |  epoch_ns(date_trunc('minute', ts)) AS ts_m,
      |  CAST(user_id % 100 AS TINYINT) AS i8_v,
      |  CAST(user_id % 200 AS SMALLINT) AS u8_v,
      |  CAST((user_id * 7) % 20000 AS SMALLINT) AS i16_v,
      |  CAST(user_id % 60000 AS INTEGER) AS u16_v,
      |  CAST(user_id AS INTEGER) AS i32_v,
      |  CAST((user_id * 1009) % 4000000000 AS BIGINT) AS u32_v,
      |  CAST(user_id * 2147483648 + event_id AS BIGINT) AS u64_v,
      |  CAST(value AS FLOAT) AS f32_v,
      |  value AS f64_v,
      |  event_type AS sym8_v,
      |  event_type || '-' || CAST(user_id % 300 AS VARCHAR) AS sym16_v,
      |  event_type || '#' || CAST(user_id % 5000 AS VARCHAR) AS str_v
      |FROM events ORDER BY event_id""".stripMargin

  /** C2b: first/last-ts + row count answered from the graft-native
    * STATS SIDECARS alone — the reference's "meta answers first/last
    * ts" (ref src/table/meta.rs) made literal through DSv2 aggregate
    * pushdown: after the one-time write, the aggregation opens zero
    * column files. Shares c2's oracle (same values, different path). */
  def nativeMinMax(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_native_c2_")
      .toString + "/t"
    graft.sources.GraftNative.write(
      Tables.eventsRawTs(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value")),
      tmp)
    spark.read.format("graft-native").load(tmp)
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"),
        count(lit(1)).as("n"))
      .select(timestamp_micros(expr("mn div 1000")).as("first_ts"),
        timestamp_micros(expr("mx div 1000")).as("last_ts"), col("n"))
  }

  /** DQ1: declarative data-quality constraints — uniqueness, null/range,
    * and domain-membership rules checked in ONE scan (a single
    * aggregate computes every violation count; stack() unpivots to one
    * row per rule). The expectations gate a pipeline runs before
    * promoting a table: all-zero violations is the passing state, and
    * the oracle proves the counts, not just the verdict. At 100 TB
    * this is one pass + a 4-row result. */
  def constraints(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        (count(lit(1)) - count_distinct(col("event_id"))).as("dup_event_id"),
        sum(when(col("value").isNull || col("value") < 0, 1L).otherwise(0L))
          .as("neg_or_null_value"),
        sum(when(!col("event_type").isin(
          "click", "error", "purchase", "signup", "view"), 1L).otherwise(0L))
          .as("bad_event_type"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("null_ts"))
      .selectExpr("""stack(4,
          'bad_event_type', bad_event_type,
          'dup_event_id', dup_event_id,
          'neg_or_null_value', neg_or_null_value,
          'null_ts', null_ts) AS (rule, violations)""")
      .orderBy("rule")

  val constraintsSql: String =
    """SELECT rule, violations FROM (
      |  SELECT 'dup_event_id' AS rule,
      |    COUNT(*) - COUNT(DISTINCT event_id) AS violations FROM events
      |  UNION ALL SELECT 'neg_or_null_value',
      |    COUNT(*) FILTER (WHERE value IS NULL OR value < 0) FROM events
      |  UNION ALL SELECT 'bad_event_type',
      |    COUNT(*) FILTER (WHERE event_type NOT IN
      |      ('click','error','purchase','signup','view')) FROM events
      |  UNION ALL SELECT 'null_ts',
      |    COUNT(*) FILTER (WHERE ts IS NULL) FROM events)
      |ORDER BY rule""".stripMargin

  /** DQ2: distribution-drift detection — the quality-monitoring op a
    * long-running ingest needs: value-decile histograms of the early
    * vs late half of the time range, compared per bin with a
    * chi-square-style term ((p−q)² / (p+q) over the half-normalized
    * rates). Determinism by construction: bin counts are integers, each
    * term is a fixed arithmetic expression of FOUR integers (no
    * cross-bin float sum, no transcendental), so both engines produce
    * identical doubles — the a13/t10 school, applied to drift. One
    * scan + a bin-sized aggregate at any corpus size. */
  def drift(spark: SparkSession, dir: String): DataFrame = {
    val mid = lit("2024-01-16 00:00:00").cast("timestamp")
    val c = Tables.events(spark, dir)
      .select(floor(col("value") / 10).cast("long").as("bin"),
        when(col("ts") < mid, 1L).otherwise(0L).as("h1"))
      .groupBy("bin")
      .agg(sum(col("h1")).as("n1"), (count(lit(1)) - sum(col("h1"))).as("n2"))
    val t = c.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    c.crossJoin(t)
      .select(col("bin"), col("n1"), col("n2"),
        round(
          ((col("n1") / col("t1") - col("n2") / col("t2")) *
           (col("n1") / col("t1") - col("n2") / col("t2"))) /
            (col("n1") / col("t1") + col("n2") / col("t2")), 6)
          .as("drift_term"))
      .orderBy("bin")
  }

  val driftSql: String =
    """WITH b AS (
      |  SELECT CAST(floor(value / 10) AS BIGINT) AS bin,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS h1
      |  FROM events),
      |c AS (SELECT bin, CAST(SUM(h1) AS BIGINT) AS n1,
      |             CAST(COUNT(*) - SUM(h1) AS BIGINT) AS n2
      |      FROM b GROUP BY bin),
      |t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM c)
      |SELECT bin, n1, n2,
      |  round(((n1 / t.t1 - n2 / t.t2) * (n1 / t.t1 - n2 / t.t2))
      |        / (n1 / t.t1 + n2 / t.t2), 6) AS drift_term
      |FROM c, t ORDER BY bin""".stripMargin

  /** DQ3: ROBUST OUTLIER DETECTION — per-event-type median/MAD scoring
    * (the resistant alternative to mean/stddev z-scores: a few huge
    * values can't drag the threshold toward themselves). A value is an
    * outlier when |v − median| > 3·1.4826·MAD (1.4826 scales MAD to σ
    * under normality). Median and MAD are ROUNDED to 6 dp before the
    * comparison on both sides, so the flag can only disagree if the
    * engines' exact medians differ by ≥ 1e-6 (they interpolate the same
    * order statistic).
    *
    * Scale note: `percentile` here is the EXACT aggregate (per-group
    * value buffering) because the oracle needs exactness; the 100 TB
    * path swaps in `approx_percentile` (mergeable sketch, same plan
    * shape, a14's quantile-sketch story) — the robust-scoring pipeline
    * around it is unchanged: two group-aggs + two broadcast joins of
    * a type-count-sized stats frame, corpus scanned twice. */
  def outliers(spark: SparkSession, dir: String): DataFrame = {
    // NOTE r13: a8/a15 moved to the sort-based functions.Percentiles
    // (big lineitem groups, measured 0.6x); dq3 was tried on it and
    // REVERTED — on events' small per-type groups the window sort costs
    // more than the built-in's value buffer (measured 1.15-1.38x across
    // three boards), and the scaladoc's 100 TB path swaps to
    // approx_percentile anyway, so the local exact aggregate stays.
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med_r"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
    val mad = dev.groupBy("event_type")
      .agg(round(expr("percentile(abs(value - med_r), 0.5)"), 6).as("mad_r"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med_r"), col("mad_r"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med_r")) >
          lit(3.0) * lit(1.4826) * col("mad_r"), 1L).otherwise(0L)).as("n_out"))
      .select(col("event_type"), col("n"), col("med_r"), col("mad_r"), col("n_out"))
      .orderBy("event_type")
  }

  val outliersSql: String =
    """WITH med AS (SELECT event_type, round(median(value), 6) AS med_r
      |             FROM events GROUP BY 1),
      |d AS (SELECT e.event_type, e.value, med_r
      |      FROM events e JOIN med USING (event_type)),
      |mad AS (SELECT event_type, round(median(abs(value - med_r)), 6) AS mad_r
      |        FROM d GROUP BY 1)
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  d.med_r AS med_r, mad.mad_r AS mad_r,
      |  CAST(SUM(CASE WHEN abs(d.value - d.med_r) > 3.0 * 1.4826 * mad.mad_r
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      |FROM d JOIN mad USING (event_type)
      |GROUP BY d.event_type, d.med_r, mad.mad_r
      |ORDER BY event_type""".stripMargin

  /** PROFILE1: one-pass data profile of the fact table (the dataset-card
    * step of a corpus build, and C3's describe extended from schema to
    * data): row count, per-column null counts, min/max, and exact
    * distinct cardinalities. The two exact COUNT(DISTINCT)s make
    * Catalyst Expand the scan 3-way — the honest exact plan; at 100 TB
    * swap them for approx_count_distinct (a11's HLL path) and the
    * profile collapses back to one partial-agg pass. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      count_distinct(col("l_orderkey")).as("d_orderkey"),
      count_distinct(col("l_returnflag")).as("d_returnflag"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))

  val tableProfileSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(DISTINCT l_orderkey) AS d_orderkey,
      |  COUNT(DISTINCT l_returnflag) AS d_returnflag,
      |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      |FROM lineitem""".stripMargin

  /** A1a: typed-Aggregator fold (exact cents accumulator). */
  def foldAggregator(spark: SparkSession, dir: String): DataFrame =
    Fold.aggregatorSum(Tables.lineitem(spark, dir), "l_returnflag", "l_quantity")
      .orderBy("l_returnflag")

  val foldSql: String =
    """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A1b: mapPartitions escape hatch, same oracle shape + row counts. */
  def foldMapPartitions(spark: SparkSession, dir: String): DataFrame =
    Fold.mapPartitionsSum(Tables.lineitem(spark, dir), "l_returnflag", "l_quantity")
      .orderBy("l_returnflag")

  val foldMpSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_val,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** S5+S6+S1: full write-path roundtrip — events → ZTable (day-partitioned,
    * ts-sorted parquet) → pruned time-range scan → aggregate. The oracle
    * runs on the ORIGINAL events table, so partition rollover, dynamic
    * partition writes, and scan pruning must all preserve the data. */
  def ztableRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_ztable_").toString
    deleteRecursively(Paths.get(path))
    val t = ZTable.create(spark, path,
      ZTableSpec(tsCol = "ts", partitionBy = ZPartitionBy.Day, strictOrder = false))
    t.append(Tables.events(spark, dir))
    t.scan("2024-01-05 00:00:00", "2024-01-15 23:59:59")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  val ztableRoundtripSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts <= TIMESTAMP '2024-01-15 23:59:59'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** S8: offline column-type migration (reference
    * `scripts/convert_col.jl:28-60`) — events → ZTable, then
    * migrateColumn rewrites `user_id` bigint → int into a new table
    * root. The probe aggregates the MIGRATED table per event_type with
    * min/max/sum over the retyped column (its int type reaches the
    * output schema, so the gate checks the retype itself, not just row
    * survival) plus a decimal sum over an untouched column (migration
    * must not disturb neighbors). The oracle computes the same cast on
    * the original events — the migration must be value-lossless across
    * every partition. */
  def migrateColumn(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_mig_src_").toString
    val outPath = Files.createTempDirectory("graft_mig_out_").toString
    deleteRecursively(Paths.get(path))
    deleteRecursively(Paths.get(outPath))
    val t = ZTable.create(spark, path,
      ZTableSpec(tsCol = "ts", partitionBy = ZPartitionBy.Day, strictOrder = false))
    t.append(Tables.events(spark, dir))
    val migrated = t.migrateColumn("user_id", "int", outPath)
    migrated.df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("user_id")).as("min_uid"),
        max(col("user_id")).as("max_uid"),
        sum(col("user_id")).as("sum_uid"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  val migrateColumnSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  min(CAST(user_id AS INTEGER)) AS min_uid,
      |  max(CAST(user_id AS INTEGER)) AS max_uid,
      |  CAST(SUM(CAST(user_id AS INTEGER)) AS BIGINT) AS sum_uid,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DEL1: copy-on-write takedown — append events to a ZTable, DELETE the
    * matching rows (`deleteWhere` rewrites only partitions containing
    * matches), aggregate what remains. The oracle filters the original
    * table with the negated predicate, so the delete must remove exactly
    * the matching rows and nothing else across every partition. */
  def takedown(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_del_").toString
    deleteRecursively(Paths.get(path))
    val t = ZTable.create(spark, path,
      ZTableSpec(tsCol = "ts", partitionBy = ZPartitionBy.Day, strictOrder = false))
    t.append(Tables.events(spark, dir))
    t.deleteWhere(col("event_type") === "error" && col("value") > 50.0)
    t.df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  val takedownSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE NOT (event_type = 'error' AND value > 50.0)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DEL2: right-to-be-forgotten by KEY LIST — the deletion request as
    * it actually arrives (a table of user ids, not a predicate):
    * ZTable.deleteMatching anti-joins the key set through the same
    * copy-on-write machinery as del1 (probe semi-join finds touched
    * partitions; only those rewrite, once, ts-sorted; two-rename swap +
    * recovery). Key list here = every user with user_id % 7 == 3, so
    * the oracle is the complement aggregate. */
  def forgetUsers(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_del2_").toString
    deleteRecursively(Paths.get(path))
    val t = ZTable.create(spark, path,
      ZTableSpec(tsCol = "ts", partitionBy = ZPartitionBy.Day, strictOrder = false))
    t.append(Tables.events(spark, dir))
    val keys = Tables.events(spark, dir)
      .where(col("user_id") % 7 === 3)
      .select(col("user_id")).distinct()
    t.deleteMatching(keys, "user_id")
    t.df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** NULL-safe complement: deleteMatching's left_anti KEEPS a NULL-key
    * row (no key can equal NULL), so the oracle keeps it too — plain
    * `user_id % 7 <> 3` would silently drop NULLs and diverge. */
  val forgetUsersSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE user_id % 7 <> 3 OR user_id IS NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** UP1: MERGE upsert round-trip — append events to a ZTable, merge a
    * delta that UPDATES every user_id<50 row (value doubled, same
    * event_id) and INSERTS shifted-key copies of the user_id∈[50,60)
    * rows, then aggregate. The oracle replays the same merge in SQL
    * (anti-join + union), so matched keys must be replaced exactly once
    * and unmatched keys inserted exactly once across every partition. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_up_").toString
    deleteRecursively(Paths.get(path))
    val t = ZTable.create(spark, path,
      ZTableSpec(tsCol = "ts", partitionBy = ZPartitionBy.Day, strictOrder = false))
    val ev = Tables.events(spark, dir)
    t.append(ev)
    val updates = ev.where(col("user_id") < 50)
      .withColumn("value", col("value") * 2)
    val inserts = ev.where(col("user_id") >= 50 && col("user_id") < 60)
      .withColumn("event_id", col("event_id") + 10000000L)
    t.merge(updates.unionByName(inserts), Seq("event_id"))
    t.df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  val mergeUpsertSql: String =
    """WITH delta AS (
      |  SELECT event_id, ts, user_id, event_type, value * 2 AS value, props
      |  FROM events WHERE user_id < 50
      |  UNION ALL
      |  SELECT event_id + 10000000, ts, user_id, event_type, value, props
      |  FROM events WHERE user_id >= 50 AND user_id < 60),
      |merged AS (
      |  SELECT * FROM events
      |  WHERE event_id NOT IN (SELECT event_id FROM delta)
      |  UNION ALL SELECT * FROM delta)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin

  /** IVM1: incremental rollup maintenance — three delta refreshes (one
    * per event_id residue class) with a mid-stream delta compaction;
    * the merged read must equal the one-shot aggregate over the whole
    * table, proving partials are algebraic and merge/compaction
    * lossless. Each refresh only aggregates its batch — the maintenance
    * cost a 100 TB pipeline actually pays. */
  def rollupRefresh(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_ivm_").toString + "/rollup"
    val r = graft.sources.RollupTable(spark, path, grain = "day",
      tsCol = "ts", dims = Seq("event_type"), valueCol = "value")
    val ev = Tables.events(spark, dir)
    r.refresh(ev.where(col("event_id") % 3 === 0))
    r.refresh(ev.where(col("event_id") % 3 === 1))
    r.compactDeltas()
    r.refresh(ev.where(col("event_id") % 3 === 2))
    r.read()
      .select(col("bucket"), col("event_type"), col("n"),
        col("sum_val").cast("double").as("sum_value"))
      .orderBy("bucket", "event_type")
  }

  val rollupRefreshSql: String =
    """SELECT date_trunc('day', ts) AS bucket, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** DQ4: REFERENTIAL-INTEGRITY audit across the star schema — one rule
    * row per foreign key with the child count, ORPHAN count (child keys
    * with no parent — broken FK) and UNREFERENCED-parent count (parents
    * no child points at — coverage, not a violation; nonzero here:
    * idle customers exist, q22's subject). Each rule is two anti joins
    * + counts — one scan per table pair, no row output, the shape a
    * 100 TB nightly contract check runs. Only GENUINELY small parents
    * (nation, supplier — the fixed-cardinality dimensions) carry a
    * broadcast hint; fact-scale parents (orders, customer grow with SF)
    * are left to the planner — a forced broadcast there would OOM at
    * scale, and AQE still picks broadcast when the run-time size
    * permits (PlanSpec pins that lineitem_orders does NOT force-
    * broadcast orders). */
  /** The child-minus-parent anti join with dq4's broadcast policy:
    * hint only when the parent is a fixed-cardinality dimension.
    * Package-visible so PlanSpec can pin that a fact-scale parent is
    * NOT force-broadcast. */
  private[graft] def orphanJoin(child: DataFrame, ckey: String,
      parent: DataFrame, pkey: String, smallParent: Boolean): DataFrame = {
    val c = child.select(col(ckey).as("k"))
    val p0 = parent.select(col(pkey).as("k"))
    c.join(if (smallParent) broadcast(p0) else p0, Seq("k"), "left_anti")
  }

  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // ONE lazy plan for the whole audit (r13 optimization, guide §5/§2.6):
    // the original ran THREE eager .count() driver actions per rule — 15
    // serial tiny jobs whose scheduling round-trips dominated the row
    // (2.13 s at sf0.1) — where a single plan of unioned count-aggregates
    // lets Spark schedule every rule's scans/joins concurrently inside
    // the caller's one action, and keeps the driver out of the data path.
    // Values are identical by construction: count(*) of the same frames.
    def rule(name: String, child: DataFrame, ckey: String,
        parent: DataFrame, pkey: String, smallParent: Boolean): DataFrame = {
      val c = child.select(col(ckey).as("k"))
      val p0 = parent.select(col(pkey).as("k"))
      val nChild = c.agg(count(lit(1)).as("n_child"))
      val nOrphan = orphanJoin(child, ckey, parent, pkey, smallParent)
        .agg(count(lit(1)).as("n_orphan"))
      val nUnref = p0.join(c, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_unref_parent"))
      nChild.crossJoin(nOrphan).crossJoin(nUnref)
        .select(lit(name).as("fk"), col("n_child"), col("n_orphan"),
          col("n_unref_parent"))
    }
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val cu = Tables.customer(spark, dir)
    val su = Tables.supplier(spark, dir)
    val na = Tables.nation(spark, dir)
    rule("customer_nation", cu, "c_nationkey", na, "n_nationkey", smallParent = true)
      .unionByName(rule("lineitem_orders", li, "l_orderkey", o, "o_orderkey",
        smallParent = false))
      .unionByName(rule("lineitem_supplier", li, "l_suppkey", su, "s_suppkey",
        smallParent = true))
      .unionByName(rule("orders_customer", o, "o_custkey", cu, "c_custkey",
        smallParent = false))
      .unionByName(rule("supplier_nation", su, "s_nationkey", na, "n_nationkey",
        smallParent = true))
      .orderBy("fk")
  }


  val refIntegritySql: String = {
    def rule(name: String, child: String, ckey: String,
        parent: String, pkey: String): String =
      s"""SELECT '$name' AS fk,
         |  (SELECT COUNT(*) FROM $child) AS n_child,
         |  (SELECT COUNT(*) FROM $child c WHERE NOT EXISTS
         |     (SELECT 1 FROM $parent p WHERE p.$pkey = c.$ckey)) AS n_orphan,
         |  (SELECT COUNT(*) FROM $parent p WHERE NOT EXISTS
         |     (SELECT 1 FROM $child c WHERE c.$ckey = p.$pkey)) AS n_unref_parent""".stripMargin
    Seq(
      rule("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      rule("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      rule("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      rule("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      rule("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fk")
  }

  /** IVM2: incrementally-maintained equi-JOIN view (sources.JoinView —
    * the join face beside ivm1's aggregate face): three interleaved
    * delta batches on BOTH sides (orders split 3 ways, lineitem 2 ways,
    * one empty-side refresh) fold through the Δ(L⋈R) algebra; the gate
    * is the full-join oracle — the accumulated view must equal joining
    * the complete tables, proving no pair is dropped or double-counted
    * across any refresh interleaving. Each refresh joins only
    * delta-sized inputs against the accumulated other side. */
  def joinViewRefresh(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_jv_").toString + "/jv"
    val o = Tables.orders(spark, dir).where(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val v = new graft.sources.JoinView(spark, path, "o_orderkey", "l_orderkey")
    v.refresh(o.where(col("o_orderkey") % 3 === 0),
      l.where(col("l_orderkey") % 2 === 0), "b1")
    v.refresh(o.where(col("o_orderkey") % 3 === 1),
      l.where(col("l_orderkey") % 2 === 1), "b2")
    v.refresh(o.where(col("o_orderkey") % 3 === 2), l.limit(0), "b3")
    v.read()
      .select(col("o_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("o_custkey"), col("l_quantity"))
      .orderBy("o_orderkey", "l_linenumber", "l_quantity")
  }

  val joinViewRefreshSql: String =
    """SELECT o_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  o_custkey, l_quantity
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey % 10 = 0
      |ORDER BY o_orderkey, l_linenumber, l_quantity""".stripMargin

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
