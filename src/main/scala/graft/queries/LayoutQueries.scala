package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Skew
import graft.sources.{Bucketing, SymbolDictionary}
import graft.util.Dec._

/** Oracle-gated queries for the physical-layout operators: these ops
  * change WHERE data lives (dictionary ids, bucket files, salt keys),
  * never WHAT a query returns — so each is gated on semantic equivalence
  * against a plain-SQL oracle, while the plan-shape wins (zero-exchange
  * bucketed joins, salted key spread) are pinned by BucketingSpec /
  * SymbolDictSpec / SkewSpec.
  */
object LayoutQueries {

  /** DICT1: shared-symbol-dictionary round-trip — build the dict from
    * `event_type` (dense lexicographic ids, reference `src/schema.rs:31`),
    * encode the fact through it, aggregate by the encoded id. */
  def sharedDict(spark: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft_dict_q_").toString + "/dict"
    val dict = SymbolDictionary(spark, path)
    val ev = Tables.events(spark, dir)
    dict.extend(ev, "event_type")
    dict.encode(ev, "event_type")
      .groupBy(col("event_type_id"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy(col("event_type_id"))
  }

  val sharedDictSql: String =
    s"""WITH dict AS (
       |  SELECT event_type,
       |         CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS event_type_id
       |  FROM (SELECT DISTINCT event_type FROM events))
       |SELECT event_type_id, COUNT(*) AS n, ${sqlSumMoney("value")} AS sum_value
       |FROM events JOIN dict USING (event_type)
       |GROUP BY event_type_id
       |ORDER BY event_type_id""".stripMargin

  /** B1: bucketed-layout round-trip — write both facts bucketed+sorted
    * on the join key (the write-once-shuffle-never layout,
    * BucketingSpec pins the zero-exchange plan), then join via the
    * catalog and aggregate. The oracle is the plain join: bucketing
    * must never change results. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = Files.createTempDirectory("graft_bucket_q_").toString
    Bucketing.writeBucketed(Tables.lineitem(spark, dir),
      "b1_lineitem_q", s"$base/lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, dir),
      "b1_orders_q", s"$base/orders", "o_orderkey", 8)
    Bucketing.table(spark, "b1_lineitem_q")
      .join(Bucketing.table(spark, "b1_orders_q"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val bucketedJoinSql: String =
    s"""SELECT o_orderpriority,
       |  ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** One Morton-clustered events ZTable per source dir per JVM: z1's
    * SCAN timing must not re-pay the ingest+compaction it reads from
    * (z1b times that lifecycle explicitly). The serving analogue: the
    * compacted table is written once and queried many times. */
  private val zorderCache = scala.collection.concurrent.TrieMap[String, String]()

  private def zorderBuildAt(spark: SparkSession, dir: String): String = {
    val path = Files.createTempDirectory("graft_zorder_q_").toString + "/t"
    val t = graft.sources.ZTable.create(spark, path,
      graft.sources.ZTableSpec(strictOrder = false))
    t.append(Tables.events(spark, dir))
    t.compact(clusterBy = Seq("user_id"))
    path
  }

  private def zorderAgg(t: graft.sources.ZTable): DataFrame =
    t.scan("2024-01-05 00:00:00", "2024-01-15 23:59:59")
      .where(col("user_id") < 100)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy(col("user_id"))

  /** Z1: Z-ordered time-range + user-range SCAN over the compacted
    * table (built once per session by [[zorderBuildAt]]) — the timing
    * is the pruned read, not the ingest. Layout must never change
    * results (the per-file bound tightening itself is pinned by
    * ZTableSpec). */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    val path = zorderCache.getOrElseUpdate(dir, zorderBuildAt(spark, dir))
    zorderAgg(graft.sources.ZTable.open(spark, path))
  }

  /** Z1B: the full Z-order LIFECYCLE — batch ingest into a fresh
    * ZTable, Morton-clustered compaction rewrite, then the same scan —
    * kept as its own bench row so table-build cost is visible without
    * masquerading as scan cost. Same oracle as z1: layout work must be
    * result-invariant. */
  def zorderBuild(spark: SparkSession, dir: String): DataFrame =
    zorderAgg(graft.sources.ZTable.open(spark, zorderBuildAt(spark, dir)))

  val zorderScanSql: String =
    s"""SELECT user_id, COUNT(*) AS n, ${sqlSumMoney("value")} AS sum_value
       |FROM events
       |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
       |  AND ts <= TIMESTAMP '2024-01-15 23:59:59'
       |  AND user_id < 100
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** SKEW1: salted-join round-trip — the big side spreads each key over
    * deterministic salts, the small side replicates per salt (the
    * planner-independent hot-key tool); results must equal the plain
    * join. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
    val small = Tables.orders(spark, dir)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Skew.saltedJoin(big, small, "l_orderkey",
        saltSource = col("l_linenumber"), numSalts = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  val saltedJoinSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlSumMoney("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin
}
