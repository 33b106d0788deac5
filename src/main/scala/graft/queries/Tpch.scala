package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.util.Dec._

/** TPC-H-style analytical queries over the driver's star schema.
  *
  * The reference has no joins and only sum/count aggregates (SURVEY.md
  * §2.3-2.4: its universal Julia fold covers the rest); the driver's oracle
  * is a TPC-H-ish star schema, so this exposes the full declarative surface
  * Spark gives for free. Scale notes per query inline: the dimensions
  * (region/nation, customer, supplier, part) are broadcast-sized even at
  * 100 TB fact scale, so every join here is a broadcast hash join with no
  * fact-side shuffle; only the final groupBy shuffles, after map-side
  * partial aggregation.
  */
object Tpch {

  /** TPC-H Q1 analog: pricing summary. Single scan of lineitem, map-side
    * partial agg on a 6-group key → shuffle of ~6 rows. Scales linearly. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.where(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          * (one + dec2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(dec2(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSumMoney("l_quantity")} AS sum_qty,
       |  ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
       |  ${sqlSumRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * ($SQL_ONE - ${sqlDec2("l_discount")})
       |       * ($SQL_ONE + ${sqlDec2("l_tax")})) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(${sqlDec2("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(SUM(${sqlDec2("l_extendedprice")}) AS DOUBLE) / COUNT(*) AS avg_price,
       |  CAST(SUM(${sqlDec2("l_discount")}) AS DOUBLE) / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 analog: shipping-priority top-10 by revenue. customer is
    * broadcast; orders⋈lineitem is the only shuffle pair, and at scale
    * both are bucketable on orderkey to eliminate it. TakeOrdered top-k,
    * no global sort. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** TPC-H Q5 analog: revenue by nation in a region for one year.
    * Every dimension — supplier, CUSTOMER, nation⋈region — broadcasts,
    * leaving ONE shuffle join (lineitem⋈orders) + tiny agg. Without the
    * hint AQE sometimes planned customer as a shuffle join at sf0.1 —
    * the round-3 bench's 6.9× outlier.
    *
    * Scale bound on the customer hint: broadcast feasibility is an
    * ABSOLUTE-size question, not the 400:1 customer:lineitem row
    * RATIO — customer grows linearly with SF (15k rows/SF ≈ 3 MB/SF),
    * so the hard hint is sound through roughly sf100-1000 (sub-GB
    * broadcast) and becomes an executor-OOM risk beyond that. At that
    * scale drop THIS hint and let autoBroadcastJoinThreshold/AQE
    * decide from measured sizes (the supplier/nation/region hints are
    * 10-50× smaller and outlive it); the shuffle join it falls back to
    * is the correct plan there anyway. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
               col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q10 analog: top returned-item customers in a quarter. */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
             col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin
}
