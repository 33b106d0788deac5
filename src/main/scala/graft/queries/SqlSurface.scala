package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The `spark.sql(...)` entry point — the engine's ANSI SQL face.
  *
  * The reference's only query language is arbitrary Julia folded over
  * partitions (SURVEY.md §2.10); its replacement surface here is twofold:
  * the typed DataFrame/Dataset API (graft.queries.*) and this SQL door,
  * which accepts the SAME ANSI SQL the DuckDB oracle runs — 48 of the 63
  * oracle statements execute verbatim on Spark (the rest use
  * DuckDB-dialect functions like string_split/quantile_cont).
  * SqlParitySpec asserts bitwise agreement between the two faces.
  */
object SqlSurface {

  /** Dir whose tables are currently registered, per session — each
    * registration reads 10 parquet footers driver-side (~0.5 s), so
    * repeated SQL-door queries over the same dir skip it. */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every test table as a temp view (events pre-converted to
    * microsecond timestamps, Tables.events). Idempotent per (session,
    * dir); switching dirs re-registers. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    if (dir == registeredDir.get(spark)) return
    for (n <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    Tables.events(spark, dir).createOrReplaceTempView("events")
    registeredDir.put(spark, dir)
  }

  /** TPC-H Q1 executed through spark.sql — text identical to the oracle. */
  def q1ViaSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(Tpch.q1Sql)
  }

  /** Q13 (left join + derived-table reaggregation) through spark.sql. */
  def q13ViaSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(Tpch2.q13Sql)
  }
}
