package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's `Table::open` surface (reference
  * `src/table/mod.rs:124-133`) re-expressed as plain Parquet reads: the
  * storage engine (mmap columns, partition dirs, symbol dictionaries) is
  * replaced wholesale by Spark's vectorized Parquet reader, which already
  * provides columnar zero-copy batches, dictionary encoding and min/max
  * pruning (SURVEY.md §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's reader
    * rejects. Read it as raw Long nanos (legacy conf) and truncate to
    * microseconds — the same ns→µs floor DuckDB applies, so oracle
    * comparisons line up. Mirrors the reference's i64-nanos timestamps
    * (reference `src/schema.rs:8`, SURVEY.md §1.2). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsRawTs(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** events with ts still as raw Long nanos — use this when a ts
    * predicate must reach the parquet reader: filters on the DERIVED
    * timestamp land above the conversion and never push down (only
    * IsNotNull reaches the scan), while a raw-nanos range predicate
    * pushes into row-group pruning. Convert with
    * `timestamp_micros(ts div 1000)` after filtering. */
  def eventsRawTs(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
