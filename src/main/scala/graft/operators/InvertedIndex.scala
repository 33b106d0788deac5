package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Persisted inverted text index: the build-once / query-many half of
  * keyword retrieval — the text analog of [[IvfIndex]].
  *
  * `build` explodes the corpus into (term, doc, tf, len) posting rows
  * laid out as parquet PARTITIONED BY TERM-HASH BUCKET (vocabulary is
  * unbounded, so partitions key on `xxhash64(term) mod numBuckets`, not
  * the raw term), plus a one-row corpus-stats sidecar (N, avg length).
  * `search` hashes the query terms driver-side and scans ONLY their
  * bucket directories — partition pruning reads `|terms| / numBuckets`
  * of the index per query, the property that makes serving work at
  * 100 TB. Per-term df comes from the pruned postings themselves (a
  * posting-list-sized count, broadcast back), so index build never
  * materializes a global dictionary.
  *
  * Scoring replicates [[graft.queries.SearchQueries.bm25]]'s arithmetic
  * operation-for-operation; SearchSpec gates that index-serving results
  * equal the full-scan query exactly (the sim6/sim1 trick for text).
  */
object InvertedIndex {

  /** One corpus scan: explode tokens, count (term, doc) pairs — the only
    * shuffle is the posting aggregation, map-side combined; the
    * partitioned write then distributes posting rows by bucket. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      numBuckets: Int = 256): Unit = {
    val postings = docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("len"),
        explode(col("w")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("len"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bkt", pmod(xxhash64(col("term")), lit(numBuckets)))
    postings.write.mode("overwrite").partitionBy("bkt").parquet(path)
    val s = docs
      .select(size(split(lower(col(textCol)), " ")).cast("double").as("len"))
      .agg(count(lit(1)).as("n"), avg(col("len")).as("avglen")).head()
    // Double.toString is shortest-roundtrip (JDK 19+ semantics hold on
    // 17 for Double.toString): avglen survives the JSON hop bitwise.
    Files.writeString(Paths.get(path, "_stats.json"),
      s"""{"n":${s.getLong(0)},"avglen":${s.getDouble(1)},"buckets":$numBuckets}""",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Spark's xxhash64 for a string literal, driver-side (seed 42). */
  private def termBucket(term: String, numBuckets: Int): Long = {
    val u = UTF8String.fromString(term)
    val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    java.lang.Math.floorMod(h, numBuckets.toLong)
  }

  /** BM25 top-k over the index: reads only the query terms' buckets. */
  def search(spark: SparkSession, path: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val json = Files.readString(Paths.get(path, "_stats.json"))
    def field(name: String): String =
      s""""$name":([-0-9.Ee]+)""".r.findFirstMatchIn(json).get.group(1)
    val n = field("n").toLong
    val avglen = field("avglen").toDouble
    val numBuckets = field("buckets").toInt
    val bkts = terms.map(termBucket(_, numBuckets)).distinct
    val posts = spark.read.parquet(path)
      .where(col("bkt").isin(bkts: _*) && col("term").isin(terms: _*))
    val dfs = posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // identical operation order to SearchQueries.bm25's per-term score
    val tf = col("tf").cast("double")
    val termScore =
      log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / lit(avglen)))
    posts.join(broadcast(dfs), Seq("term"))
      .select(col("doc_id"), termScore.as("s"))
      .groupBy(col("doc_id")).agg(sum(col("s")).as("s"))
      .select(col("doc_id"), round(col("s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
