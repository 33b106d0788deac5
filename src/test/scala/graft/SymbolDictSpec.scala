package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.{CoBucketGroup, SymbolDictionary}

/** The shared-dictionary contract: stable dense ids, encode/decode
  * round-trip, and co-bucketed members joining on the encoded id with
  * zero exchanges — the reference's "one symbol dict, all tables
  * co-located" behavior re-expressed as catalog state. */
class SymbolDictSpec extends SparkSpec {
  import spark.implicits._

  test("extend assigns dense stable ids; encode/decode round-trips") {
    val dict = SymbolDictionary(spark, Files.createTempDirectory("dict_").toString + "/d")
    val t1 = Seq(("AAPL", 1.0), ("MSFT", 2.0), ("AAPL", 3.0)).toDF("sym", "px")
    dict.extend(t1, "sym")
    val ids1 = dict.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids1 == Map("AAPL" -> 1L, "MSFT" -> 2L))
    // extending with overlap + novelty never renumbers existing symbols
    val t2 = Seq(("MSFT", 9L), ("GOOG", 8L), ("ABBV", 7L)).toDF("sym", "qty")
    dict.extend(t2, "sym")
    val ids2 = dict.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids2("AAPL") == 1L && ids2("MSFT") == 2L)
    assert(ids2("ABBV") == 3L && ids2("GOOG") == 4L) // new, lexicographic
    // idempotent
    dict.extend(t2, "sym")
    assert(dict.df.count() == 4)
    // round-trip
    val enc = dict.encode(t1, "sym")
    assert(enc.columns.toSet == Set("px", "sym_id"))
    val back = dict.decode(enc, "sym")
    assert(back.select("sym", "px").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      == t1.collect().map(r => (r.getString(0), r.getDouble(1))).toSet)
  }

  test("empty first batch does not brick the dictionary; null symbols raise on encode") {
    import org.apache.spark.sql.functions.col
    val dict = graft.sources.SymbolDictionary(spark,
      java.nio.file.Files.createTempDirectory("dict_empty_").toString + "/d")
    // empty and all-null batches must not create a zero-row dict whose
    // next extend NPEs on max(sym_id)
    dict.extend(Seq.empty[Tuple1[String]].toDF("sym"), "sym")
    dict.extend(Seq(Tuple1(null: String)).toDF("sym"), "sym")
    assert(!dict.exists)
    dict.extend(Seq(Tuple1("a"), Tuple1("b")).toDF("sym"), "sym")
    assert(dict.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 1L, "b" -> 2L))
    // a null symbol raises loudly instead of vanishing through the join
    val e = intercept[Exception] {
      dict.encode(Seq(("x", Some("a")), ("y", None))
        .toDF("v", "sym"), "sym").collect()
    }
    assert(e.getMessage != null)
  }

  test("co-bucketed members join on the shared id with zero exchanges") {
    val base = Files.createTempDirectory("cobucket_").toString
    val dict = SymbolDictionary(spark, s"$base/dict")
    val group = new CoBucketGroup(spark, dict, base, buckets = 4)
    val trades = Seq(("AAPL", 101.0), ("MSFT", 202.0), ("GOOG", 303.0)).toDF("sym", "px")
    val quotes = Seq(("AAPL", 100.5), ("MSFT", 201.5), ("TSLA", 404.5)).toDF("sym", "bid")
    group.write("trades_cb", trades, "sym")
    group.write("quotes_cb", quotes, "sym") // TSLA extends the dict
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = group.table("trades_cb")
        .join(group.table("quotes_cb"), Seq("sym_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext, plan)
      // and the join is correct after decode
      val out = dict.decode(joined, "sym").select("sym", "px", "bid").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(out == Set(("AAPL", 101.0, 100.5), ("MSFT", 202.0, 201.5)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS trades_cb")
      spark.sql("DROP TABLE IF EXISTS quotes_cb")
    }
  }
}
