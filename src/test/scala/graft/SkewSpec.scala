package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    // 90% of big rows share one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) "HOT" else s"k$i", i.toLong))
      .toDF("key", "rid")
    val small = Seq(("HOT", "hot_val"), ("k950", "v950"), ("missing", "x"))
      .toDF("key", "v")
    val plain = big.join(small, Seq("key"))
      .select("key", "rid", "v").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", col("rid"), 8)
      .select("key", "rid", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 901)
  }

  test("salt distribution actually spreads the hot key") {
    val big = (1 to 1000).map(i => ("HOT", i.toLong)).toDF("key", "rid")
    val nSalts = big
      .withColumn("__salt", pmod(xxhash64(col("rid")), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts == 8)
  }
}
