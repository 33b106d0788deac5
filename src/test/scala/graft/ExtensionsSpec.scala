package graft

import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").head.getDouble(0)
    assert(out == 11.0)
  }

  test("winnow and is_market_open are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val fps = spark.sql(
      "SELECT winnow(split('the quick brown fox jumps over the lazy dog', ' ')) AS f")
      .head.getSeq[Long](0)
    assert(fps.nonEmpty)
    // same result as the Column-API face
    val viaApi = graft.plans.TextOps.winnow(
      org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lit("the quick brown fox jumps over the lazy dog"),
        " "))
    val apiFps = spark.range(1).select(viaApi.as("f")).head.getSeq[Long](0)
    assert(fps == apiFps)
    val open = spark.sql("SELECT is_market_open(DATE '2020-07-03') AS o")
      .head.getBoolean(0)
    assert(!open) // July 4th 2020 observed Friday the 3rd
  }

  test("repetition is callable from SQL and matches the Column-API face") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT repetition(split('a b a b a', ' ')).n_grams AS g," +
      "       repetition(split('a b a b a', ' ')).n_distinct AS d")
      .head
    assert((r.getLong(0), r.getLong(1)) == (3L, 2L))
    val bad = intercept[Exception] {
      spark.sql("SELECT repetition(split('a b', ' '), 0) AS r").collect()
    }
    assert(bad.getMessage.contains("repetition n must be >= 1"))
  }

  test("simhash64 and minhash are callable from SQL and match the operator face") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_sig_docs")
    val viaSql = spark.sql(
      """SELECT simhash64(split(lower(text), ' ')) AS sh,
        |       minhash(split(lower(text), ' '), 3, 4) AS mh
        |FROM ext_sig_docs""".stripMargin).head
    val viaOp = graft.operators.Dedup.simhash(docs, "doc_id", "text")
      .head.getAs[Long]("simhash")
    assert(viaSql.getAs[Long]("sh") == viaOp)
    assert(viaSql.getSeq[Long](1).length == 4)
  }

  test("format_currency and fold_sum_cents are callable from SQL") {
    GraftExtensions.register(spark)
    val f = spark.sql("SELECT format_currency(CAST(1234.5678 AS FLOAT), 5) AS s")
      .head.getString(0)
    assert(f == graft.functions.Format.formatCurrency(1234.5678f, 5))
    val s = spark.sql(
      "SELECT fold_sum_cents(v) AS sv FROM VALUES (0.1), (0.2), (0.3) AS t(v)")
      .head.getDouble(0)
    assert(s == 0.6) // exact in cents, no float drift
  }

  test("winnow rejects out-of-range k/w at analysis time, not with AIOOBE") {
    GraftExtensions.register(spark)
    val eK = intercept[Exception] {
      spark.sql("SELECT winnow(split('a b c d e f g h', ' '), 7, 4)").collect()
    }
    assert(eK.getMessage.contains("winnow k must be in"), eK.getMessage)
    val eW = intercept[Exception] {
      spark.sql("SELECT winnow(split('a b c d e f g h', ' '), 3, 0)").collect()
    }
    assert(eW.getMessage.contains("winnow w must be >= 1"), eW.getMessage)
  }

  test("vec_dot arity error is clean") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] { spark.sql("SELECT vec_dot(array(1.0))") }
    assert(e.getMessage.contains("2 arguments"))
  }
}
