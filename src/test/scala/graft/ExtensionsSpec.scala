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

  test("vec_dot arity error is clean") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] { spark.sql("SELECT vec_dot(array(1.0))") }
    assert(e.getMessage.contains("2 arguments"))
  }
}
