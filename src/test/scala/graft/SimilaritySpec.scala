package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("cosine: identical vectors -> 1, orthogonal -> 0, opposite -> -1") {
    val a = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
                (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
                (Array(1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(a(0) - 1.0) < 1e-12)
    assert(math.abs(a(1)) < 1e-12)
    assert(math.abs(a(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine with id tiebreak") {
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(out == Seq(4L, 1L, 2L)) // exact dup first, near-dup, orthogonal
  }

  test("cosine pairs above threshold") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 4L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("DotProduct rejects non-array inputs with a clean analysis error") {
    import graft.plans.VectorOps
    val bad = Seq((1, "x")).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("DotProduct requires array"))
  }

  test("IVF cells: identical vectors land in the same cell and pair up") {
    val pairs = Similarity.ivfNeighborPairs(vecs, "vec_id", "embedding", 2, 0.99)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("LSH buckets: identical vectors collide; pairs found at threshold") {
    val pairs = Similarity.lshNeighborPairs(vecs, "vec_id", "embedding", 6, 0.99)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 4L))) // identical vectors always same bucket
  }
}
