package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "the quick brown fox jumps over the lazy dog tomorrow"), // near-dup of 0
    (2L, "completely different content about spark query engines"),
    (3L, "THE   quick brown fox jumps over the lazy dog today")   // ws/case variant of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups whitespace/case variants") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    val byKeep = out.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byKeep(0L) == 2L) // 0 and 3 share a fingerprint
    assert(out.length == 3)
  }

  test("ngram jaccard finds the near-dup pair") {
    val pairs = Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 3), 1, 2)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("minhash LSH finds the same near-dup pair") {
    val pairs = Dedup.minhashLshPairs(Dedup.shingles(docs, "doc_id", "text", 3), 1, 2)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash: identical text -> hamming 0, disjoint text -> large") {
    val sig = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairs(sig, maxDist = 10).collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(pairs.get((0L, 1L)).exists(_ <= 10))
  }
}
