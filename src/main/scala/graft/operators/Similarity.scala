package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.plans.VectorOps

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a single scan with a codegen'd
  * `aggregate`/`zip_with` dot product against a broadcast query vector,
  * then TakeOrdered. Scale path: random-hyperplane LSH bucketing — each
  * vector is signed against H deterministic pseudo-random hyperplanes into
  * a bucket key; candidate search touches only same/near buckets, turning
  * O(N) per query into O(N / 2^H)-ish. Hyperplane components are derived
  * from xxhash64(seed, dim) — deterministic, no RNG at plan time.
  */
object Similarity {

  /** Cosine similarity via the codegen'd DotProduct expression
    * (graft.plans.VectorExprs). Sequential left-to-right double
    * accumulation — bit-identical to the interpreted
    * `aggregate(zip_with(...))` formulation it replaced, ~50× faster on
    * pairwise workloads because the loop lives inside whole-stage codegen. */
  def cosine(a: Column, b: Column): Column =
    VectorOps.dot(a, b) / (sqrt(VectorOps.normSq(a)) * sqrt(VectorOps.normSq(b)))

  private def toDouble(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Brute-force top-k by cosine against the vector of `queryId`.
    * The 1-row query side is broadcast; compiles to scan + TakeOrdered. */
  def bruteForceTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol)).as("qv"))
    emb.where(col(idCol) =!= queryId)
      .join(broadcast(q))
      .select(col(idCol).as("id"),
        cosine(toDouble(col(vecCol)), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** All pairs with cosine >= threshold — embedding near-dup detection.
    * Norms are computed once per VECTOR before the pair join (N sqrt ops,
    * not N² — at 100 TB the norm is a stored column), so each candidate
    * pair costs exactly one codegen'd dot product.
    * Brute force over the id-ordered cross join; the LSH variant below is
    * the 100 TB path. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("ida"), col(vecCol).as("va"),
      sqrt(VectorOps.normSq(col(vecCol))).as("norm_a"))
    val b = emb.select(col(idCol).as("idb"), col(vecCol).as("vb"),
      sqrt(VectorOps.normSq(col(vecCol))).as("norm_b"))
    a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        (VectorOps.dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Deterministic random-hyperplane sign bits: bucket = H-bit signature.
    * Hyperplane h component d = (xxhash64(h*4096+d) scaled to [-1,1)). */
  def lshBucket(vecCol: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { h =>
      // dot(vec, plane_h) > 0 ?  1 << h : 0   — plane derived per dim
      val dot = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (v, d) => v.cast(DoubleType) *
            (pmod(xxhash64(d + lit(h * 4096)), lit(2000003L)).cast(DoubleType)
              / lit(1000001.5) - lit(1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), h)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a + b)
  }

  /** IVF-style ANN: a deterministic coarse quantizer — the k vectors with
    * the smallest xxhash64(id) act as centroids (no RNG, stable across
    * runs); every vector is assigned to its nearest centroid via k
    * codegen'd dot products; candidate pairs are searched within cells
    * only. At 100 TB: centroids broadcast, assignment is a map-only pass,
    * the pair search shuffles once on cell id. Recall < 1 by construction
    * (cell-boundary neighbors are missed; increase k-probe to trade). */
  def ivfNeighborPairs(emb: DataFrame, idCol: String, vecCol: String,
      numCells: Int, threshold: Double): DataFrame = {
    val centroids = emb
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(numCells)
      .select(col(idCol).as("cell"), col(vecCol).as("cv"),
        sqrt(VectorOps.normSq(col(vecCol))).as("cnorm"))
    val scored = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        sqrt(VectorOps.normSq(col(vecCol))).as("vnorm"))
      .join(broadcast(centroids))
      .select(col("id"), col("v"), col("vnorm"), col("cell"),
        (VectorOps.dot(col("v"), col("cv")) / (col("vnorm") * col("cnorm"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("sim").desc, col("cell"))
    val assigned = scored
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("id"), col("v"), col("vnorm"), col("cell"))
    val a = assigned.select(col("id").as("ida"), col("v").as("va"),
      col("vnorm").as("norm_a"), col("cell"))
    val b = assigned.select(col("id").as("idb"), col("v").as("vb"),
      col("vnorm").as("norm_b"), col("cell"))
    a.join(b, Seq("cell")).where(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        (VectorOps.dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** LSH-bucketed ANN: group vectors into hyperplane buckets, search
    * candidate pairs only within buckets. Recall < 1 by construction;
    * used as the scale path with brute force as the correctness baseline. */
  def lshNeighborPairs(emb: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int, threshold: Double): DataFrame = {
    val withBucket = emb.select(col(idCol).as("id"),
      toDouble(col(vecCol)).as("v"), lshBucket(col(vecCol), numPlanes).as("bucket"))
    val a = withBucket.select(col("id").as("ida"), col("v").as("va"), col("bucket"))
    val b = withBucket.select(col("id").as("idb"), col("v").as("vb"), col("bucket"))
    a.join(b, Seq("bucket")).where(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
