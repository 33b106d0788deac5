package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorOps

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compressed-domain half of the
  * FAISS-style IVF-PQ serving stack, next to [[IvfIndex]]'s coarse
  * cells and int8 codes.
  *
  * The vector's dim axis splits into `m` contiguous subspaces; each
  * subspace gets its own `ksub`-centroid codebook, and a vector stores
  * only its m nearest-sub-centroid indices — m bytes instead of 4·dim
  * (dim 64 / m 16: 16 bytes, 16× narrower than float32, 4× narrower
  * than [[IvfIndex]]'s int8 codes). Search never reconstructs: the
  * query precomputes an m×ksub table of partial dot products
  * driver-side, and each row's approximate dot is m table lookups over
  * its code bytes (asymmetric distance computation, ADC).
  *
  * Why this is THE 100 TB shape: ANN serving after partition pruning is
  * scan-I/O-bound, so bytes-per-vector is the lever — PQ reads 1/16 the
  * bytes and turns per-row math into table lookups; the codebooks
  * (m·ksub·subDim doubles — KBs) broadcast as literals. Training reads
  * the corpus once per Lloyd iteration with ALL m subspaces folding in
  * the SAME pass (assignment is a map-side codegen argmin per subspace;
  * the update shuffle carries m×ksub×partitions subDim-sized partials,
  * never vectors — the kmeans shape, m-fold).
  *
  * Everything is deterministic: hash-seeded init (the ksub
  * smallest-xxhash64 ids donate sub-vectors), sequential left-to-right
  * double sums — so candidate sets are stable run-to-run and the sim9
  * query hash-gates against sim1's EXACT oracle through the
  * candidates-then-verify rerank (the sim8 trick at 8× narrower
  * candidate I/O).
  */
object Pq {

  /** Trained PQ model: `books(s)(c)` is sub-centroid c of subspace s
    * (subDim doubles each); dim = m · subDim. */
  case class Model(books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def ksub: Int = books(0).length
    def subDim: Int = books(0)(0).length
  }

  /** 1-indexed slice of the sub-vector for subspace `s`. */
  private def sub(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Map-side code for subspace `s`: argmin over the codebook of
    * ||v_s − c||² = |v_s|² − 2·v_s·c + |c|²; the |v_s|² term is shared
    * by every candidate, so the argmin ranks −2·v_s·c + |c|² only —
    * ksub codegen'd dots over the subDim-wide slice, zero shuffle.
    * 0-based byte code. */
  private def codeFor(v: Column, book: Array[Array[Double]], s: Int,
      subDim: Int): Column = {
    val d2 = book.map { c =>
      var cn = 0.0
      c.foreach(x => cn += x * x)
      lit(-2.0) * VectorOps.dot(sub(v, s, subDim), typedlit(c)) + lit(cn)
    }
    (array_position(array(d2.toIndexedSeq: _*), array_min(array(d2.toIndexedSeq: _*)))
      - 1).cast("byte")
  }

  /** Train per-subspace codebooks: deterministic hash init (the ksub
    * smallest-xxhash64 rows donate their sub-vectors, the IvfIndex
    * centroid trick applied per subspace), then `iters` Lloyd rounds.
    * Each round is ONE corpus scan: every vector emits m (subspace,
    * code, sub-vector) rows map-side and the VecCentroid aggregator
    * folds them with map-side partials — the shuffle is
    * m·ksub·partitions sub-vector partials, never the corpus. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val seedRows = emb.orderBy(xxhash64(col(idCol)), col(idCol)).limit(ksub)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(seedRows.length == ksub,
      s"corpus has ${seedRows.length} rows < ksub=$ksub codebook entries")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
      seedRows.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    val base = emb.select(col(vecCol).as("v")).persist()
    for (_ <- 1 to iters) {
      val bks = books
      // (s·ksub + code, sub-vector) for all m subspaces of each row, in
      // one pass; the flat Int key keeps the group count at m·ksub
      val parts = base.select(explode(array((0 until m).map(s =>
          struct((codeFor(col("v"), bks(s), s, subDim).cast("int") + lit(s * ksub))
            .as("g"), sub(col("v"), s, subDim).cast("array<float>").as("sv"))): _*))
          .as("e"))
        .select(col("e.g"), col("e.sv")).as[(Int, Array[Float])]
        .groupByKey(_._1)
        .agg(graft.functions.VecCentroid.toColumn.name("c"))
        .collect().toMap
      books = Array.tabulate(m)(s => Array.tabulate(ksub)(c =>
        parts.get(s * ksub + c).map(_.values).getOrElse(books(s)(c))))
    }
    base.unpersist()
    Model(books)
  }

  /** Append the m-byte code column: one map-side pass, m codegen'd
    * argmins. At 100 TB this column is PERSISTED next to (or instead
    * of) the vectors and every later ADC pass reads only it. */
  def encode(emb: DataFrame, vecCol: String, model: Model,
      codeCol: String = "pq_codes"): DataFrame =
    emb.withColumn(codeCol, array((0 until model.m).map(s =>
      codeFor(col(vecCol), model.books(s), s, model.subDim)): _*))

  /** ADC approximate cosine of the RECONSTRUCTED vector against
    * `query`, computed entirely from the code bytes: dot and norm are m
    * lookups each into query-specific / model-static tables (subspaces
    * are disjoint, so |v̂|² = Σ_s |c_{s,code_s}|² exactly). No vector
    * column is touched. */
  def adcCosine(codeCol: Column, model: Model, query: Array[Double]): Column = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val dotLut = Array.tabulate(model.m) { s =>
      val qs = query.slice(s * model.subDim, (s + 1) * model.subDim)
      model.books(s).map { c =>
        var d = 0.0
        var i = 0
        while (i < c.length) { d += c(i) * qs(i); i += 1 }
        d
      }
    }
    val normLut = Array.tabulate(model.m)(s => model.books(s).map { c =>
      var n = 0.0
      c.foreach(x => n += x * x)
      n
    })
    def lookups(luts: Array[Array[Double]]): Column =
      (0 until model.m).map(s => element_at(typedlit(luts(s)),
        element_at(codeCol, s + 1).cast("int") + 1)).reduce(_ + _)
    lookups(dotLut) / (sqrt(lookups(normLut)) * lit(qn))
  }

  /** Top-k by exact cosine, with candidate generation in CODE space:
    * rank the corpus by ADC cosine reading only the m-byte code column,
    * take `candidates`, then score just those at full width — the sim8
    * candidates-then-verify shape with 8-16× narrower candidate I/O.
    * Deterministic model ⇒ stable candidate set ⇒ the caller can gate
    * against the exact-oracle top-k (sim9). */
  def topK(emb: DataFrame, idCol: String, vecCol: String, model: Model,
      queryId: Long, k: Int, candidates: Int): DataFrame = {
    val enc = encode(emb, vecCol, model).select(col(idCol).as("id"), col("pq_codes"))
    val qv = emb.where(col(idCol) === queryId).select(col(vecCol))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    val cand = enc.where(col("id") =!= queryId)
      .select(col("id"), adcCosine(col("pq_codes"), model, qv).as("acos"))
      .orderBy(col("acos").desc, col("id"))
      .limit(candidates)
      .select(col("id"))
    // exact verify with Similarity.cosine's arithmetic — identical ops
    // to bruteForceTopK, so sim9 shares sim1's oracle
    val q = emb.where(col(idCol) === queryId)
      .select(transform(col(vecCol), _.cast("double")).as("qv"))
    emb.join(broadcast(cand), emb(idCol) === cand("id"))
      .join(broadcast(q))
      .select(col("id"),
        Similarity.cosine(transform(col(vecCol), _.cast("double")), col("qv"))
          .as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
