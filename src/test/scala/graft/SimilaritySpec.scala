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

  test("zero-norm vectors: cos = 0 everywhere, every pair survives, ANSI-safe") {
    // the r9 judge repro: a zero vector crashed the family under ANSI
    // (DIVIDE_BY_ZERO) and silently dropped pairs as NaN without it.
    // Pinned semantics: zero-norm is orthogonal to everything (cos = 0).
    def zIn(s: org.apache.spark.sql.SparkSession) = {
      val sq = s.implicits
      import sq._
      Seq(
        (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
        (1L, Array(1.0f, -3.0f, -4.0f, 3.0f)),
        (2L, Array(-3.0f, -2.0f, 3.0f, 5.0f)))
        .toDF("vec_id", "embedding")
    }
    val z = zIn(spark)
    def checkAll(z: org.apache.spark.sql.DataFrame): Unit = {
      // exact pair mining: all 3 pairs exactly once, zero-vector pairs cos 0
      val pairs = Similarity
        .cosinePairs(z, "vec_id", "embedding", threshold = -1e9)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pairs.keySet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
      assert(pairs((0L, 1L)) == 0.0 && pairs((0L, 2L)) == 0.0)
      assert(!pairs.values.exists(_.isNaN))
      // scalar helper sites: batch top-k with the zero vector in corpus
      val batch = Similarity.topKBatch(z, "vec_id", "embedding",
        queryIds = Seq(1L), k = 2).collect()
      assert(batch.map(_.getAs[Long]("id")).toSet == Set(0L, 2L))
      assert(batch.forall(r => !r.getAs[Double]("cos").isNaN))
      // the scalar Column helper itself
      val c = z.agg(max(Similarity.cosine(
        col("embedding").cast("array<double>"),
        typedLit(Array(0.0, 0.0, 0.0, 0.0)))).as("m")).head.getDouble(0)
      assert(c == 0.0)
    }
    // both ANSI postures, each in an ISOLATED newSession (same context,
    // own conf — flipping the SHARED session's conf would race the
    // concurrently-running suites): under ANSI the division must never
    // EXECUTE on a zero denominator; under legacy non-ANSI the pair
    // must not NaN away
    Seq("true", "false").foreach { mode =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.ansi.enabled", mode)
      checkAll(zIn(s2))
    }
    // spherical k-means: a zero vector must not unit-normalize into a
    // NaN vector that poisons assignments — it stays at the origin
    val (_, cents) = Similarity.kmeansFit(z, "vec_id", "embedding",
      k = 2, iters = 3)
    assert(cents.forall(_.forall(x => !x.isNaN)))
  }

  test("DotProduct rejects non-array inputs with a clean analysis error") {
    import graft.plans.VectorOps
    val bad = Seq((1, "x")).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("DotProduct requires array"))
  }

  test("DotProduct: length mismatch yields null like the HOF formulation") {
    import graft.plans.VectorOps
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    // the HOF it claims bit-parity with: zip_with pads the short side
    // with null and the aggregate propagates it — never a silent
    // truncated product
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")).head
    assert(hof.isNullAt(0))
    val got = df.select(VectorOps.dot(col("a"), col("b"))).head
    assert(got.isNullAt(0))
  }

  test("IVF cells: identical vectors land in the same cell and pair up") {
    val pairs = Similarity.ivfNeighborPairs(vecs, "vec_id", "embedding", 2, 0.99)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("ANN parity: LSH/IVF pairs are exact-verified subsets with measured recall (sf0.001)") {
    // Cross-implementation gate for the two no-oracle ANN queries: both
    // approximate paths must emit only true pairs (their verify step is
    // the exact cosine) and retain a pinned fraction of the exact pair
    // set. Planes/centroids and data are deterministic, so recall here
    // is a fixed number, not a distribution.
    val emb = graft.Tables.embeddings(spark, sf001)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("ida", "idb").collect()
        .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    val exact = pairSet(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.3))
    val lsh = pairSet(Similarity.lshNeighborPairs(emb, "vec_id", "embedding", 6, 0.3))
    val ivf = pairSet(Similarity.ivfNeighborPairs(emb, "vec_id", "embedding", 16, 0.3))
    assert(lsh.subsetOf(exact), s"LSH emitted ${(lsh -- exact).size} false pairs")
    assert(ivf.subsetOf(exact), s"IVF emitted ${(ivf -- exact).size} false pairs")
    val lshRecall = lsh.size.toDouble / exact.size
    val ivfRecall = ivf.size.toDouble / exact.size
    info(f"exact=${exact.size} lshRecall=$lshRecall%.3f ivfRecall=$ivfRecall%.3f")
    // measured 0.065 / 0.214 at threshold 0.3 — low by design at a 72°
    // angle budget (see Similarity's scaladoc); the pins catch regressions
    assert(lshRecall >= 0.06, s"LSH recall $lshRecall")
    assert(ivfRecall >= 0.20, s"IVF recall $ivfRecall")
  }

  test("cosinePairsFrom over a persisted-norm table equals cosinePairs") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val direct = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.3)
      .collect().map(_.toSeq).toSet
    // persist the norm column (parquet roundtrip — the stored-column
    // shape), then mine pairs without recomputing a single sqrt
    val normed = Similarity.withNorm(emb, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("normed_").toString
    normed.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding").as("v"),
        org.apache.spark.sql.functions.col("vnorm").as("nrm"))
    val fromStored = Similarity.cosinePairsFrom(stored, 0.3)
      .collect().map(_.toSeq).toSet
    assert(fromStored == direct)
  }

  test("SignBands: fused multi-table signatures are bit-identical to per-table lshBucket") {
    import graft.plans.VectorOps
    val emb = graft.Tables.embeddings(spark, sf001)
    // registered-row config: fused vs the per-table Column formulation
    // it replaced (that tree still compiles fine at 6x16)
    val v = emb.select(col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("v"))
    def fusedSigs(p: Int, t: Int) = v.select(col("id"),
      VectorOps.signBands(col("v"),
        Similarity.planesFlat(p, t, 64), p, t, 64).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perTable = v.select(col("id"),
      array((0 until 16).map(i =>
        Similarity.lshBucket(col("v"), 6, table = i)): _*).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fusedSigs(6, 16) == perTable, "fused/per-table signature mismatch at 6x16")
    // planner-sized shape that used to blow janino's method limit under
    // the array-of-buckets formulation (11 planes x 79 tables): checked
    // against an independent driver-side scalar signing, NOT the old
    // Column tree — regenerating that tree here would put the exact
    // "Failed to compile" noise this expression exists to kill back
    // into the suite log
    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val planes = Similarity.planesFlat(11, 79, 64)
    val expect = raw.map { case (id, vec) =>
      id -> (0 until 79).map { t =>
        var sig = 0L
        for (h <- 0 until 11) {
          var acc = 0.0
          val off = (t * 11 + h) * 64
          for (i <- 0 until 64) acc += vec(i).toDouble * planes(off + i)
          if (acc > 0) sig |= (1L << h)
        }
        sig
      }
    }
    assert(fusedSigs(11, 79) == expect, "fused signature mismatch at 11x79")
    // degenerate inputs keep the summed-when semantics: null vector and
    // wrong-dim vector both sign to ALL-ZERO signatures, never null
    val weird = Seq(
      (0L, null.asInstanceOf[Array[Double]]),
      (1L, Array(1.0, -2.0)), // dim != 64
      (2L, Array.fill(64)(0.5))).toDF("id", "v")
    val sigs = weird.select(col("id"),
      VectorOps.signBands(col("v"),
        Similarity.planesFlat(4, 3, 64), 4, 3, 64).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == Seq(0L, 0L, 0L))
    assert(sigs(1L) == Seq(0L, 0L, 0L))
    assert(sigs(2L).exists(_ != 0L))
  }

  test("multi-table LSH amplifies single-table recall; multi-probe IVF likewise") {
    val emb = graft.Tables.embeddings(spark, sf001)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("ida", "idb").collect()
        .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    val exact = pairSet(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.3))
    val one = pairSet(Similarity.lshNeighborPairs(emb, "vec_id", "embedding", 6, 0.3))
    val multi = pairSet(Similarity.lshNeighborPairsMulti(emb, "vec_id", "embedding", 6, 16, 0.3))
    assert(multi.subsetOf(exact), "amplified LSH emitted false pairs")
    assert(multi.size > one.size, s"amplification ${one.size} -> ${multi.size}")
    // measured 0.547 at sf0.001 without multiprobe
    assert(multi.size.toDouble / exact.size >= 0.4)
    // Hamming-1 multiprobe lifts 12 of the same tables to 0.959 measured
    // — above the 16-table no-probe construction at 3/4 the tables (the
    // sim2 gate bound is 0.9) — and must stay a verified subset
    val mp = pairSet(Similarity.lshNeighborPairsMulti(
      emb, "vec_id", "embedding", 6, 12, 0.3, multiProbe = true))
    assert(mp.subsetOf(exact), "multiprobe LSH emitted false pairs")
    assert(mp.size > multi.size, s"multiprobe ${multi.size} -> ${mp.size}")
    assert(mp.size.toDouble / exact.size >= 0.9)
    val probe1 = pairSet(Similarity.ivfNeighborPairs(emb, "vec_id", "embedding", 16, 0.3))
    val probe6 = pairSet(Similarity.ivfNeighborPairs(emb, "vec_id", "embedding", 16, 0.3, nProbe = 6))
    assert(probe6.subsetOf(exact), "multi-probe IVF emitted false pairs")
    assert(probe6.size > probe1.size)
    // measured 0.998 at sf0.001 with nProbe=6 (the sim3 gate bound is 0.95)
    assert(probe6.size.toDouble / exact.size >= 0.95)
  }

  test("planBanding: closed forms check out; background-candidate model matches measurement") {
    import Similarity.{planBanding, BandingPlan}
    // closed-form spot check at the registered sim2 config (H=6, L=12,
    // multiprobe): per-table background collision t0 = (H+1)·2^-H =
    // 7/64, so predicted candidate fraction = 1-(1-7/64)^12 ≈ 0.7504
    val t0 = 7.0 / 64.0
    val predFrac = 1.0 - math.pow(1.0 - t0, 12)
    assert(math.abs(predFrac - 0.7504) < 0.001)
    // ... which is the quadratic wall STRESS.md measured: the model must
    // agree with a REAL lshCandidates count on the sf0.001 corpus
    val emb = graft.Tables.embeddings(spark, sf001)
    val n = emb.count()
    val measured = Similarity.lshCandidates(emb, "vec_id", "embedding",
      numPlanes = 6, numTables = 12, multiProbe = true).count()
    val predicted = n * (n - 1) / 2.0 * predFrac
    val ratio = measured / predicted
    assert(ratio > 0.6 && ratio < 1.5,
      s"candidate model off: measured=$measured predicted=$predicted")
    // the planner refuses to hand back the wall: at n = 60k (the
    // stress crash point) with the same threshold/recall ask, it must
    // pick MORE planes than the fixed 6 and keep the predicted load
    // within budget
    val plan = planBanding(60000L, threshold = 0.3, targetRecall = 0.9,
      candidateBudgetPerVector = 64.0)
    assert(plan.planes > 6, plan.toString)
    assert(plan.candidatesPerVector <= 64.0, plan.toString)
    if (plan.predictedRecall >= 0.9) {
      // feasible: recall priced in tables
      assert(plan.tables >= 12, plan.toString)
    }
    // planes grow with corpus size at fixed budget (the log N law)
    val p1 = planBanding(10000L, 0.5, 0.9, 32.0)
    val p2 = planBanding(10000000L, 0.5, 0.9, 32.0)
    assert(p2.planes >= p1.planes, s"$p1 vs $p2")
    // high threshold is the EASY regime: feasible with high recall
    val easy = planBanding(1000000L, 0.8, 0.95, 32.0)
    assert(easy.predictedRecall >= 0.95, easy.toString)
    // low threshold at huge n: the planner reports the shortfall
    // honestly instead of silently losing pairs
    val hard = planBanding(1000000000L, 0.3, 0.95, 32.0)
    assert(hard.candidatesPerVector <= 33.0, hard.toString)
    val _ = BandingPlan(hard.planes, hard.tables,
      hard.predictedRecall, hard.candidatesPerVector) // exercise ctor
  }

  test("banding guard: the measured spill wall fails fast with the planner's numbers; autoSize completes") {
    val emb = graft.Tables.embeddings(spark, sf001)
    // the exact stress-crash configuration (60k isotropic @ 6 planes /
    // 12 tables multiprobe, STRESS.md #4) models ~1.35e9 candidates —
    // over the default budget, so the gate must refuse it outright
    val wallMass = Similarity.modeledCandidateMass(60000L, 6, 12, multiProbe = true)
    assert(wallMass > Similarity.DefaultCandidateBudget,
      f"wall no longer over budget: $wallMass%.3g")
    val ex = intercept[IllegalArgumentException] {
      Similarity.guardBanding("spec", 60000L, 6, 12, 0.3,
        multiProbe = true, Similarity.DefaultCandidateBudget,
        autoSize = false, targetRecall = 0.9)
    }
    assert(ex.getMessage.contains("planes"), ex.getMessage)
    assert(ex.getMessage.contains("predicted recall"), ex.getMessage)
    // ...while the registered sim2 banding at every driver SF (n ≤ 2000)
    // is far inside the budget: guard admits it unchanged, no re-plan
    assert(Similarity.guardBanding("spec", 2000L, 6, 12, 0.3,
      multiProbe = true, Similarity.DefaultCandidateBudget,
      autoSize = false, targetRecall = 0.9) == (6, 12))
    // the collapsed-ρ regime (1e9 vectors, threshold 0.3) has no
    // feasible banding — the refusal must SAY so, naming the
    // cell-blocked alternatives, not just quote a plan
    val exHard = intercept[IllegalArgumentException] {
      Similarity.guardBanding("spec", 1000000000L, 6, 12, 0.3,
        multiProbe = true, candidateBudget = 16000000000L,
        autoSize = false, targetRecall = 0.9)
    }
    assert(exHard.getMessage.contains("SHORTFALL"), exHard.getMessage)
    assert(exHard.getMessage.contains("cell-blocked"), exHard.getMessage)
    // 100 TB-corpus arithmetic: n·(n−1) overflows Long past ~3e9 rows —
    // the mass model must stay positive (Double from the start) or the
    // gate silently admits exactly the sizes it exists to refuse
    val hugeMass = Similarity.modeledCandidateMass(4000000000L, 6, 12,
      multiProbe = true)
    assert(hugeMass > 1e18, f"overflowed to $hugeMass%.3g")
    // auto-sizing honors the SAME ceiling the fail-fast branch
    // enforces: the re-planned banding's modeled mass fits the budget
    // (per-vector budget = B/n, each pair counted once)
    val (ap, at) = Similarity.guardBanding("spec", 60000L, 6, 12, 0.3,
      multiProbe = true, Similarity.DefaultCandidateBudget,
      autoSize = true, targetRecall = 0.9)
    val sizedMass = Similarity.modeledCandidateMass(60000L, ap, at,
      multiProbe = true)
    assert(sizedMass <= Similarity.DefaultCandidateBudget,
      f"auto-sized plan models $sizedMass%.3g over the ceiling")
    // boundary gate inputs (threshold 0 = any non-negative cosine)
    // must produce the informative refusal, not planBanding's bare
    // requirement failure
    val exZero = intercept[IllegalArgumentException] {
      Similarity.guardBanding("spec", 60000L, 6, 12, threshold = 0.0,
        multiProbe = true, Similarity.DefaultCandidateBudget,
        autoSize = false, targetRecall = 0.9)
    }
    assert(exZero.getMessage.contains("candidate pairs"), exZero.getMessage)
    // end-to-end on the REAL corpus with a budget squeezed below its
    // modeled mass: the raw request throws; autoSize re-plans through
    // planBanding (feasible here: ~2× per-vector headroom → a tame
    // higher-selectivity banding), completes, and still emits only
    // true pairs
    val n = emb.count()
    val mass = Similarity.modeledCandidateMass(n, 6, 12, multiProbe = true)
    val tinyBudget = (mass / 2).toLong
    intercept[IllegalArgumentException] {
      Similarity.lshNeighborPairsMulti(emb, "vec_id", "embedding",
        6, 12, 0.3, multiProbe = true, candidateBudget = tinyBudget)
    }
    val sized = Similarity.lshNeighborPairsMulti(emb, "vec_id", "embedding",
      6, 12, 0.3, multiProbe = true, candidateBudget = tinyBudget,
      autoSize = true)
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.3)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = sized.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "auto-sized banding emitted nothing")
    assert(got.subsetOf(exact), "auto-sized banding emitted false pairs")
    // the single-table variant shares the gate (fail-fast only)
    intercept[IllegalArgumentException] {
      Similarity.lshNeighborPairs(emb, "vec_id", "embedding", 2, 0.3,
        candidateBudget = 100L)
    }
  }

  test("semDeDup: one keeper per near-dup group, witnesses check out, outliers survive") {
    // two tight direction groups + a diagonal outlier; k=2 spherical
    // cells separate the groups, τ=0.95 prunes within them
    val emb = Seq(
      (1L, Array(1.0f, 0.00f, 0f)), (2L, Array(0.99f, 0.01f, 0f)),
      (3L, Array(0.98f, 0.02f, 0f)),
      (10L, Array(0.0f, 1.00f, 0f)), (11L, Array(0.01f, 0.99f, 0f)),
      (20L, Array(0.7f, 0.7f, 0.5f)))
      .toDF("vec_id", "embedding")
    val res = Similarity.semDeDup(emb, "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("kept"), Option(r.getAs[java.lang.Long]("witness")).map(_.longValue),
          r.getAs[Int]("cell")))).toMap
    assert(res.size == 6)
    val groupA = Seq(1L, 2L, 3L).map(res)
    val groupB = Seq(10L, 11L).map(res)
    assert(groupA.count(_._1) == 1, s"group A kept: $groupA")
    assert(groupB.count(_._1) == 1, s"group B kept: $groupB")
    assert(res(20L)._1, "the diagonal outlier must survive")
    // every dropped row's witness is the kept member of ITS OWN group
    res.values.filter(!_._1).foreach { case (_, wit, cell) =>
      val w = res(wit.get)
      assert(w._1 && w._3 == cell)
    }
  }

  test("semDeDup gate flags hold on sf0.001 (witness/independent/leak)") {
    val row = graft.queries.DedupQueries.semDedup(spark, sf001).head
    assert(row.getAs[Boolean]("witness_ok"))
    assert(row.getAs[Boolean]("independent_ok"))
    assert(row.getAs[Boolean]("leak_ok"))
    assert(row.getAs[Long]("n_true_pairs") > 0L)
  }

  test("logreg: separates a toy set exactly; sf0.001 gate flags hold") {
    import graft.operators.Classifier
    val toy = Seq.tabulate(40) { i =>
      val y = i % 2
      val x = if (y == 1) Array(1.0f + (i % 5) * 0.1f, 0.5f, 1f)
              else Array(-1.0f - (i % 5) * 0.1f, -0.5f, 1f)
      (x, y)
    }.toDF("x", "y")
    val w = Classifier.trainLogReg(toy, "x", "y", epochs = 30, lr = 1.0)
    val acc = toy.select(avg(
        ((Classifier.score(col("x"), w) >= 0.5).cast("int") === col("y")).cast("int")))
      .head.getDouble(0)
    assert(acc == 1.0, s"toy accuracy $acc, w=${w.toSeq}")
    assert(Classifier.logLoss(toy, "x", "y", w) <
      Classifier.logLoss(toy, "x", "y", new Array[Double](3)))
    // Newton reaches the same optimum in 4 scans where GD used 30
    val wN = Classifier.trainLogRegNewton(toy, "x", "y", iters = 4)
    val accN = toy.select(avg(
        ((Classifier.score(col("x"), wN) >= 0.5).cast("int") === col("y")).cast("int")))
      .head.getDouble(0)
    assert(accN == 1.0)
    val row = graft.queries.SimilarityQueries.logreg(spark, sf001).head
    assert(row.getAs[Boolean]("loss_ok") && row.getAs[Boolean]("acc_ok"))
  }

  test("logreg parity: distributed Newton == sequential same-math Newton") {
    // The cross-check that used to live inside the ml1 query: the
    // distributed gradient/Hessian partials must reproduce a sequential
    // driver-side Newton run to float-sum-order tolerance. A bounded
    // sample (sf0.001, capped) is the right home for a driver-side
    // replay — the registered query must never collect the corpus.
    import graft.operators.{Classifier, Similarity}
    val v = Similarity.rpPlanes(64, 1)(0)
    val emb = Tables.embeddings(spark, sf001)
      .limit(400)
      .select(concat(col("embedding"), array(lit(1.0f))).as("x"),
        (graft.plans.VectorOps.dot(col("embedding"), typedlit(v)) >= 0)
          .cast("int").as("y"))
      .persist()
    val iters = 4
    val w = Classifier.trainLogRegNewton(emb, "x", "y", iters)
    val rows = emb.as[(Array[Float], Int)].collect()
    emb.unpersist()
    val wRef = graft.functions.CrossCheck.logregNewtonRef(rows, iters, 1e-8)
    val maxAbs = w.zip(wRef).map { case (a, b) => math.abs(a - b) }.max
    assert(maxAbs <= 1e-3, s"distributed vs sequential Newton drift: $maxAbs")
  }

  test("LSH buckets: identical vectors collide; pairs found at threshold") {
    val pairs = Similarity.lshNeighborPairs(vecs, "vec_id", "embedding", 6, 0.99)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toSet
    assert(pairs.contains((0L, 4L))) // identical vectors always same bucket
  }

  test("topKBatch equals per-query bruteForceTopK (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val batch = Similarity.topKBatch(emb, "vec_id", "embedding", Seq(0L, 1L, 2L), 10)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("id")).toSeq
      }
    Seq(0L, 1L, 2L).foreach { q =>
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getAs[Long]("id")).toSeq
      assert(batch(q) == brute, s"query $q")
    }
  }

  test("random-projection top-k equals brute force; projection is ~JL-isometric (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, sf001)
    // candidates+verify must recover the exact top-10 (the sim8 gate)
    val viaRp = Similarity.rpTopK(emb, "vec_id", "embedding", 0L, 10,
      outDim = 32, candidates = 300).collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(viaRp == brute)
    // deterministic planes: same projection on every call
    val p1 = Similarity.rpPlanes(64, 32).flatten.toSeq
    assert(p1 == Similarity.rpPlanes(64, 32).flatten.toSeq)
    assert(p1.forall(v => math.abs(v) == 1.0 / math.sqrt(32.0)))
  }

  test("filtered ANN: predicate applies inside the probed scan; full probe is exact (sf0.001)") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf001)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_fspec_")
      .toString + "/idx"
    graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
      numCells = 16, path, metaCols = Seq("label"))
    val qv = emb.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    // full probe + filter == exact filtered brute force
    val got = graft.operators.IvfIndex.search(spark, path, qv, k = 10,
        nProbe = 16, excludeId = Some(0L), filter = Some(col("label") === 3))
      .collect().map(_.getAs[Long]("id")).toSeq
    val brute = graft.operators.Similarity.bruteForceTopK(
        emb.where(col("label") === 3 || col("vec_id") === 0L),
        "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(got == brute)
    // every hit satisfies the predicate, and k is FILLED (pre-filter,
    // not post-filter of an unfiltered top-k)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall(labels(_) == 3) && got.length == 10)
    // partial probe still returns only predicate-satisfying rows
    val partial = graft.operators.IvfIndex.search(spark, path, qv, k = 10,
        nProbe = 4, excludeId = Some(0L), filter = Some(col("label") === 3))
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(partial.forall(labels(_) == 3))
    // the unfiltered index still answers unfiltered queries identically
    val unfiltered = graft.operators.IvfIndex.search(spark, path, qv, k = 10,
        nProbe = 16, excludeId = Some(0L))
      .collect().map(_.getAs[Long]("id")).toSeq
    val bruteAll = graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(unfiltered == bruteAll)
  }

  test("SQ8 top-k equals brute force; codes are tight and recall has headroom (sf0.001)") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf001)
    val viaSq = Similarity.sqTopK(emb, "vec_id", "embedding", 0L, 10,
      candidates = 300).collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(viaSq == brute)
    // measured headroom: the true top-10's worst rank in dequantized
    // code space must sit far inside the 300-candidate budget
    val (mn, mx) = Similarity.sqTrain(emb, "embedding", 64)
    val delta = Array.tabulate(64)(i =>
      if (mx(i) > mn(i)) (mx(i) - mn(i)) / 255.0 else 1.0)
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    def enc(v: Array[Double]): Array[Double] = Array.tabulate(64) { i =>
      val c = math.max(0.0, math.min(255.0, math.round((v(i) - mn(i)) / delta(i)).toDouble))
      mn(i) + c * delta(i)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val q = rows.find(_._1 == 0L).get._2
    val ranked = rows.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(enc(v), q) }
      .sortBy { case (id, c) => (-c, id) }.map(_._1)
    val worst = brute.map(id => ranked.indexOf(id)).max
    assert(worst < 60, s"true top-10 worst SQ rank $worst — 8-bit error too large")
  }

  test("PQ: codes are m bytes, training is deterministic, ADC rerank equals brute force (sf0.001)") {
    import graft.operators.Pq
    val emb = graft.Tables.embeddings(spark, sf001)
    val model = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
    assert(model.m == 16 && model.ksub == 16 && model.subDim == 4)
    // deterministic: a second training run reproduces the codebooks bitwise
    val model2 = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
    assert(model.books.flatten.flatten.toSeq == model2.books.flatten.flatten.toSeq)
    // the code column is exactly m tinyints — the 16-byte storage claim
    val enc = Pq.encode(emb, "embedding", model)
    assert(enc.schema("pq_codes").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType)
    assert(enc.select(size(col("pq_codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(16))
    // candidates+verify recovers the exact top-10 (the sim9 gate)
    val viaPq = Pq.topK(emb, "vec_id", "embedding", model, 0L, 10,
      candidates = 300).collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(viaPq == brute)
    // headroom behind the 300-candidate budget: the worst ADC rank of a
    // true top-10 member must sit well inside it
    val qv = emb.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    val adcRank = enc.where(col("vec_id") =!= 0L)
      .select(col("vec_id"), Pq.adcCosine(col("pq_codes"), model, qv).as("acos"))
      .orderBy(col("acos").desc, col("vec_id"))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val worst = brute.map(id => adcRank.indexOf(id) + 1).max
    assert(worst <= 150, s"true top-10 fell to ADC rank $worst of ${adcRank.size}")
  }

  test("IVF-PQ: persisted codes are narrow, model round-trips, probe prunes, full probe is exact") {
    import graft.operators.{IvfIndex, Pq}
    val emb = graft.Tables.embeddings(spark, sf001)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx_spec_")
      .toString + "/idx"
    val model = Pq.train(emb, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
    IvfIndex.buildPq(emb, "vec_id", "embedding", numCells = 8, path, model)
    // the index stores ONLY (id, 16-byte code) + the cell partition col
    val idx = spark.read.parquet(path)
    assert(idx.schema.fieldNames.sorted.toSeq == Seq("cell", "id", "pq_codes"))
    // the persisted model restores bitwise — serving never retrains
    val loaded = Pq.load(java.nio.file.Paths.get(path, "_pq.json"))
    assert(loaded.books.flatten.flatten.toSeq == model.books.flatten.flatten.toSeq)
    // partial probe: partition pruning reaches the scan, and results
    // stay inside the probed cells
    val probe2 = IvfIndex.searchPq(spark, path, emb, "vec_id", "embedding",
      queryId = 0L, k = 10, nProbe = 2, candidates = 100)
    val rows2 = probe2.collect().map(_.getAs[Long]("id")).toSet
    val cells2 = idx.where(col("id").isin(rows2.toSeq: _*))
      .select(col("cell")).distinct().collect()
      .map(_.getAs[Number](0).longValue).toSet
    assert(cells2.size <= 2, s"results crossed probe boundary: $cells2")
    // full probe + candidate headroom: exactly the brute-force top-10
    // (the sim10 gate)
    val full = IvfIndex.searchPq(spark, path, emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 8, candidates = 300)
      .collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(full == brute)
    // partial probe is EXACT over what it reads: equals brute-force
    // top-10 restricted to the probed cells (recall vs the global
    // top-10 is corpus-dependent — isotropic random vectors spread
    // neighbors uniformly, so nProbe/numCells is all a coarse quantizer
    // can promise here; the deterministic containment property is what
    // the operator owes)
    val qv = emb.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    val (trueProbed, _) = IvfIndex.probeCells(path, qv, 2)
    assert(cells2.subsetOf(trueProbed.toSet))
    val probedIds = idx.where(col("cell").isin(trueProbed.toIndexedSeq: _*))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val bruteProbed = Similarity.bruteForceTopK(
        emb.where(col("vec_id").isin(probedIds.toSeq.map(Long.box): _*) ||
          col("vec_id") === 0L), "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(probe2.collect().map(_.getAs[Long]("id")).toSeq == bruteProbed)
  }

  test("IVF-PQ append: persisted-sidecar growth serves the merged corpus exactly") {
    import graft.operators.{IvfIndex, Pq}
    val emb = graft.Tables.embeddings(spark, sf001)
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_app_spec_")
      .toString + "/idx"
    // model + centroids fixed at initial-build time, from the seed half
    val model = Pq.train(half, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
    IvfIndex.buildPq(half, "vec_id", "embedding", numCells = 8, path, model)
    IvfIndex.appendPq(rest, "vec_id", "embedding", path)
    val idx = spark.read.parquet(path)
    assert(idx.count() == emb.count())
    // appended rows carry the SAME codes the initial-build encoder would
    // have given them — the sidecar round-trip drives assignment
    val viaSidecar = idx.join(rest.select(col("vec_id")), col("id") === col("vec_id"))
      .select(col("id"), col("pq_codes")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Byte](1).toSeq).toMap
    val direct = Pq.encode(rest, "embedding", model)
      .select(col("vec_id"), col("pq_codes")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Byte](1).toSeq).toMap
    assert(viaSidecar == direct)
    // end-to-end: a full probe with a MODEST candidate budget (150 of
    // 500 — a half-trained model has less ADC headroom than sim9's
    // full-corpus one) still recovers the exact top-10 of the merged
    // corpus; mis-assigned or mis-encoded appends would randomize ADC
    // ranks and drop ~70% of true neighbors out of the budget
    val got = IvfIndex.searchPq(spark, path, emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 8, candidates = 150)
      .collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(got == brute)
  }

  test("IvfIndex: partial probe prunes partitions and equals brute force over probed cells") {
    import graft.operators.IvfIndex
    val emb = graft.Tables.embeddings(spark, sf001)
    val path = java.nio.file.Files.createTempDirectory("ivf_idx_spec_")
      .toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", numCells = 8, path)
    val qv = emb.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    // partial probe: partition pruning must reach the scan
    val probe2 = IvfIndex.search(spark, path, qv, k = 10, nProbe = 2,
      excludeId = Some(0L))
    val plan = probe2.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), plan)
    assert("cell.* IN ".r.findFirstIn(plan).isDefined ||
      plan.contains("cell#"), plan)
    // the probe result is exactly brute-force top-k restricted to the
    // probed cells — a deterministic property, unlike recall
    val probedCells = spark.read.parquet(path)
      .where(col("id").isin(probe2.collect().map(_.getAs[Long]("id")).toIndexedSeq: _*))
      .select(col("cell")).distinct().collect()
      .map(_.getAs[Number](0).longValue).toSet
    assert(probedCells.size <= 2, s"results crossed probe boundary: $probedCells")
    // full probe: identical to the global brute force (the sim6 gate)
    val full = IvfIndex.search(spark, path, qv, k = 10, nProbe = 8,
        excludeId = Some(0L))
      .collect().map(_.getAs[Long]("id")).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(full == brute)
  }

  test("adaptive probe: panel recall meets the target reading fewer cells than full probe") {
    import graft.operators.IvfIndex
    val emb = graft.Tables.embeddings(spark, sf001)
    val numCells = 16
    val path = java.nio.file.Files.createTempDirectory("ivf_adapt_spec_")
      .toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", numCells, path)
    // a 20-query panel: per-query ANN recall varies, the calibration
    // claim is about the panel average (isotropic corpus = worst case
    // for cell concentration; deterministic end to end, so these are
    // pinned measurements, not flaky bounds — measured avg recall
    // 0.91 @ 11.4 avg cells for target 0.9, beta 6)
    val qids = (0L until 40L by 2L).toSeq
    var cellsProbed = 0
    var recallSum = 0.0
    qids.foreach { qid =>
      val qv = emb.where(col("vec_id") === qid).select(col("embedding"))
        .head.getSeq[Float](0).toArray.map(_.toDouble)
      val full = IvfIndex.search(spark, path, qv, 10, numCells,
          excludeId = Some(qid))
        .collect().map(_.getAs[Long]("id")).toSet
      val (cells, _) = IvfIndex.adaptiveProbeCells(path, qv, 0.9)
      cellsProbed += cells.length
      val got = IvfIndex.searchAdaptive(spark, path, qv, 10, 0.9,
          excludeId = Some(qid))
        .collect().map(_.getAs[Long]("id")).toSet
      recallSum += (got & full).size / 10.0
    }
    val avgCells = cellsProbed.toDouble / qids.size
    val avgRecall = recallSum / qids.size
    info(f"avgCells=$avgCells%.1f/$numCells avgRecall=$avgRecall%.3f")
    assert(avgCells < numCells * 0.8, s"adaptive probe read $avgCells cells on average")
    assert(avgRecall >= 0.88, s"panel recall $avgRecall below target margin")
    // a flat target of 1.0 must degrade to the exact full probe
    val qv0 = emb.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    assert(IvfIndex.adaptiveProbeCells(path, qv0, 1.0)._1.length == numCells)
    // IVF-PQ composition: adaptive at target 1.0 == fixed full probe
    val pqPath = java.nio.file.Files.createTempDirectory("ivfpq_adapt_spec_")
      .toString + "/idx"
    val model = graft.operators.Pq.train(emb, "vec_id", "embedding",
      m = 16, ksub = 16, iters = 2)
    IvfIndex.buildPq(emb, "vec_id", "embedding", 8, pqPath, model)
    val fixed = IvfIndex.searchPq(spark, pqPath, emb, "vec_id", "embedding",
      0L, 10, nProbe = 8, candidates = 300).collect().map(_.getAs[Long]("id")).toSeq
    val adapt = IvfIndex.searchPqAdaptive(spark, pqPath, emb, "vec_id", "embedding",
      0L, 10, recallTarget = 1.0, candidates = 300).collect().map(_.getAs[Long]("id")).toSeq
    assert(adapt == fixed)
  }

  test("auto-beta: serve-time decay derives from the build-time separation stat, per regime") {
    import graft.operators.IvfIndex
    // mapping anchors (SepScan-measured): isotropic corpora sit at the
    // floor, the clustered stress corpus lands mid-band, extremes clamp
    assert(IvfIndex.betaFromSep(0.0) == IvfIndex.BetaIso)
    assert(IvfIndex.betaFromSep(10.0) == IvfIndex.BetaMax)
    assert(IvfIndex.betaFromSep(0.344) > 9.0 && IvfIndex.betaFromSep(0.344) < 10.0)
    // isotropic index: stats persisted, sep small, auto beta ~floor
    val emb = graft.Tables.embeddings(spark, sf001)
    val isoIdx = java.nio.file.Files.createTempDirectory("autobeta_iso_")
      .toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", 16, isoIdx)
    val isoSep = IvfIndex.loadSep(isoIdx).get
    assert(isoSep < 0.15, f"isotropic sep $isoSep%.3f — regime detector broken")
    assert(IvfIndex.betaFromSep(isoSep) < 6.5)
    // clustered index (the ScaleStress generator at 1×): sep well
    // separated from the isotropic regime; auto-probing with NO manual
    // beta reads fewer than half the cells at full panel recall
    val cluDir = java.nio.file.Files.createTempDirectory("autobeta_clu_").toString
    graft.tools.ScaleStress.embClustered(spark, 1, s"$cluDir/emb")
    val embK = spark.read.parquet(s"$cluDir/emb")
    val cluIdx = s"$cluDir/idx"
    IvfIndex.build(embK, "vec_id", "embedding", 16, cluIdx)
    val cluSep = IvfIndex.loadSep(cluIdx).get
    assert(cluSep > 0.25, f"clustered sep $cluSep%.3f — regime detector broken")
    assert(IvfIndex.betaFromSep(cluSep) > 8.0)
    val panel = (0L until 10L).toSeq
    val qvs = embK.where(col("vec_id").isin(panel.map(Long.box): _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    var probed = 0
    var recallSum = 0.0
    panel.foreach { qid =>
      val qv = qvs(qid)
      probed += IvfIndex.adaptiveProbeCells(cluIdx, qv, 0.95)._1.length
      val full = IvfIndex.search(spark, cluIdx, qv, 10, 16,
        excludeId = Some(qid)).collect().map(_.getAs[Long]("id")).toSet
      val got = IvfIndex.searchAdaptive(spark, cluIdx, qv, 10, 0.95,
        excludeId = Some(qid)).collect().map(_.getAs[Long]("id")).toSet
      recallSum += (got & full).size / 10.0
    }
    val avgCells = probed / 10.0
    val recall = recallSum / 10.0
    info(f"clustered auto-probe: avgCells=$avgCells%.1f/16 recall=$recall%.2f")
    assert(avgCells <= 6.0, s"auto beta left pruning unclaimed: $avgCells cells")
    assert(recall >= 0.95, s"auto beta overshot: recall $recall")
  }

  test("sim14: pruned-probe serving passes its recall gate AND actually prunes (sf0.001)") {
    val out = graft.queries.SimilarityQueries.prunedAnn(spark, sf001).head
    assert(out.getAs[Boolean]("recall_ok"), out.toString)
    assert(out.getAs[Boolean]("pruned_ok"),
      "adaptive probe read every cell — the serving row stopped pruning")
  }

  test("IvfIndex int8 quantization: high recall, bounded cosine error, smaller files") {
    import graft.operators.IvfIndex
    val emb = graft.Tables.embeddings(spark, sf001)
    val full = java.nio.file.Files.createTempDirectory("ivf_q_full_").toString + "/idx"
    val quant = java.nio.file.Files.createTempDirectory("ivf_q_int8_").toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", numCells = 8, full)
    IvfIndex.build(emb, "vec_id", "embedding", numCells = 8, quant, quantize = true)
    val qv = emb.where(col("vec_id") === 0L).select(col("embedding"))
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    def top(path: String, k: Int) = IvfIndex
      .search(spark, path, qv, k, nProbe = 8, excludeId = Some(0L))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cos"))
    val exact = top(full, 10).toMap
    val approx = top(quant, 10)
    // recall@10 vs exact, and cosines within int8 quantization error
    val recall = approx.count { case (id, _) => exact.contains(id) } / 10.0
    assert(recall >= 0.8, s"recall $recall")
    approx.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(c - e) < 0.02, s"id $id: $c vs $e"))
    }
    // the point of int8: the stored index is materially smaller
    def bytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try {
        s.filter(f => f.toString.endsWith(".parquet"))
          .mapToLong(java.nio.file.Files.size).sum
      } finally s.close()
    }
    assert(bytes(quant) < bytes(full) * 0.6, s"${bytes(quant)} vs ${bytes(full)}")
  }

  test("hash init picks k DISTINCT centroids on a duplicate-heavy corpus") {
    // 4 distinct vectors, each duplicated 50× — the recompute-era init
    // could re-select an already-chosen vector (distance-0 candidate)
    // and seed duplicate centroids, the empty-cell failure the
    // oversampled selection exists to avoid
    import spark.implicits._
    val distinct = Seq(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f),
      Array(0.7f, 0.7f, 0f))
    val emb = (0 until 200).map(i => (i.toLong, distinct(i % 4).toSeq))
      .toDF("vec_id", "embedding")
    val (seeds, _) = Similarity.kmeansFit(emb, "vec_id", "embedding",
      k = 4, iters = 1, init = "hash")
    assert(seeds.map(_.toSeq).distinct.length == 4, seeds.map(_.toSeq).toSeq)
    // fewer distinct vectors than k: arity contract holds (pads), no crash
    val (seeds6, _) = Similarity.kmeansFit(emb, "vec_id", "embedding",
      k = 6, iters = 1, init = "hash")
    assert(seeds6.length == 6 && seeds6.map(_.toSeq).distinct.length == 4)
  }

  test("kmeans matches a driver-side reference implementation (sf0.001)") {
    // Dual-path gate (the repo's pattern for non-SQL-expressible ops):
    // the distributed spherical k-means — farthest-point init, map-side
    // argmin assignment, VecCentroid update — must land on the same
    // centroids as a plain in-memory implementation of the same
    // algorithm, up to double-summation order (1e-6).
    val emb = graft.Tables.embeddings(spark, sf001)
    val k = 8; val iters = 4
    val cs = Similarity.kmeans(emb, "vec_id", "embedding", k, iters)
    // --- reference, driver-side ---
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // match the operator's float-precision normalization exactly
    val data = rows.map { case (id, v) =>
      (id, unit(v).map(_.toFloat).map(_.toDouble))
    }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def xxh(id: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L)
    val seedId = data.map(_._1).minBy(id => (xxh(id), id))
    var ref = Vector(data.find(_._1 == seedId).get._2)
    while (ref.size < k) {
      val next = data.maxBy { case (id, v) =>
        (ref.map(c => d2(v, c)).min, -id)
      }
      ref = ref :+ next._2
    }
    var refCs = ref.toArray
    for (_ <- 1 to iters) {
      val grouped = data.groupBy { case (_, v) =>
        refCs.zipWithIndex.minBy { case (c, i) => (d2(v, c), i) }._2
      }
      refCs = refCs.zipWithIndex.map { case (old, i) =>
        grouped.get(i) match {
          case Some(vs) =>
            val dim = vs.head._2.length
            val s = new Array[Double](dim)
            vs.foreach(_._2.zipWithIndex.foreach { case (x, d) => s(d) += x })
            unit(s.map(_ / vs.length))
          case None => old
        }
      }
    }
    assert(cs.length == refCs.length)
    cs.zip(refCs).zipWithIndex.foreach { case ((a, b), i) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6, s"centroid $i: $x vs $y")
      }
    }
  }

  test("kmeans parity + SSE vs CrossCheck reference (sim7's relocated oracle, sf0.001)") {
    // The sequential cross-check that USED to run inside the registered
    // sim7 query (an O(N) driver collect — wrong place for it; the ml1
    // precedent): cell-size histogram of the distributed run equals the
    // same-math driver Lloyd's up to a 2-vector L1 slack, and both SSE
    // computations (distributed map-side vs driver replay) agree on the
    // monotone-improvement property. Bounded here: sf0.001 only.
    import graft.functions.CrossCheck
    val emb = graft.Tables.embeddings(spark, sf001)
    val k = 8
    val (seeds, cs) = Similarity.kmeansFit(emb, "vec_id", "embedding", k, iters = 3)
    val sizes = Similarity.kmeansAssignments(emb, "vec_id", "embedding", cs)
      .groupBy(col("cell")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = CrossCheck.collectVectors(emb, "vec_id", "embedding")
    val (refSeeds, _, refAssign) = CrossCheck.kmeansRef(rows, k, 3)
    val refSizes = refAssign.groupBy(identity)
      .map { case (c, a) => (c + 1) -> a.length.toLong }
    val l1 = (1 to k).map(c =>
      math.abs(sizes.getOrElse(c, 0L) - refSizes.getOrElse(c, 0L))).sum
    assert(l1 <= 4, s"cell-size histogram L1 drift $l1")
    // seed parity: the distributed init picked the same vectors
    seeds.zip(refSeeds).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
    // SSE: driver replay agrees with the distributed objective, and
    // training improved it (the registered query asserts the latter
    // with kmeansSseDistributed alone)
    val sseT = CrossCheck.kmeansSse(rows, cs)
    val sse0 = CrossCheck.kmeansSse(rows, seeds)
    assert(sseT <= sse0 * (1 + 1e-9))
    val sseDistT = Similarity.kmeansSseDistributed(emb, "vec_id", "embedding", cs)
    assert(math.abs(sseDistT - sseT) < 1e-6 * math.max(1.0, sseT))
  }

  test("VecCentroid matches a driver-side per-label mean (sf0.001)") {
    import graft.functions.VecCentroid
    val emb = graft.Tables.embeddings(spark, sf001)
    val got = emb.select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(VecCentroid.toColumn.name("centroid"))
      .collect().map { case (l, c) => l -> c.values.toSeq }.toMap
    val rows = emb.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])].collect()
    val expect = rows.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      val s = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => s(i) += v._2(i)))
      l -> s.map(_ / vs.length).toSeq
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (l, c) =>
      c.zip(expect(l)).foreach { case (a, b) =>
        // both sum the same doubles; only addition order differs
        assert(math.abs(a - b) < 1e-9, s"label $l")
      }
    }
  }
}
