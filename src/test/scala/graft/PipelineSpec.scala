package graft

import graft.queries.PipelineQueries

/** Curation-surface invariants (pipe1-3) beyond the DuckDB hash gate. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("clusterSplit: near-dup clusters never straddle splits; singletons hash on own id") {
    import org.apache.spark.sql.functions.col
    val docs = Seq.tabulate(200)(i => Tuple1(i.toLong)).toDF("doc_id")
    // clusters {0,1,2} and {10,11}; everything else singleton
    val comp = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val out = graft.operators.Sampling.clusterSplit(docs, "doc_id", comp)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("root"), r.getAs[String]("split")))).toMap
    assert(out.size == 200)
    assert(Seq(0L, 1L, 2L).map(out(_)).distinct.size == 1)
    assert(Seq(10L, 11L).map(out(_)).distinct.size == 1)
    assert(out(50L)._1 == 50L)
    // all three splits appear and train dominates (13/16 of hex space)
    val bySplit = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit)
    assert(bySplit("train") > bySplit("val") + bySplit("test"), bySplit)
  }

  test("pipe8 on sf0.001: every d4 near-dup pair shares a split") {
    import org.apache.spark.sql.functions.col
    val split = PipelineQueries.leakageSplit(spark, sf001)
    val pairs = graft.queries.DedupQueries.ngramJaccard(spark, sf001)
      .select("ida", "idb")
    val straddling = pairs
      .join(split.select(col("doc_id").as("ida"), col("split").as("sa")), Seq("ida"))
      .join(split.select(col("doc_id").as("idb"), col("split").as("sb")), Seq("idb"))
      .where(col("sa") =!= col("sb")).count()
    assert(straddling == 0L)
  }

  test("quality filter keeps a nonempty strict subset meeting every gate") {
    val kept = PipelineQueries.qualityFilter(spark, sf001).collect()
    val total = Tables.documents(spark, sf001).count()
    assert(kept.length > 0 && kept.length < total)
    kept.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 20L)
      assert(r.getAs[Double]("quality_r") >= 0.5 - 1e-6)
    }
  }

  test("stratified sample: min(20, stratum size) rows per source, rank dense") {
    val rows = PipelineQueries.stratifiedSample(spark, sf001).collect()
    val strata = Tables.documents(spark, sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == strata.keySet.filter(strata(_) > 0))
    bySource.foreach { case (src, rs) =>
      assert(rs.length == math.min(20L, strata(src)), src)
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rs.length).toSeq, src)
    }
  }

  test("reservoir sample equals the window formulation on every partitioning") {
    import org.apache.spark.sql.functions._
    // pipe6 (bounded heaps) must reproduce pipe2 (window) bit-for-bit
    val window = PipelineQueries.stratifiedSample(spark, sf001).collect().toSeq
    val heaps = PipelineQueries.reservoirSample(spark, sf001).collect().toSeq
    assert(heaps.nonEmpty && heaps == window)
    // skewed layout: one group split across many partitions, k > some
    // group sizes — heap merge must still produce the exact global top-k
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i <= 490) "big" else "small"))
      .toDF("id", "grp").repartition(13)
    val got = graft.operators.Sampling
      .topKPerGroup(df, Seq("grp"), md5(col("id").cast("string")), "id", k = 25)
      .select("grp", "id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = df
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(md5(col("id").cast("string")), col("id"))))
      .where(col("rk") <= 25)
      .select("grp", "id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.count(_._1 == "small") == 10) // min(k, group size)
  }

  test("token pack: bins non-decreasing in doc order and budget-consistent") {
    val rows = PipelineQueries.tokenPack(spark, sf001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("bin")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val ordered = rs.sortBy(_._2)
      var cum = 0L
      ordered.foreach { case (_, id, n, bin) =>
        assert(bin == cum / 512, s"$src doc $id")
        cum += n
      }
    }
  }

  test("chunking: windows cover every token, overlap by width-stride, rejoin to the doc") {
    // pipe9 invariants on real docs: chunk c starts at token c*96, holds
    // min(128, n - c*96) tokens, consecutive chunks share exactly 32
    // tokens, and stripping the 32-token overlap reconstructs the doc.
    val chunks = PipelineQueries.chunk(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk")))
    assert(chunks.nonEmpty)
    val docs = graft.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "array_join(regexp_extract_all(text, '\\\\S+', 0), ' ') AS t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val ordered = cs.sortBy(_._2)
      val nTok = docs(id).split(" ").count(_.nonEmpty)
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong), s"doc $id idx gap")
      ordered.foreach { case (_, idx, n, text) =>
        val want = math.min(128L, nTok - idx * 96)
        assert(n == want, s"doc $id chunk $idx size")
        assert(text.split(" ").count(_.nonEmpty) == n, s"doc $id chunk $idx tokens")
      }
      // drop the leading 32-token overlap of every chunk after the first
      val rejoined = (ordered.head._4 +: ordered.tail.map(
        _._4.split(" ").drop(32).mkString(" "))).filter(_.nonEmpty).mkString(" ")
      assert(rejoined == docs(id), s"doc $id does not rejoin")
    }
  }

  test("orderShard: every doc exactly once, shards dense from 1, order is the salted hash") {
    import org.apache.spark.sql.functions.{col, md5, concat, lit}
    val out = PipelineQueries.orderShard(spark, sf001)
    val rows = out.collect()
    val n = graft.Tables.documents(spark, sf001).count()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == n)
    // positions are dense 1..|shard| within each shard
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("pos")).sorted.sameElements(1L to rs.length))
    }
    // within a shard, increasing pos follows increasing md5 order
    val byHash = out
      .withColumn("h", md5(concat(lit("ord:"), col("doc_id").cast("string"))))
      .collect().groupBy(_.getAs[Long]("shard"))
    byHash.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("pos")).map(_.getAs[String]("h"))
      assert(sorted.sameElements(sorted.sorted))
    }
  }

  test("hashedBow: exact bucket counts on a hand corpus; ml2 learns a toy target") {
    import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit}
    val corp = Seq(
      (0L, "fast fast slow table"),
      (1L, "slow slow table"),
      (2L, "fast table table")
    ).toDF("doc_id", "text")
    val B = 16
    val feats = graft.operators.Classifier.hashedBow(corp, "doc_id", "text", B)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Float](1)).toMap
    // bucket of each token, computed with the same hash the operator uses
    val bOf = Seq("fast", "slow", "table").map { t =>
      t -> spark.range(1).select(pmod(xxhash64(lit(t)), lit(B.toLong)))
        .head.getLong(0).toInt
    }.toMap
    // exact counts (tokens may collide into a shared bucket — sum then)
    def expected(counts: Map[String, Int]): Seq[Float] = {
      val v = new Array[Float](B)
      counts.foreach { case (t, c) => v(bOf(t)) += c.toFloat }
      v.toSeq
    }
    assert(feats(0L) == expected(Map("fast" -> 2, "slow" -> 1, "table" -> 1)))
    assert(feats(1L) == expected(Map("slow" -> 2, "table" -> 1)))
    assert(feats(2L) == expected(Map("fast" -> 1, "table" -> 2)))
    // every feature vector sums to the doc's token count
    assert(feats(0L).sum == 4f && feats(1L).sum == 3f && feats(2L).sum == 3f)
    // end to end on the real corpus: the planted linear target is
    // learnable from hashed features (registered ml2's acc gate, plus
    // the loss-descent property, checked at the bounded sf0.001)
    val (n, nPos, acc, lossT, loss0) =
      PipelineQueries.textClfStats(spark, sf001)
    assert(n > 0 && nPos > 0 && nPos < n, s"degenerate target: $nPos/$n")
    assert(lossT < loss0 * 0.5, s"loss did not descend: $lossT vs $loss0")
    assert(acc >= 0.9, s"accuracy $acc below gate")
  }

  test("SparseFill: dup indices accumulate, out-of-range ignored, width fixed") {
    import org.apache.spark.sql.functions.{col, expr}
    val df = Seq(
      (1L, Seq((0, 2.0), (3, 1.5), (0, 1.0))),   // dup index 0 accumulates
      (2L, Seq((-1, 9.0), (4, 1.0), (99, 9.0))), // out-of-range dropped
      (3L, Seq.empty[(Int, Double)])             // empty → all-zero row
    ).toDF("id", "e")
      .select(col("id"),
        expr("transform(e, x -> struct(x._1 as b, x._2 as c))").as("e"))
    val got = df.select(col("id"), graft.plans.VectorOps.sparseFill(col("e"), 5))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L) == Seq(3.0f, 0f, 0f, 1.5f, 0f))
    assert(got(2L) == Seq(0f, 0f, 0f, 0f, 1.0f))
    assert(got(3L) == Seq(0f, 0f, 0f, 0f, 0f))
    // type check rejects bad shapes
    val bad = Seq((1L, Seq(1.0))).toDF("id", "e")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(graft.plans.VectorOps.sparseFill(col("e"), 5)).collect()
    }
    assert(err.getMessage.contains("SparseFill requires"))
  }

  test("dq3 outliers: planted spike is flagged, clean series is not") {
    import org.apache.spark.sql.functions._
    val ev = (Seq.tabulate(99)(i => ("a", 10.0 + (i % 10))) :+ ("a", 10000.0))
      .toDF("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med_r"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
    val mad = dev.groupBy("event_type")
      .agg(round(expr("percentile(abs(value - med_r), 0.5)"), 6).as("mad_r"))
    val out = dev.join(broadcast(mad), Seq("event_type"))
      .where(abs(col("value") - col("med_r")) >
        lit(3.0) * lit(1.4826) * col("mad_r"))
      .collect()
    assert(out.length == 1 && out(0).getAs[Double]("value") == 10000.0)
  }

  test("dsir: target-domain docs score and select above the rest") {
    // The importance scorer must actually discriminate toward the
    // target (en) slice: under JM smoothing the mean en score sits
    // above the mean non-en score and en docs are selected more often.
    // (Add-one smoothing failed this — the corpus-size bias pushed
    // every score negative and selected nothing.)
    val rows = PipelineQueries.dsir(spark, sf001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("score_r"),
        r.getAs[Boolean]("selected")))
    val (en, rest) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[Double]) = xs.sum / xs.length
    assert(mean(en.map(_._2)) > mean(rest.map(_._2)), "no domain signal")
    val selEn = en.count(_._3).toDouble / en.length
    val selRest = rest.count(_._3).toDouble / rest.length
    assert(selEn > selRest, s"selection not target-biased: $selEn vs $selRest")
    assert(rows.exists(_._3) && rows.exists(!_._3), "degenerate selection")
  }
}
