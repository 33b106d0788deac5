package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.util.Dec

/** Shared ScalaCheck parameterization: green-by-CONSTRUCTION, not by
  * seed. The initial seed is PINNED (default: the r12 ghost sweep's
  * logged failing seed — its case 57 for the components property is
  * the diameter-9 graph that OOM'd the label-prop fixpoint,
  * validation/r12_prop_sweeps/sweep_4.log — the most adversarial
  * starting point we know; the r9 judge's block-pair seed it replaces
  * is preserved below — one env var away — and the ghost's failing
  * GRAPH is additionally pinned deterministically in DedupSpec, so the
  * regression case survives any future seed change), so two `sbt test`
  * runs draw identical cases. Seed
  * diversity is still one env var away:
  *   GRAFT_PROP_SEED=random sbt test     # fresh seeds (nightly style)
  *   GRAFT_PROP_SEED=<base64> sbt test   # reproduce a logged failure
  */
object PropSeed {
  val R9JudgeSeed = "ZtlTiymLCGMXLgL2EN4eA6NGllvtejs5z4v9vlw4skI="
  val GhostSeed = "B5eczG94xWB1NY3cojDJ1kBCGfCNtRXpCrk8ng3379N="
  val JudgeSeed = GhostSeed
  private val pinned: Option[org.scalacheck.rng.Seed] =
    sys.env.get("GRAFT_PROP_SEED") match {
      case Some("random") =>
        // r12 (the 18/19 incident's last lesson): a GREEN log must be
        // reproducible too, not just a failing one — draw ONE fresh
        // seed per JVM, print it, and pin it, so every logged sweep
        // carries its own reproduction handle
        // (GRAFT_PROP_SEED=<printed base64>).
        val s = org.scalacheck.rng.Seed.random()
        println(s"[PropSeed] fresh initial seed: ${s.toBase64}")
        Some(s)
      case Some(s) => Some(org.scalacheck.rng.Seed.fromBase64(s).get)
      case None => Some(org.scalacheck.rng.Seed.fromBase64(JudgeSeed).get)
    }
  def apply(p: Test.Parameters, minSuccessful: Int): Test.Parameters = {
    val q = p.withMinSuccessfulTests(minSuccessful)
    pinned.fold(q)(q.withInitialSeed)
  }
}

/** ScalaCheck properties — randomized cross-validation of the pieces
  * with the subtlest semantics: exact money math, the as-of join, pair
  * mining, sketches (each checked against a straightforward in-memory
  * oracle, in the reference's dual-path test spirit). ZTable mutation
  * fuzzing lives in [[MutationProps]] (fewer, costlier cases). */
object PropertyChecks extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropSeed(p, minSuccessful = 100)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val cents: Gen[Double] = Gen.choose(-999999L, 999999L).map(_ / 100.0)

  property("sumMoney is exact for any 2-dp doubles") =
    Prop.forAll(Gen.nonEmptyListOf(cents)) { xs =>
      val expected = xs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val got = xs.toDF("v").repartition(4)
        .agg(Dec.sumMoney(col("v")).as("s")).head.getDouble(0)
      got == expected
    }

  private val asofInput: Gen[(List[(Long, Int, Int)], List[(Long, Int, Int, Double)])] =
    for {
      nl <- Gen.choose(1, 12)
      nr <- Gen.choose(0, 12)
      // key in {0,1}, ts in a tiny range so collisions/ties actually occur
      ls <- Gen.listOfN(nl, for { k <- Gen.choose(0, 1); t <- Gen.choose(0, 20) } yield (k.toLong, t, 0))
      rs <- Gen.listOfN(nr, for { k <- Gen.choose(0, 1); t <- Gen.choose(0, 20); v <- Gen.choose(1, 99) } yield (k.toLong, t, v, v * 1.0))
    } yield (ls.zipWithIndex.map { case ((k, t, _), i) => (k, t, i) },
             rs.zipWithIndex.map { case ((k, t, v, _), i) => (k, t, i, v * 1.0) })

  private def ts(t: Int) = new Timestamp(1700000000000L + t * 1000L)

  property("NATIVE asof exec matches in-memory oracle incl. ties") =
    Prop.forAll(asofInput) { case (ls, rs) =>
      val left = ls.map { case (k, t, i) => (i.toLong, ts(t), k) }
        .toDF("id", "ts", "k")
      val right = rs.map { case (k, t, i, v) => (1000L + i, ts(t), k, v) }
        .toDF("rid", "r_ts", "rk", "v")
      val got = graft.plans.AsOfJoinNative
        .asof(left, right, "k", "rk", "ts", "r_ts", "rid")
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Double]("v"))))
        .toMap
      val expected = ls.map { case (k, t, i) =>
        val cands = rs.filter { case (rk, rt, _, _) => rk == k && rt <= t }
        i.toLong -> (if (cands.isEmpty) None
          else Some(cands.maxBy { case (_, rt, ri, _) => (rt, ri) }._4))
      }.toMap
      got == expected
    }

  property("NanosPushdownRule preserves derived-ts filter semantics") = {
    graft.plans.NanosPushdownRule.install(spark)
    // ns values and bounds straddle microsecond boundaries on purpose
    val nsGen = Gen.choose(1700000000000000000L, 1700000000000030000L)
    val input = for {
      ns <- Gen.nonEmptyListOf(nsGen)
      lo <- nsGen; hi <- nsGen
    } yield (ns, lo / 1000L, hi / 1000L) // micro bounds
    Prop.forAll(input) { case (ns, loUs, hiUs) =>
      val lo = new Timestamp(0); lo.setTime(loUs / 1000)
      lo.setNanos(((loUs % 1000000L) * 1000L).toInt)
      val hi = new Timestamp(0); hi.setTime(hiUs / 1000)
      hi.setNanos(((hiUs % 1000000L) * 1000L).toInt)
      val got = ns.toDF("raw_ns")
        .withColumn("ts", timestamp_micros(expr("raw_ns div 1000")))
        .where(col("ts") >= lit(lo) && col("ts") <= lit(hi))
        .collect().map(_.getAs[Long]("raw_ns")).sorted.toSeq
      val expected = ns.filter(n => n / 1000L >= loUs && n / 1000L <= hiUs)
        .sorted
      got == expected
    }
  }

  property("block-pair equi-join meets every vector pair exactly once") =
    Prop.forAll(for {
      n <- Gen.choose(2, 24)
      b <- Gen.choose(1, 6)
      vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-5, 5).map(_.toFloat)))
    } yield (vecs, b)) { case (vecs, b) =>
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      // threshold below any possible cosine -> the raw candidate multiset;
      // exactly-once is what makes the exact oracle safe at any B
      val pairs = graft.operators.Similarity
        .cosinePairs(emb, "vec_id", "embedding", threshold = -1e9, numBlocks = b)
        .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"))).toList
      val n = vecs.length
      val expected = (for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong)).toList
      pairs.sorted == expected.sorted
    }

  property("symbol dictionary: dense stable ids under any extension sequence") =
    Prop.forAll(Gen.listOfN(3, Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g")))) { batches =>
      val dict = graft.sources.SymbolDictionary(spark,
        java.nio.file.Files.createTempDirectory("dict_prop_").toString + "/d")
      var expected = Map.empty[String, Long]
      batches.filter(_.nonEmpty).forall { batch =>
        dict.extend(batch.map(Tuple1(_)).toDF("sym"), "sym")
        val novel = batch.distinct.filterNot(expected.contains).sorted
        expected = expected ++ novel.zipWithIndex.map { case (s, i) =>
          s -> (expected.size + i + 1L)
        }
        val got = dict.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        got == expected
      }
    }

  property("asof join matches in-memory oracle incl. ties") =
    Prop.forAll(asofInput) { case (ls, rs) =>
      val left = ls.map { case (k, t, i) => (i.toLong, ts(t), k) }
        .toDF("id", "ts", "k")
      val right = rs.map { case (k, t, i, v) => (1000L + i, ts(t), k, v) }
        .toDF("rid", "ts", "k", "v")
      val got = AsOfJoin.asof(left, right, "k", "ts", "ts", Seq("v"), "rid", "r_")
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("r_v"))) None else Some(r.getAs[Double]("r_v"))))
        .toMap
      // oracle: latest right with ts <= left ts, same key; ties -> max rid
      val expected = ls.map { case (k, t, i) =>
        val cands = rs.filter { case (rk, rt, _, _) => rk == k && rt <= t }
        i.toLong -> (if (cands.isEmpty) None
          else Some(cands.maxBy { case (_, rt, ri, _) => (rt, ri) }._4))
      }.toMap
      got == expected
    }

  private val u16: Gen[Int] = Gen.choose(0, 65535)

  property("ZOrder.interleave is injective and monotone per coordinate") =
    Prop.forAll(Gen.listOfN(12, for { a <- u16; b <- u16 } yield (a, b))) { pairs0 =>
      val pairs = pairs0.distinct
      // evaluate z for each pair and its per-coordinate bumps in one job
      val probes = pairs.flatMap { case (a, b) =>
        Seq((a, b), (math.min(a + 1, 65535), b), (a, math.min(b + 1, 65535)))
      }.distinct
      val z = probes.toDF("a", "b")
        .select(col("a"), col("b"), graft.sources.ZOrder.interleave(
          Seq(col("a").cast("long"), col("b").cast("long"))).as("z"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val injective = z.values.toSet.size == probes.size
      val monotone = pairs.forall { case (a, b) =>
        (a == 65535 || z((a + 1, b)) > z((a, b))) &&
        (b == 65535 || z((a, b + 1)) > z((a, b)))
      }
      injective && monotone
    }

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val mergeTable: Gen[Seq[(String, String)]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n,
      for { a <- Gen.alphaLowerChar; b <- Gen.alphaLowerChar }
        yield (a.toString, b.toString))).map(_.distinct)

  private val interval: Gen[(Long, Long)] =
    for { s <- Gen.choose(0L, 60L); len <- Gen.choose(0L, 25L) } yield (s, s + len)

  property("fragment interval join == naive theta join for random intervals") =
    Prop.forAll(Gen.nonEmptyListOf(interval), Gen.nonEmptyListOf(interval),
        Gen.oneOf(3L, 7L, 10L)) { (lsRaw, rsRaw, bucket) =>
      val ls = lsRaw.take(10).zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val rs = rsRaw.take(10).zipWithIndex.map { case ((s, e), i) => (100L + i, s, e) }
      def df(xs: Seq[(Long, Long, Long)], id: String, a: String, b: String) =
        xs.toDF("i", "s", "e").select(col("i").as(id),
          timestamp_micros(col("s")).as(a), timestamp_micros(col("e")).as(b))
      val got = graft.operators.Intervals.overlapJoin(
          df(ls, "lid", "ls", "le"), col("ls"), col("le"),
          df(rs, "rid", "rs", "re"), col("rs"), col("re"), bucket)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = ls.flatMap { case (li, s, e) =>
        rs.collect { case (ri, s2, e2) if s <= e2 && s2 <= e => (li, ri) }
      }.toSet
      got.length == got.toSet.size && got.toSet == naive
    }

  property("ewma fold == driver recurrence for any series mix and layout") =
    Prop.forAll(for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0, 2); x <- Gen.choose(-100, 100)
      } yield (k.toLong, x.toDouble))
      parts <- Gen.choose(1, 7)
    } yield (rows.zipWithIndex.map { case ((k, x), i) => (k, i.toLong, x) }, parts)) {
      case (rows, parts) =>
        val got = graft.operators.TimeSeries
          .ewma(rows.toDF("k", "t", "x").repartition(parts),
            Seq("k"), Seq("t"), "x", alpha = 0.25)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
        val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
          var s = 0.0
          rs.sortBy(_._2).zipWithIndex.map { case ((_, t, x), i) =>
            s = if (i == 0) x else 0.25 * x + 0.75 * s
            (k, t) -> s
          }
        }
        got == want // bitwise: 0.25/0.75 are exact binary
    }

  property("reservoir topKPerGroup == window rank for any k and layout") =
    Prop.forAll(for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.choose(0, 2).map(_.toString))
      k <- Gen.choose(1, 6)
      parts <- Gen.choose(1, 5)
    } yield (rows.zipWithIndex.map { case (g, i) => (g, i.toLong) }, k, parts)) {
      case (rows, k, parts) =>
        val df = rows.toDF("g", "id").repartition(parts)
        val got = graft.operators.Sampling
          .topKPerGroup(df, Seq("g"), md5(col("id").cast("string")), "id", k)
          .select("g", "id", "rk").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
        val want = df.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("g")
              .orderBy(md5(col("id").cast("string")), col("id"))))
          .where(col("rk") <= k)
          .select("g", "id", "rk").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
        got == want
    }

  property("components: label-prop and star-contraction match union-find") =
    Prop.forAll(for {
      n <- Gen.choose(2, 14)
      m <- Gen.choose(1, 24)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
      // self-loops stay IN (r12): the ghost shrinker walked out of the
      // old a != b domain and found componentsStar dropping
      // self-loop-only nodes — now part of the contract, so part of
      // the domain (and shrunk candidates can no longer leave it)
    } yield es.distinct) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("ida", "idb")
        // union-find oracle, normalized to min-node-id labels
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x
          else { val r = find(parent(x)); parent(x) = r; r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = nodes.groupBy(find).flatMap { case (_, ms) =>
          val mn = ms.min; ms.map(_ -> mn)
        }
        val got = graft.operators.Dedup.components(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val gotStar = graft.operators.Dedup.componentsStar(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want && gotStar == want
      }
    }

  property("BottomKSketch merge is lossless for any split and merge order") =
    Prop.forAll(for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        pri <- Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
        id <- Gen.choose(0L, 999L)
        v <- Gen.choose(-1000, 1000).map(_ / 10.0)
      } yield (pri, id, v))
      k <- Gen.choose(1, 8)
      parts <- Gen.choose(1, 6)
      leftFold <- Gen.oneOf(true, false)
      // real use has pri = md5(id): (pri, id) keys are unique
    } yield (rows.distinctBy(r => (r._1, r._2)), k, parts, leftFold)) {
        case (rows, k, parts, leftFold) =>
      val agg = graft.functions.BottomKSketch(k)
      val buffers = rows.zipWithIndex
        .groupBy(_._2 % parts).values.toList
        .map(part => part.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(
        if (leftFold) buffers.foldLeft(agg.zero)(agg.merge)
        else buffers.foldRight(agg.zero)((b, acc) => agg.merge(acc, b)))
      // oracle: the global bottom-k by (pri, id) of a single pass
      val single = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      val expected = rows.sortBy(r => (r._1, r._2)).take(k)
      merged.pri.toSeq == single.pri.toSeq &&
        merged.id.toSeq == single.id.toSeq &&
        merged.v.toSeq == single.v.toSeq &&
        merged.pri.toSeq == expected.map(_._1) &&
        merged.id.toSeq == expected.map(_._2) &&
        merged.v.toSeq == expected.map(_._3)
    }

  property("BPE encode: expression == driver encode; word <= tokens <= chars") =
    Prop.forAll(Gen.nonEmptyListOf(word), mergeTable) { (words, merges) =>
      val rank = merges.zipWithIndex.toMap
      val got = Seq(words.mkString(" ")).toDF("text")
        .select(graft.functions.Bpe.encodeCount(
          split(col("text"), " "), merges).as("n"))
        .head.getLong(0)
      val expected = words.map(w => graft.functions.Bpe.encodeWord(w, rank).length.toLong).sum
      val chars = words.map(_.length.toLong).sum
      got == expected && got >= words.length && got <= chars
    }
}
