package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token count over \\S+ matches") {
    val out = Seq("one two three", "  padded   words  ", "single")
      .toDF("text").select(Text.nTokens(col("text"))).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(3, 2, 1))
  }

  test("fingerprint is whitespace/case insensitive, content sensitive") {
    val fps = Seq("Hello  World", "hello world", "hello  worlds")
      .toDF("text").select(Text.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("langid votes by marker words with fixed tiebreak") {
    val preds = Seq(
      "the cat and the dog of the house is big",
      "el perro y la casa que tiene los gatos",
      "der hund und die katze nicht das haus")
      .toDF("text").select(Text.langId(col("text"))).collect().map(_.getString(0))
    assert(preds.toSeq == Seq("en", "es", "de"))
  }

  test("langid detects CJK: \\b never matches around unsegmented scripts") {
    // the zh markers must count OCCURRENCES — Java/RE2 \b is
    // ASCII-word-char based, so a boundary-anchored pattern left the
    // zh branch permanently dead and classified Chinese text as 'en'
    val preds = Seq(
      "我的书是不错的你的猫是好的",
      "the book is good and the cat is 的 good")
      .toDF("text").select(Text.langId(col("text"))).collect().map(_.getString(0))
    assert(preds(0) == "zh", s"Chinese text predicted ${preds(0)}")
    assert(preds(1) == "en") // majority-en text stays en
  }

  test("winnowing fingerprints: identical -> equal sets, near-dup -> high overlap") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away today",
      "the quick brown fox jumps over the lazy dog and runs far away today",
      "the quick brown fox jumps over the lazy dog and walks far away today",
      "entirely unrelated content with completely different words in this line")
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val fps = docs.select(col("id"), Text.winnowFingerprints(col("text")).as("f"))
      .collect().map(r => r.getAs[Int]("id") -> r.getSeq[Long](1).toSet).toMap
    assert(fps(0) == fps(1))
    val overlap01_2 = fps(0).intersect(fps(2)).size.toDouble / fps(0).union(fps(2)).size
    val overlap01_3 = fps(0).intersect(fps(3)).size.toDouble / fps(0).union(fps(3)).size
    assert(overlap01_2 > 0.4, s"near-dup overlap $overlap01_2")
    assert(overlap01_3 == 0.0, s"unrelated overlap $overlap01_3")
  }

  test("quality score stays in [0,1] and rewards stopword-rich prose") {
    val rows = Seq(
      "the quick brown fox is in the garden and it is happy to be there today",
      ";;;; !!!! ....")
      .toDF("text").select(Text.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(rows.forall(v => v >= 0.0 && v <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("repetition stats: exact n-gram totals and duplicates") {
    import graft.plans.TextOps
    val out = Seq(
      "a b a b a",          // 3-grams: "a b a","b a b","a b a" -> 3 total, 2 distinct
      "x y z w",            // all distinct
      "q q q q q",          // all identical
      "one two")            // fewer than n words -> zero grams
      .toDF("text")
      .select(TextOps.repetitionStats(split(col("text"), " "), 3).as("r"))
      .select(col("r.n_grams"), col("r.n_distinct"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 2L), (2L, 2L), (3L, 1L), (0L, 0L)))
  }

  test("repetition parity: expression matches a collections impl (sf0.001)") {
    import graft.plans.TextOps
    val rows = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"),
        TextOps.repetitionStats(
          regexp_extract_all(col("text"), lit("\\S+"), lit(0)), 3).as("r"))
      .select(col("doc_id"), col("text"), col("r.n_grams"), col("r.n_distinct"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val grams = r.getAs[String]("text").split("\\s+").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      assert(r.getLong(2) == grams.length.toLong, s"doc ${r.getLong(0)} total")
      assert(r.getLong(3) == grams.distinct.length.toLong, s"doc ${r.getLong(0)} distinct")
    }
  }

  test("winnow tolerates null tokens (SQL-reachable) instead of NPE") {
    val out = Seq(Tuple1(Seq(Option("a"), None, Option("b"), Option("c"), Option("d"), Option("e"))))
      .toDF("toks")
      .select(graft.plans.TextOps.winnow(col("toks"), 3, 2).as("f"))
      .head.getSeq[Long](0)
    assert(out.nonEmpty) // null word hashes as empty; no crash
  }

  test("winnow parity: expression matches an independent reference impl (sf0.001)") {
    // Cross-implementation gate (shared with the t6 oracle gate): the
    // independent collections reimplementation lives in CrossCheck.
    def winnowRef(text: String, k: Int, w: Int): Seq[Long] =
      graft.functions.CrossCheck.winnowRef(text, k, w)
    val rows = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"), Text.winnowFingerprints(col("text")).as("f"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val expect = winnowRef(r.getAs[String]("text"), 3, 4)
      assert(r.getSeq[Long](2) == expect, s"doc ${r.getLong(0)}")
    }
  }

  test("BPE: learned merges are deterministic; expression matches driver encode (sf0.001)") {
    import graft.functions.Bpe
    val docs = graft.Tables.documents(spark, sf001)
    val merges = Bpe.learn(docs, "text", numMerges = 30)
    assert(merges.size == 30)
    assert(merges == Bpe.learn(docs, "text", numMerges = 30))
    val rank = merges.zipWithIndex.toMap
    val out = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        Bpe.encodeCount(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " "), merges).as("n"))
      .orderBy("doc_id").limit(25).collect()
    out.foreach { r =>
      val text = r.getAs[String]("text").toLowerCase
      val words = text.split(" ").filter(_.nonEmpty)
      val expect = words.map(w => Bpe.encodeWord(w, rank).length.toLong).sum
      assert(r.getAs[Long]("n") == expect, s"doc ${r.getLong(0)}")
      // structural bounds: words <= bpe tokens <= non-space chars
      assert(expect >= words.length && expect <= words.map(_.length).sum)
    }
    // zero merges degrade to character count
    val chars = docs.select(Bpe.encodeCount(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " "), Nil).as("n"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.col("text"), " ", "")).as("c"))
      .limit(10).collect()
    chars.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Int]("c").toLong))
  }

  test("Unigram: Viterbi picks high-prob pieces; DP and memoized ref agree; learn is deterministic") {
    import graft.functions.{CrossCheck, Unigram}
    // hand model: "ab" is cheap, chars are expensive -> "abab" = [ab, ab]
    val m = Map("a" -> math.log(0.05), "b" -> math.log(0.05),
      "ab" -> math.log(0.4), "ba" -> math.log(0.4), "c" -> math.log(0.1))
    assert(Unigram.segment("abab", m) == Vector("ab", "ab"))
    assert(CrossCheck.unigramSegRef("abab", m) == List("ab", "ab"))
    // tie: "abab" via [ab,ab] vs [ab,a,b]... construct an exact tie:
    // p(ab)=p(a)*p(b) => scores equal; longest-last-piece rule must win
    val tie = Map("a" -> math.log(0.2), "b" -> math.log(0.2),
      "ab" -> math.log(0.04))
    assert(Unigram.segment("ab", tie) == Vector("ab"))
    assert(CrossCheck.unigramSegRef("ab", tie) == List("ab"))
    // unknown chars segment as single UNK pieces, never fail
    assert(Unigram.segment("axb", m).length == 3)
    assert(CrossCheck.unigramSegRef("axb", m) == Unigram.segment("axb", m).toList)
    // corpus learn: deterministic, chars retained, and the expression
    // matches the independent reference on real docs
    val docs = graft.Tables.documents(spark, sf001)
    val model = Unigram.learn(docs, "text", vocabSize = 200)
    assert(model == Unigram.learn(docs, "text", vocabSize = 200))
    assert(model.keysIterator.exists(_.length > 1), "no multi-char pieces learned")
    val out = docs.select(col("doc_id"), col("text"),
        Unigram.encodeCount(split(lower(col("text")), " "), model).as("n"))
      .orderBy("doc_id").limit(25).collect()
    out.foreach { r =>
      val text = r.getAs[String]("text")
      assert(r.getAs[Long]("n") == CrossCheck.unigramCountRef(text, model),
        s"doc ${r.getLong(0)}")
      val words = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val n = r.getAs[Long]("n")
      assert(n >= words.length && n <= words.map(_.length).sum)
      // multi-char pieces actually fire (compression below char count)
      assert(n < words.map(_.length).sum)
    }
  }

  test("t14: per-source lexical profile matches a driver-side replay (sf0.001)") {
    val got = graft.queries.TextQueries.lexicalStats(spark, sf001)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_hapax"), r.getAs[Long]("top10_mass")))).toMap
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, rows) =>
      val tf = rows.flatMap(_._2.toLowerCase.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
      val top10 = tf.toSeq.sortBy { case (t, f) => (-f, t) }.take(10).map(_._2).sum
      src -> ((tf.size.toLong, tf.values.sum, tf.count(_._2 == 1L).toLong, top10))
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (src, v) => assert(v == expect(src), s"source $src") }
  }
}
