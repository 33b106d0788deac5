package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Unigram-language-model tokenizer (Kudo 2018, "Subword Regularization"
  * — the SentencePiece unigram algorithm), completing the tokenizer
  * family: count (t1/t5), BPE learn+apply (t8/t9), and now the
  * probabilistic-segmentation alternative every modern LLM tokenizer
  * stack offers beside BPE.
  *
  * Learning runs the way it runs in practice at corpus scale: the
  * corpus collapses to a WORD-FREQUENCY HISTOGRAM (one distributed
  * groupBy — vocabulary-sized, not corpus-sized; the same single pass
  * [[Bpe.learn]] uses), then seeding, EM, and pruning iterate
  * driver-side over that histogram. A 100 TB corpus contributes one
  * scan; the iterative part never touches the data again.
  *
  * Simplifications vs the paper, chosen to keep every step
  * deterministic (the oracle gate needs bit-stable piece counts):
  * Viterbi hard-EM instead of forward-backward soft counts, and
  * count-based pruning to `vocabSize` instead of likelihood-loss
  * ranking. Both preserve the structure that matters: pieces are
  * scored as a unigram LM and segmentation maximizes total log-prob.
  *
  * Applying is Viterbi segmentation per word, packaged as a single-pass
  * expression over the token array — map-side, zero shuffle, the same
  * scan-stage posture as [[BpeEncodeCount]].
  */
object Unigram {

  /** Sentinel log-prob for a single character absent from the piece
    * inventory (an UNK floor: segmentation always succeeds, unknown
    * chars cost effectively -inf but remain countable). */
  val UnkLogP: Double = -1e6

  /** Learn a piece inventory with log-probs from the corpus word
    * histogram. Seed = every substring of length <= maxPieceLen of the
    * histogram words, count-weighted; all observed single chars are
    * always retained so every word stays segmentable. */
  def learn(docs: DataFrame, textCol: String, vocabSize: Int,
      emIters: Int = 2, maxPieceLen: Int = 4,
      maxVocab: Int = 50000): Map[String, Double] = {
    val hist = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // Seed counts: substring frequency weighted by word frequency.
    val seed = mutable.HashMap.empty[String, Double]
    hist.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(i + maxPieceLen, w.length)) {
          val p = w.substring(i, j)
          seed(p) = seed.getOrElse(p, 0.0) + c
          j += 1
        }
        i += 1
      }
    }
    val chars = seed.keysIterator.filter(_.length == 1).toSet
    // Working inventory: all single chars + the most frequent longer
    // substrings (ties lexicographic — deterministic), a few times the
    // target size so EM can choose among them.
    val multi = seed.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(vocabSize * 4).map(_._1)
    var probs = normalize(
      (chars.iterator.map(p => p -> seed(p)) ++
        multi.iterator.map(p => p -> seed(p))).toMap)

    // Viterbi hard-EM over the histogram: segment each word with the
    // current model, re-estimate piece probabilities from the
    // count-weighted piece usage. Pieces that win no segment drop out.
    for (_ <- 1 to emIters) {
      val counts = mutable.HashMap.empty[String, Double]
      hist.foreach { case (w, c) =>
        segment(w, probs).foreach { p =>
          counts(p) = counts.getOrElse(p, 0.0) + c
        }
      }
      // single chars always survive with a floor count
      chars.foreach(ch => if (!counts.contains(ch)) counts(ch) = 0.5)
      probs = normalize(counts.toMap)
    }

    // Prune: keep all single chars plus the best-scoring longer pieces.
    val kept = probs.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, lp) => (-lp, p) }
      .take(math.max(vocabSize - chars.size, 0)).map(_._1).toSet
    normalize(probs.iterator.collect {
      case (p, lp) if p.length == 1 || kept(p) => p -> math.exp(lp)
    }.toMap)
  }

  private def normalize(counts: Map[String, Double]): Map[String, Double] = {
    val total = counts.valuesIterator.sum
    counts.map { case (p, c) => p -> math.log(c / total) }
  }

  /** Viterbi segmentation: maximize the summed piece log-prob;
    * deterministic tie-break prefers the LONGEST final piece (smaller
    * split point wins on equal score). Unknown single chars segment as
    * themselves at [[UnkLogP]]. */
  def segment(word: String, logp: Map[String, Double],
      maxPieceLen: Int = 16): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) > Double.NegativeInfinity) {
          val piece = word.substring(i, j)
          val lp =
            logp.getOrElse(piece, if (j - i == 1) UnkLogP else Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity) {
            val s = best(i) + lp
            // strict > keeps the SMALLEST i on ties = longest last piece
            if (s > best(j)) { best(j) = s; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    val out = List.newBuilder[String]
    val rev = mutable.ArrayBuffer.empty[(Int, Int)]
    var k = n
    while (k > 0) { val i = back(k); rev += ((i, k)); k = i }
    rev.reverseIterator.foreach { case (a, b) => out += word.substring(a, b) }
    out.result().toVector
  }

  def encodeCount(words: Column, logp: Map[String, Double]): Column =
    ColumnBridge.column(UnigramEncodeCount(ColumnBridge.expression(words), logp))
}

/** Per-row unigram-LM piece count: Viterbi-segments every word of the
  * input array against the learned inventory and returns the total
  * piece count. Single imperative pass per row (CodegenFallback, like
  * the other signature expressions). */
case class UnigramEncodeCount(child: Expression, logp: Map[String, Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"UnigramEncodeCount requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      if (s != null) {
        val w = s.toString
        if (w.nonEmpty) total += Unigram.segment(w, logp).length
      }
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeCount =
    copy(child = newChild)
}
