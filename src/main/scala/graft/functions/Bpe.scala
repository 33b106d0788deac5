package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer: distributed learn + map-side apply —
  * the third leg of the tokenizer surface (t1/t5 count, t8 scores one
  * merge round, this LEARNS a full merge table and APPLIES it).
  *
  * Learning is Sennrich's algorithm run the way it is run in practice:
  * the corpus collapses to a WORD-FREQUENCY HISTOGRAM (one distributed
  * count — vocabulary-sized, not corpus-sized), and the sequential
  * merge loop runs driver-side on that histogram. A 100 TB corpus
  * contributes one groupBy(word) pass; the iterative part never touches
  * the data again. Ties break lexicographically, so the merge table is
  * deterministic for a given corpus.
  *
  * Applying is the GPT-2-style greedy loop (merge the lowest-ranked
  * adjacent pair until none applies), packaged as a single-pass
  * expression over the token array — embarrassingly parallel, zero
  * shuffle, same scan-stage posture as the other signature expressions.
  */
object Bpe {

  /** Learn `numMerges` merges from the word histogram of `docs.textCol`.
    * `maxVocab` caps the histogram rows collected (top-by-frequency;
    * tail words contribute ~nothing to pair counts at real scale). */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 50000): Seq[(String, String)] = {
    val hist = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    var vocab: Map[Vector[String], Long] =
      hist.groupBy(_._1.map(_.toString).toVector)
        .map { case (toks, ws) => toks -> ws.map(_._2).sum }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (toks, c) =>
        var j = 0
        while (j < toks.length - 1) {
          val p = (toks(j), toks(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (toks, c) => mergePair(toks, best) -> c }
        i += 1
      }
    }
    merges.result()
  }

  private def mergePair(toks: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == p._1 && toks(j + 1) == p._2) {
        out += toks(j) + toks(j + 1); j += 2
      } else { out += toks(j); j += 1 }
    }
    out.result()
  }

  /** Driver-side reference encode (spec parity target): greedy
    * lowest-rank merge, identical to the expression's loop. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var toks = word.map(_.toString).toVector
    var loop = true
    while (loop && toks.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < toks.length - 1) {
        val r = rank.getOrElse((toks(j), toks(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) loop = false
      else toks = mergePair(toks, (toks(bestIdx), toks(bestIdx + 1)))
    }
    toks
  }

  def encodeCount(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeCount(ColumnBridge.expression(words), merges))
}

/** Per-row BPE token count: applies the ranked merge table to every word
  * of the input array and returns the total token count. Single
  * imperative pass per row (CodegenFallback — one virtual call per row,
  * like the other signature expressions). */
case class BpeEncodeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BpeEncodeCount requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      if (s != null) {
        val w = s.toString
        if (w.nonEmpty) total += Bpe.encodeWord(w, rank).length
      }
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeCount =
    copy(child = newChild)
}
