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

  test("quality score stays in [0,1] and rewards stopword-rich prose") {
    val rows = Seq(
      "the quick brown fox is in the garden and it is happy to be there today",
      ";;;; !!!! ....")
      .toDF("text").select(Text.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(rows.forall(v => v >= 0.0 && v <= 1.0))
    assert(rows(0) > rows(1))
  }
}
