package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece invariants: maximal munch on known vocabularies, the
  * likelihood (not count) merge objective — the property that separates it
  * from BPE — and fertility sanity on the gate output. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("maximal munch takes the longest piece, singles as fallback") {
    import spark.implicits._
    val pieces = Seq("ab", "abc", "cd")
    val out = Seq("abcd", "abab", "xyz", "cdab", "a")
      .toDF("t")
      .withColumn("cnt", WordPiece.munchCount(pieces))
      .as[(String, Int)].collect().toMap
    // abcd -> abc|d; abab -> ab|ab; xyz -> x|y|z; cdab -> cd|ab; a -> a
    assert(out == Map("abcd" -> 2, "abab" -> 2, "xyz" -> 3,
      "cdab" -> 2, "a" -> 1))
  }

  test("pieces containing backslashes survive Spark literal inlining") {
    import spark.implicits._
    // Spark's SQL parser consumes backslash escapes inside literals;
    // SqlLit.spark must double them or 'a\b' IN-lists match "a<BS>b"
    val out = Seq("a\\bc", "xa\\b")
      .toDF("t")
      .withColumn("cnt", WordPiece.munchCount(Seq("a\\b")))
      .as[(String, Int)].collect().toMap
    assert(out == Map("a\\bc" -> 2, "xa\\b" -> 2))
  }

  test("training maximizes likelihood ratio, not raw pair count") {
    import spark.implicits._
    // 'ab' pair count 4 but score 4/(4*4)=0.25; 'cd' count 2, score
    // 2/(2*2)=0.5 -> WordPiece merges cd first, BPE merges ab first.
    val docs = Seq("ab ab ab ab cd cd").toDF("text")
    val wp = WordPiece.trainPieces(Bpe.symbolizeWeighted(docs), 2)
    assert(wp == Seq("cd", "ab"))
    val bpe = Bpe.trainMerges(Bpe.symbolizeWeighted(docs), 1).map(_._1)
    assert(bpe == Seq(("a", "b")))
  }

  test("gate fertility totals are bounded by chars and words") {
    val r = WordPiece.wordpieceEncode(spark, "/root/testdata/sf0.001").cache()
    assert(r.count() > 0)
    assert(r.filter(col("tokens_after") > col("chars_before")).count() == 0)
    assert(r.filter(col("tokens_after") < col("n_words")).count() == 0)
    r.unpersist()
  }
}
