package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the unigram LM quality score (values are hash-oracled
  * by the gate; these pin the arithmetic the oracle restates rather than
  * derives): the bit-length surprisal formula against an independent
  * integer computation, tokenization consistency with the other text
  * operators, and the score's range bounds. */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("surprisal is the exact bit length of N div c, OOV at count 1") {
    import spark.implicits._
    val toks = graft.Tables(spark, sf, "documents")
      .select(explode(TextQueries.words(col("text"))).as("tok"))
    val counts = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextQueries.LmVocabK).toMap
    def surp(tok: String): Long = {
      val c = vocab.getOrElse(tok, 1L)
      64L - java.lang.Long.numberOfLeadingZeros(n / c)
    }
    // re-derive every doc's mean surprisal independently and compare
    val expected = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), TextQueries.words(col("text")).as("w"))
      .as[(Long, Seq[String])].collect()
      .filter(_._2.nonEmpty)
      .map { case (id, w) =>
        id -> BigDecimal(w.map(surp).sum).toDouble / w.size
      }.toMap
    val got = TextQueries.qualityLmScore(spark, sf)
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, s) =>
      val e = BigDecimal(expected(id))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(s == e, s"doc $id: got $s expected $e")
    }
  }

  test("n_toks agrees with text_quality's n_words on every doc") {
    val lm = TextQueries.qualityLmScore(spark, sf)
    val tq = TextQueries.textQuality(spark, sf)
      .filter(col("n_words") > 0)
    val mismatch = lm.join(tq, Seq("doc_id"))
      .filter(col("n_toks") =!= col("n_words"))
    assert(mismatch.count() == 0)
    assert(lm.count() == tq.count())
  }

  test("scores lie in [1, bitlen(N)] and the vocab path dominates") {
    import spark.implicits._
    val lm = TextQueries.qualityLmScore(spark, sf).cache()
    val toks = graft.Tables(spark, sf, "documents")
      .select(explode(TextQueries.words(col("text"))).as("tok"))
    val n = toks.count()
    val maxSurp = 64L - java.lang.Long.numberOfLeadingZeros(n)
    assert(lm.filter(col("lm_score") < 1.0 ||
      col("lm_score") > maxSurp.toDouble).count() == 0)
    // the top-K vocab covers enough mass that the mean sits well below
    // the all-OOV ceiling on the synthetic corpus
    val mean = lm.agg(avg("lm_score")).as[Double].head()
    assert(mean < maxSurp - 1, s"mean $mean vs ceiling $maxSurp")
    lm.unpersist()
  }
}
