package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for readability scoring and source concentration beyond
  * the hash oracle: hand-counted run definitions, band partition, and
  * the Lorenz/Gini algebra replayed brute-force. */
class ReadabilityConcentrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("readability: counts replay the run definitions on hand docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It purred!", "en", "t", 23L),
      (2L, "Why? Because syllables are vowel runs", "en", "t", 38L),
      (3L, "no terminator here", "en", "t", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("readab").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val r = Readability.readability(spark, tmp).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4))).toMap
    // doc 1: 5 words, 2 sentences ("." and "!" runs), vowel runs:
    // "the cat sat. it purred!" -> e,a,a,i,u,e = 6
    assert(r(1L)._1 == 5 && r(1L)._2 == 2 && r(1L)._3 == 6)
    // doc 3: no terminator -> sentences floored at 1
    assert(r(3L)._2 == 1)
    // formula replay
    r.values.foreach { case (w, s2, syl, fl) =>
      val want = BigDecimal(206.835 - 1.015 * (w.toDouble / s2.toDouble)
        - 84.6 * (syl.toDouble / w.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(fl == want)
    }
  }

  test("readability_bands: bands partition the corpus docs") {
    val per = Readability.readability(spark, sf)
    val bands = Readability.readabilityBands(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bands.values.sum == per.count())
    // band CASE is exhaustive on the rounded score
    val recomputed = per.groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bands == recomputed)
  }

  test("source_concentration: Lorenz and Gini replay brute-force") {
    val rows = Concentration.sourceConcentration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val masses = rows.map(_._3)
    val total = masses.sum
    val n = rows.length.toLong
    // ranks dense, masses ascending, cumulative exact
    assert(rows.map(_._1).toSeq == (1L to n).toSeq)
    assert(masses.zip(masses.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_._4).toSeq == masses.scanLeft(0L)(_ + _).tail.toSeq)
    assert(rows.last._4 == total && rows.last._6 == 1.0)
    // Gini closed form over ranked integer masses
    val srm = rows.map(r => r._1 * r._3).sum
    val gini = BigDecimal((2 * srm - (n + 1) * total).toDouble /
      (n * total).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall(_._7 == gini))
    assert(gini >= 0.0 && gini < 1.0)
  }
}
