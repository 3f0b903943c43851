package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-document diversity accounting laws: the per-source gram masses
  * partition the corpus trigram mass, distinct ≤ total, and a planted
  * two-doc source sharing one trigram across its docs yields exactly
  * the hand-computed boilerplate ratio. */
class SourceDiversitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("per-source gram masses partition the corpus trigram mass") {
    val out = TextQueries.sourceDiversity(spark, sf).collect()
    val total = graft.Tables(spark, sf, "documents")
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(explode(TextQueries.trigrams(col("w"))))
      .count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "distinct <= total")
      assert(r.getLong(3) <= r.getLong(1), "boilerplate <= total")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("planted cross-doc boilerplate is measured exactly") {
    import spark.implicits._
    // two docs sharing the trigram "a b c"; doc2's second trigram unique
    val docs = Seq(
      ("d1", "s", "a b c"),
      ("d2", "s", "a b c d"))
      .toDF("doc_id", "source", "text")
    val r = docs
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("source"), col("doc_id"),
        explode(TextQueries.trigrams(col("w"))).as("g"))
      .groupBy("source", "g")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("nd"))
      .groupBy("source")
      .agg(sum("cnt").as("n_grams"),
        sum(when(col("nd") > 1, col("cnt")).otherwise(0L)).as("nb"))
      .collect().head
    // grams: "a b c" (×2, cross-doc) + "b c d" (×1) → 2/3 boilerplate
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
  }
}
