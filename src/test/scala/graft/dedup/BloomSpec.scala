package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one property a Bloom prefilter must never lose: no false
  * negatives — every shingle actually in the eval set must clear the
  * filter, so every document the exact decontamination pass flags is in
  * the Bloom candidate set with at least as many candidate shingles. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloom candidates dominate exact-shared counts (no false negatives)") {
    val b = Bloom.decontamBloom(spark, sf).cache()
    assert(b.filter(col("n_bloom_pass") < col("n_exact_shared")).count() == 0)
    b.unpersist()
  }

  test("every exactly-contaminated document survives the prefilter") {
    import spark.implicits._
    val exact = DedupQueries.decontaminate(spark, sf)
      .select("doc_id").distinct()
    val candidates = Bloom.decontamBloom(spark, sf).select("doc_id")
    val missed = exact.exceptAll(candidates)
    assert(missed.count() == 0)
  }
}
