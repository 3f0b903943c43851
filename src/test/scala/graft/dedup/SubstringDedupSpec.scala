package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture invariants for the exact-substring dedup operator:
  * a shared ≥k-token verbatim run flags BOTH documents, unrelated text
  * never flags, a run of exactly k tokens contributes exactly one gram,
  * and a gram above the stop-gram df cap is pruned. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val k = SubstringDedup.SubstrK // 8

  /** Write a tiny documents table and run the operator over it. */
  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("substr")
    try {
      docs.toDF("doc_id", "text").withColumn("source", lit("fix"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SubstringDedup.dedupSubstring(spark, dir.toString)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def tokens(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared exactly-k-token run flags both docs with one gram each") {
    val shared = tokens("s", k)
    val r = run(Seq(
      1L -> s"${tokens("a", 5)} $shared ${tokens("b", 5)}",
      2L -> s"${tokens("c", 5)} $shared ${tokens("d", 5)}",
      3L -> tokens("e", 40))) // unrelated
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == ((1L, 1L)) && r(2L) == ((1L, 1L)))
  }

  test("a shared run of k+2 tokens yields three shared grams") {
    val shared = tokens("s", k + 2) // k+2 tokens contain 3 rolling k-grams
    val r = run(Seq(
      1L -> s"${tokens("a", 3)} $shared",
      2L -> s"$shared ${tokens("b", 3)}"))
    assert(r(1L)._1 == 3L && r(2L)._1 == 3L)
  }

  test("a run shared k-1 tokens long never flags") {
    val shared = tokens("s", k - 1)
    val r = run(Seq(
      1L -> s"${tokens("a", 10)} $shared",
      2L -> s"$shared ${tokens("b", 10)}"))
    assert(r.isEmpty)
  }

  test("a gram above the stop-gram df cap is pruned, organic overlap kept") {
    val hot = tokens("hot", k)
    val pair = tokens("p", k)
    val hotDocs =
      (100L until (100L + DedupQueries.MaxShingleDf + 1))
        .map(i => i -> s"${tokens(s"u$i-", 3)} $hot")
    val r = run(hotDocs ++ Seq(1L -> s"$pair ${tokens("x", 4)}",
      2L -> s"$pair ${tokens("y", 4)}"))
    // the boilerplate gram is in MaxShingleDf+1 docs -> pruned entirely
    assert(r.keySet == Set(1L, 2L))
  }

  test("excision covers the union of shared runs, never double-counting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("substrx")
    try {
      val shared = tokens("s", k + 2) // 3 overlapping k-grams, k+2 positions
      Seq((1L, s"${tokens("a", 4)} $shared"),
        (2L, s"$shared ${tokens("b", 4)}"),
        (3L, tokens("c", 30))) // untouched
        .toDF("doc_id", "text").withColumn("source", lit("fix"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = SubstringDedup.dedupSubstringExcise(spark, dir.toString)
        .collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
        .toMap
      assert(r.keySet == Set(1L, 2L)) // doc 3 untouched => absent
      // overlapping grams cover the shared span ONCE: k+2 positions
      assert(r(1L) == ((k + 6L, k + 2L, 4L)))
      assert(r(2L) == ((k + 6L, k + 2L, 4L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("n_partner_grams counts duplication mass across >2-way shares") {
    val shared = tokens("s", k)
    val r = run(Seq(
      1L -> s"$shared ${tokens("a", 3)}",
      2L -> s"$shared ${tokens("b", 3)}",
      3L -> s"$shared ${tokens("c", 3)}"))
    // each doc shares its one gram with two partners: df-1 = 2
    assert(Set(1L, 2L, 3L).forall(d => r(d) == ((1L, 2L))))
  }
}
