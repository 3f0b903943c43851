package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_simhash_hamming` — the collapse-first Manku block index must
  * be PAIR-IDENTICAL to the exhaustive per-doc form, including on an
  * exact-dup mega-group (one signature node, never C(g,2) candidates),
  * and its output must satisfy the relation's contract: canonical
  * ordering, 1 ≤ hamming ≤ K, and NO pair within an identical-signature
  * group (that is `dedup_simhash`'s relation). */
class SimhashHammingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Straightforward per-doc reference: block join over every doc,
    * popcount verify — the oracle's shape in DataFrame form. */
  private def flatReference(dir: String): DataFrame = {
    val sim = graft.Tables.parallel(spark, dir, "documents")
      .withColumn("w", graft.text.TextQueries.words(col("text")))
      .filter(size(col("w")) >= 1)
      .selectExpr("doc_id", s"${DedupQueries.simhashExpr("w")} AS simhash")
    val blocks = sim.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), j -> struct(j AS j, " +
        "shiftright(simhash, 8 * j) & 255 AS key))")).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.j").as("j"),
        col("b.key").as("key"))
    blocks.as("a").join(blocks.as("b"),
        col("a.j") === col("b.j") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") >= 1 &&
        col("hamming") <= DedupQueries.SimhashHammingK)
      .select("a_id", "b_id", "hamming")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("collapse-first == exhaustive on the fixture corpus; contract holds") {
    val dir = "/root/testdata/sf0.001"
    val grouped = pairSet(DedupQueries.dedupSimhashHamming(spark, dir))
    val flat = pairSet(flatReference(dir))
    assert(grouped == flat,
      s"grouped minus flat: ${(grouped -- flat).take(5)}; " +
        s"flat minus grouped: ${(flat -- grouped).take(5)}")
    assert(grouped.nonEmpty, "fixture corpus should carry Hamming pairs")
    grouped.foreach { case (a, b, h) =>
      assert(a < b, s"pair ($a, $b) not canonically ordered")
      assert(h >= 1 && h <= DedupQueries.SimhashHammingK,
        s"hamming $h outside (0, K]")
    }
  }

  test("an exact-dup mega-group emits no intra pairs and one node's work") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("simhashham").toString
    try {
      val sameText = "alpha beta gamma delta epsilon zeta eta theta"
      // one word differs -> a few simhash bits flip; may or may not land
      // within K, but BOTH pipelines must agree either way
      val nearText = "alpha beta gamma delta epsilon zeta eta iota"
      val rows = (0 until 8).map(i => (100L + i, sameText, "fix")) ++
        Seq((200L, nearText, "fix"),
          (300L, "utterly different storm river mountain words", "fix"))
      rows.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val grouped = pairSet(DedupQueries.dedupSimhashHamming(spark, dir))
      val flat = pairSet(flatReference(dir))
      assert(grouped == flat)
      // intra-group pairs are distance 0 — excluded by contract
      assert(!grouped.exists(p => p._1 >= 100 && p._1 < 108 &&
        p._2 >= 100 && p._2 < 108), "identical-signature pair leaked")
      // if the near doc pairs with one group member it pairs with ALL
      // (same signature node), with one shared hamming
      val near = grouped.filter(p => p._1 == 200L || p._2 == 200L)
        .filter(p => p._1 >= 100 || p._2 >= 100)
      if (near.nonEmpty) {
        val toGroup = near.filter(p => p._1 < 108 && p._1 >= 100)
        if (toGroup.nonEmpty) {
          assert(toGroup.size == 8, s"partial group expansion: $toGroup")
          assert(toGroup.map(_._3).size == 1)
        }
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
