package graft.text

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast-relation munch must be bit-identical to the literal-
  * IN-list munch — same greedy longest-match-first semantics, different
  * plan shape (vocab rides a broadcast relation, not plan literals). */
class WordPieceBroadcastSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand case: longest match wins, unknown chars fall back to 1") {
    val pieces = Seq("un", "na", "ff", "able", "affable", "xy")
    val words = Seq("unaffable", "dog", "xyxy", "a").toDF("t")
    val got = WordPiece.munchCountsBroadcast(words, pieces)
      .as[(String, Int)].collect().toMap
    // unaffable: un | affable → 2; dog: d|o|g → 3; xyxy: xy|xy → 2; a → 1
    assert(got == Map("unaffable" -> 2, "dog" -> 3, "xyxy" -> 2, "a" -> 1))
    // literal path agrees
    val lit = words.withColumn("cnt", WordPiece.munchCount(pieces))
      .as[(String, Int)].collect().toMap
    assert(got == lit)
  }

  test("empty piece set: every char is one token") {
    val words = Seq("abc", "z").toDF("t")
    val got = WordPiece.munchCountsBroadcast(words, Nil)
      .as[(String, Int)].collect().toMap
    assert(got == Map("abc" -> 3, "z" -> 1))
  }

  test("broadcast apply equals literal apply on the gate corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.parallel(spark, dir, "documents")
    val pieces = WordPiece.trainPieces(Bpe.symbolizeWeighted(docs), WordPiece.KMerges)
    assert(pieces.nonEmpty)
    val words = docs
      .select(explode(TextQueries.words(col("text"))).as("t")).distinct()
    val literal = words.withColumn("cnt", WordPiece.munchCount(pieces))
      .select("t", "cnt").as[(String, Int)].collect().toMap
    val bcast = WordPiece.munchCountsBroadcast(words, pieces)
      .as[(String, Int)].collect().toMap
    assert(bcast.size == literal.size)
    assert(bcast == literal)
  }

  test("piece relation rides a broadcast join, not a shuffle") {
    val words = Seq("unaffable").toDF("t")
    val plan = WordPiece.munchCountsBroadcast(words, Seq("un", "affable"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }
}
