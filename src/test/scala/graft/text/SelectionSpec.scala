package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-selection operators (values are hash-oracled
  * by the gate; these pin the semantics the oracle restates):
  * `lm_buckets`' decomposed rank must equal the plain per-language
  * ranking and cut balanced terciles, and `dsir_weights` must equal an
  * independent driver-side recomputation of the hashed-bucket
  * importance weights. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("lm_buckets ranks are a per-language permutation matching (score, doc_id) order") {
    import spark.implicits._
    val rows = TextQueries.lmBuckets(spark, sf)
      .select("lang", "lm_score", "doc_id", "rk", "bucket")
      .as[(String, Double, Long, Long, String)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.length
      // rk is exactly 1..n
      assert(rs.map(_._4).sorted.toSeq == (1L to n).toSeq, s"$lang ranks")
      // rk order == (lm_score, doc_id) lexicographic order
      val byRank = rs.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(byRank == byRank.sorted, s"$lang rank order")
      // buckets are the integer terciles of rk, hence balanced within 1
      rs.foreach { case (_, _, _, rk, bucket) =>
        val expect = (((rk - 1) * 3) / n) match {
          case 0 => "head"; case 1 => "middle"; case _ => "tail"
        }
        assert(bucket == expect, s"$lang rk=$rk")
      }
      val sizes = rs.groupBy(_._5).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$lang tercile balance $sizes")
    }
  }

  test("lm_buckets head scores never exceed middle, middle never exceed tail") {
    import spark.implicits._
    val rows = TextQueries.lmBuckets(spark, sf)
      .select("lang", "bucket", "lm_score")
      .as[(String, String, Double)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      def scores(b: String) = rs.filter(_._2 == b).map(_._3)
      assert(scores("head").max <= scores("middle").min, s"$lang head<=middle")
      assert(scores("middle").max <= scores("tail").min, s"$lang middle<=tail")
    }
  }

  test("dsir_weights equals an independent driver-side recomputation") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        TextQueries.words(col("text")).as("w"))
      .as[(Long, String, Seq[String])].collect()
    def bucket(tok: String): Long = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(tok.getBytes("UTF-8"))
      val hex32 = java.lang.Long.parseLong(
        sha.take(4).map("%02x".format(_)).mkString, 16)
      hex32 % TextQueries.DsirBuckets
    }
    val toks = docs.flatMap { case (id, lang, w) =>
      w.map(t => (id, lang, bucket(t)))
    }
    val raw = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nR = raw.values.sum
    val tgt = toks.filter(_._2 == TextQueries.DsirTargetLang)
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nT = tgt.values.sum
    def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val d: Map[Long, Long] = raw.map { case (b, cr) =>
      b -> (bitLen(nR / cr) - bitLen(nT / tgt.getOrElse(b, 1L)))
    }
    val expected = toks.groupBy(_._1).view.mapValues { ts =>
      (ts.size.toLong, ts.map(t => d(t._3)).sum)
    }.toMap
    val tw = expected.values.map(_._2).sum
    val nd = expected.size.toLong
    val got = TextQueries.dsirWeights(spark, sf)
      .select("doc_id", "n_toks", "dsir_logw", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (id, nToks, logw, keep) =>
      val (en, ew) = expected(id)
      assert(nToks == en, s"doc $id n_toks")
      assert(logw == ew, s"doc $id logw: got $logw expected $ew")
      assert(keep == (logw * nd > tw), s"doc $id keep")
    }
    // the above-mean acceptance must select both ways on this corpus
    assert(got.exists(_._4) && got.exists(!_._4))
  }
}
