package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic epoch ordering contract: each epoch's positions form a
  * permutation, the two-level rank equals the naive global rank, epochs
  * genuinely reshuffle, and reruns are bit-identical. */
class TrainOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = TrainOrder.trainOrder(spark, dir).collect()
    .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("position")))

  test("each epoch is a permutation of 0..n-1 over the survivors") {
    val surv = graft.sources.CorpusManifest.survivors(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (0 until TrainOrder.Epochs).foreach { e =>
      val epochRows = rows.filter(_._1 == e)
      assert(epochRows.map(_._2).toSet == surv, s"epoch $e doc coverage")
      assert(epochRows.map(_._3).sorted.toSeq ==
        (0L until surv.size.toLong), s"epoch $e positions not a permutation")
    }
  }

  test("two-level rank equals the naive global hash rank") {
    import java.security.MessageDigest
    def okey(epoch: Int, id: Long): Long = {
      val d = MessageDigest.getInstance("SHA-256")
        .digest(s"order|$epoch|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    (0 until TrainOrder.Epochs).foreach { e =>
      val epochRows = rows.filter(_._1 == e)
      val naive = epochRows.map(r => (okey(e, r._2), r._2)).sorted
        .zipWithIndex.map { case ((_, id), ix) => id -> ix.toLong }.toMap
      epochRows.foreach { case (_, id, pos) =>
        assert(pos == naive(id), s"epoch $e doc $id")
      }
    }
  }

  test("epochs reshuffle; reruns are identical") {
    val byEpoch = (0 until TrainOrder.Epochs).map { e =>
      rows.filter(_._1 == e).map(r => r._2 -> r._3).toMap
    }
    // the two epoch permutations must differ on most docs
    val same = byEpoch(0).count { case (id, p) => byEpoch(1)(id) == p }
    assert(same < byEpoch(0).size / 10,
      s"epochs barely reshuffle ($same fixed points)")
    // rerun: bit-identical
    val again = TrainOrder.trainOrder(spark, dir).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("position"))).toSet
    assert(again == rows.toSet, "ordering must be rerun-stable")
  }
}
