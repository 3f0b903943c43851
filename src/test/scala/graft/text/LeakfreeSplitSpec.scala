package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `split_leakfree` and `dedup_keep_best` — the two production policies
  * composed from the cluster labels. The load-bearing claims: the
  * leak-free assignment admits ZERO cross-split verified pairs (the
  * exact relation `split_leakage` reports on the naive split), moves
  * ONLY clustered documents relative to [[Sampling.trainSplit]], and
  * the best-quality keeper is always a member of its cluster with the
  * policy's ordering honored. */
class LeakfreeSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("leak-free assignment has zero cross-split verified pairs") {
    val pairs = graft.dedup.DedupQueries.dedupMinhashLsh(spark, sf)
      .select(col("a_id"), col("b_id"))
    assert(pairs.count() > 0, "fixture must carry verified pairs")
    val splits = Sampling.splitLeakfree(spark, sf)
      .select(col("doc_id"), col("split"))
    val leaks = pairs
      .join(splits.select(col("doc_id").as("a_id"),
        col("split").as("split_a")), "a_id")
      .join(splits.select(col("doc_id").as("b_id"),
        col("split").as("split_b")), "b_id")
      .filter(col("split_a") =!= col("split_b"))
    assert(leaks.count() == 0,
      s"cross-split near-dup pairs under the leak-free assignment")
    // ... while the naive per-doc split DOES leak on this fixture (the
    // report this operator exists to zero out is non-degenerate)
    assert(Sampling.splitLeakage(spark, sf).count() > 0,
      "naive split no longer leaks — the fixture stopped exercising " +
        "the operator; re-derive the spec corpus")
  }

  test("only clustered documents move relative to the naive split") {
    val naive = Sampling.trainSplit(spark, sf)
      .select(col("doc_id"), col("split").as("naive_split"))
    val free = Sampling.splitLeakfree(spark, sf)
    val clustered = graft.dedup.ConnectedComponents.dedupClusters(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val moved = free.join(naive, "doc_id")
      .filter(col("split") =!= col("naive_split"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(moved.subsetOf(clustered),
      s"unclustered docs moved: ${(moved -- clustered).take(5)}")
    // unclustered docs keep the identical bucket (same salt, own id)
    val same = free.join(naive, "doc_id")
      .filter(!col("doc_id").isin(clustered.toSeq: _*))
      .filter(col("split") =!= col("naive_split"))
    assert(same.count() == 0)
  }

  test("keeper is a cluster member and honors (pass, length, id) order") {
    val clusters = graft.dedup.ConnectedComponents.dedupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id")).collect()
      .groupBy(_.getLong(1)).map { case (c, rs) =>
        c -> rs.map(_.getLong(0)).toSet }
    val quality = TextQueries
      .gopherFlags(graft.Tables(spark, sf, "documents"))
      .select(col("doc_id"), col("n_words"), col("pass")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(1)))).toMap
    val best = graft.dedup.ConnectedComponents.dedupKeepBest(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(best.nonEmpty)
    best.foreach { case (cid, keeper, size, nPass) =>
      val members = clusters(cid)
      assert(members.contains(keeper), s"keeper $keeper not in cluster $cid")
      assert(members.size == size)
      assert(members.count(m => quality(m)._1) == nPass)
      // no member strictly beats the keeper under the policy order
      val (kp, kw) = quality(keeper)
      members.foreach { m =>
        val (mp, mw) = quality(m)
        val beats = (mp && !kp) || (mp == kp && mw > kw) ||
          (mp == kp && mw == kw && m < keeper)
        assert(!beats, s"member $m beats keeper $keeper in cluster $cid")
      }
    }
  }
}
