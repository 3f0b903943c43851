package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shard-planning contract: the two-level prefix sum must equal the
  * naive per-source cumsum exactly; shard bytes must respect the
  * start-rule bounds; and a hand layout must land on the boundaries
  * computed by hand. */
class ShardPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("hand layout: start-rule boundaries land exactly") {
    import spark.implicits._
    val t = ShardPlan.TargetShardBytes // 2048
    // source s: doc bytes 800 ×4 → starts 0, 800, 1600, 2400 → shards
    // 0, 0, 0, 1 (a doc belongs where it STARTS: 1600 < t ≤ 2400)
    val docs = Seq(
      (1L, "s", "a" * 800), (2L, "s", "b" * 800),
      (3L, "s", "c" * 800), (4L, "s", "d" * 800),
      // second source: one doc longer than the target — its own shard 0
      (1L, "z", "e" * (t.toInt + 1)))
      .map { case (id, src, txt) => (src, id, txt) }
      .toDF("source", "doc_id", "text")
    val got = ShardPlan.placed(docs)
      .select("source", "doc_id", "start", "shard_ix").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("s", 1L)) == ((0L, 0L)))
    assert(got(("s", 2L)) == ((800L, 0L)))
    assert(got(("s", 3L)) == ((1600L, 0L)))
    assert(got(("s", 4L)) == ((2400L, 1L)))
    assert(got(("z", 1L)) == ((0L, 0L)))
  }

  test("two-level prefix sum equals the naive cumsum on the fixture") {
    val surv = CorpusManifest.survivors(spark, dir)
    val got = ShardPlan.placed(surv)
      .select("source", "doc_id", "start").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // naive: per source, sort by doc_id, running byte offset
    val rows = surv.select(col("source"), col("doc_id"),
        length(col("text")).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = rows.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(_._2).scanLeft((src, -1L, 0L, 0L)) {
        case ((_, _, acc, _), (s, id, b)) => (s, id, acc + b, acc)
      }.drop(1).map { case (s, id, _, start) => (s, id) -> start }.toSeq
    }.toMap
    assert(naive.nonEmpty && got.size == naive.size)
    naive.foreach { case (k, start) => assert(got(k) == start, s"$k") }
  }

  test("plan invariants: conservation, fill bound, contiguity") {
    val surv = CorpusManifest.survivors(spark, dir)
    val totals = surv.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(length(col("text")).cast("long"))
        .as("bytes"), max(length(col("text")).cast("long")).as("maxdoc"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val plan = ShardPlan.shardPlan(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard_ix"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bytes"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    val t = ShardPlan.TargetShardBytes
    plan.groupBy(_._1).foreach { case (src, shards) =>
      val (n, bytes, maxdoc) = totals(src)
      assert(shards.map(_._3).sum == n, s"$src doc conservation")
      assert(shards.map(_._4).sum == bytes, s"$src byte conservation")
      // a shard holds the docs STARTING in a window of t bytes — it can
      // overhang by at most one doc
      shards.foreach { case (_, ix, _, b, first, last) =>
        assert(b < t + maxdoc, s"$src shard $ix fill bound")
        assert(first <= last)
      }
      // docs are laid head-to-tail and every doc is shorter than the
      // target here, so shard indexes are contiguous from 0
      assert(maxdoc < t, "fixture precondition for contiguity")
      val ixs = shards.map(_._2).toSeq.sorted
      assert(ixs == Seq.tabulate(ixs.length)(_.toLong), s"$src")
      // multi-shard sources must exist at sf0.001 or the gate is trivial
    }
    assert(plan.groupBy(_._1).values.exists(_.size >= 2),
      "at least one source must plan multiple shards")
  }
}
