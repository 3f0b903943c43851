package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta-merge label maintenance: hand-built pair relations prove the
  * merge/bridge/singleton semantics and the untouched-component
  * isolation; the sf0.001 corpus proves delta ≡ global recompute
  * restricted to the affected nodes — the contract the oracle also
  * checks, re-proven here against the engine's own global CC. */
class IncrementalClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) =
    ps.toDF("a_id", "b_id")

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("bridge doc merges two frozen components; untouched stays out") {
    val old = pairs((1L, 2L), (3L, 4L), (6L, 7L))
    val nw = pairs((10L, 2L), (10L, 3L))
    val r = resultMap(IncrementalClusters.deltaLabels(old, nw))
    assert(r == Map(
      1L -> ((1L, 1L)), 2L -> ((1L, 1L)),
      3L -> ((1L, 3L)), 4L -> ((1L, 3L)),
      10L -> ((1L, -1L))),
      s"merged component mislabeled or untouched {6,7} leaked: $r")
    assert(!r.contains(6L) && !r.contains(7L))
  }

  test("new-new pair with no old contact forms a fresh component") {
    val old = pairs((1L, 2L))
    val nw = pairs((20L, 25L))
    val r = resultMap(IncrementalClusters.deltaLabels(old, nw))
    assert(r == Map(20L -> ((20L, -1L)), 25L -> ((20L, -1L))))
  }

  test("previously-singleton old doc gets prev = -1") {
    // doc 9 never appeared in an old pair (singleton), now matches 10
    val old = pairs((1L, 2L))
    val nw = pairs((10L, 9L))
    val r = resultMap(IncrementalClusters.deltaLabels(old, nw))
    assert(r == Map(9L -> ((9L, -1L)), 10L -> ((9L, -1L))))
  }

  test("new doc with smaller id takes over the label") {
    val old = pairs((10L, 11L))
    val nw = pairs((5L, 11L))
    val r = resultMap(IncrementalClusters.deltaLabels(old, nw))
    assert(r == Map(
      5L -> ((5L, -1L)), 10L -> ((5L, 10L)), 11L -> ((5L, 10L))))
  }

  test("sf0.001: delta == global recompute restricted to affected docs") {
    val dir = "/root/testdata/sf0.001"
    val delta = IncrementalClusters.dedupClustersDelta(spark, dir)
      .localCheckpoint(true)
    val all = DedupQueries.dedupMinhashLsh(spark, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val global = ConnectedComponents.connectedComponents(all)
      .withColumnRenamed("id", "doc_id")
      .withColumnRenamed("comp", "g_comp")
    val joined = delta.join(global, Seq("doc_id"), "left")
    assert(joined.filter(col("g_comp").isNull).count() == 0,
      "every affected doc must appear in the global pair graph")
    assert(joined.filter(col("cluster_id") =!= col("g_comp")).count() == 0,
      "delta labels must equal the global recompute")
    // closure: no UNAFFECTED doc shares a global component with an
    // affected one (otherwise the delta graph under-covered)
    val affectedComps = joined.select(col("g_comp")).distinct()
    val inAffComps = global.join(affectedComps, Seq("g_comp"), "left_semi")
    assert(inAffComps.join(delta.select("doc_id"), Seq("doc_id"),
      "left_anti").count() == 0,
      "a doc in an affected global component is missing from the delta")
    assert(delta.count() > 0, "degenerate: no affected docs at sf0.001")
  }
}
