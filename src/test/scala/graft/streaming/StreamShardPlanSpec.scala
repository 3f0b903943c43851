package graft.streaming

import graft.SparkTestSession
import graft.sources.{CorpusManifest, ShardPlan}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for online shard placement: the survivor corpus
  * streamed in uneven doc_id-ordered micro-batches must place every
  * document at exactly the offset and shard the batch two-level prefix
  * sum computes. */
class StreamShardPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed placement equals the batch prefix sum") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val surv = CorpusManifest.survivors(spark, dir)
      .select(col("source"), col("doc_id"),
        length(col("text")).cast("long").as("bytes"))
      .as[StreamShardPlan.DocIn].collect()
      .sortBy(d => (d.doc_id)) // global doc_id order ⇒ per-source order

    val mem = MemoryStream[StreamShardPlan.DocIn]
    val q = StreamShardPlan.placedOverStream(mem.toDS())
      .writeStream.format("memory").queryName("shard_stream")
      .outputMode(StreamShardPlan.outputMode).start()
    try {
      val (b1, rest) = surv.splitAt(surv.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("shard_stream")
      .collect().map(_.toSeq).toSet
    val batch = ShardPlan.placed(CorpusManifest.survivors(spark, dir))
      .select("source", "doc_id", "start", "shard_ix")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "stream must equal batch placement")
    assert(streamed.nonEmpty)
  }

  test("state recurrence is per-source: interleaved sources don't cross") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val mem = MemoryStream[StreamShardPlan.DocIn]
    val q = StreamShardPlan.placedOverStream(mem.toDS())
      .writeStream.format("memory").queryName("shard_stream2")
      .outputMode(StreamShardPlan.outputMode).start()
    try {
      // batch 1 carries both sources out of id order WITHIN the batch
      mem.addData(
        StreamShardPlan.DocIn("b", 2L, 100L),
        StreamShardPlan.DocIn("a", 1L, 2000L),
        StreamShardPlan.DocIn("a", 2L, 100L))
      q.processAllAvailable()
      // batch 2 continues both
      mem.addData(
        StreamShardPlan.DocIn("a", 3L, 50L),
        StreamShardPlan.DocIn("b", 3L, 10L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("shard_stream2").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // a: 2000 → crosses the 2048 boundary at doc 2; doc 3 rides shard 1
    assert(got(("a", 1L)) == ((0L, 0L)))
    assert(got(("a", 2L)) == ((2000L, 0L)))
    assert(got(("a", 3L)) == ((2100L, 1L)))
    // b: untouched by a's bytes
    assert(got(("b", 2L)) == ((0L, 0L)))
    assert(got(("b", 3L)) == ((100L, 0L)))
  }
}
