package graft.streaming

import graft.SparkTestSession
import graft.text.QuantileNorm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-CDF streaming scorer must reproduce the batch calibrated
  * percentiles row-for-row regardless of micro-batching — the stateless
  * array-fold lookup over the per-source CDF is exactly the broadcast
  * equality join the batch gate runs, for scores that exist in the
  * reference corpus; and it stays defined (strictly-less semantics) for
  * scores between histogram points. */
class StreamQuantileNormSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed calibrated percentiles equal the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val cdf = StreamQuantileNorm.frozenCdf(QuantileNorm.scored(spark, sf))
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()

    val mem = MemoryStream[(Long, String, String)]
    val q = StreamQuantileNorm.scoreOverStream(
      mem.toDS().toDF("doc_id", "source", "text"), cdf)
      .writeStream.format("memory").queryName("qnorm_stream")
      .outputMode(StreamQuantileNorm.outputMode).start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val key = (r: org.apache.spark.sql.Row) => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))
      val streamed = spark.table("qnorm_stream").collect().map(key).toMap
      val batch = QuantileNorm.qualityQuantileNorm(spark, sf)
        .collect().map(key).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("a between-histogram-points score gets the strictly-less count") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val cdf = StreamQuantileNorm.frozenCdf(QuantileNorm.scored(spark, sf))
    // one word repeated 3 times: uniq/words = 1/3 → score 3333 — present
    // or not, the fold must count reference scores strictly below it
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamQuantileNorm.scoreOverStream(
      mem.toDS().toDF("doc_id", "source", "text"), cdf)
      .writeStream.format("memory").queryName("qnorm_between")
      .outputMode(StreamQuantileNorm.outputMode).start()
    try {
      mem.addData((999999L, "src0", "alpha alpha alpha"))
      q.processAllAvailable()
      val got = spark.table("qnorm_between").collect()
      assert(got.length == 1)
      val ref = QuantileNorm.scored(spark, sf)
        .filter("source = 'src0'").collect().map(_.getLong(2))
      val want = (1000000L * ref.count(_ < 3333L)) / (ref.length - 1)
      assert(got.head.getLong(2) == 3333L)
      assert(got.head.getLong(3) == want)
    } finally q.stop()
  }
}
