package graft.streaming

import graft.SparkTestSession
import graft.text.HtmlExtract
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming extractor must agree with the batch gate verdict for
  * verdict: same synthetic pages fed through uneven micro-batches
  * produce the identical (main_tag, main_len, boilerplate_ratio,
  * main_sha) rows — exact equality, extraction is stateless. */
class StreamHtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed raw-page extraction equals the batch verdicts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, sf, "documents")
    // the same synthetic pages the gate builds, as raw (doc_id, page)
    val pages = docs.withColumn("page", HtmlExtract.pageCol)
      .select("doc_id", "page")
    val batch = HtmlExtract.extractPages(pages)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap

    val rows = pages.as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamHtmlExtract.extractOverStream(
      mem.toDS().toDF("doc_id", "page"))
      .writeStream.format("memory").queryName("html_stream")
      .outputMode(StreamHtmlExtract.outputMode).start()
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("html_stream")
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4)))
        .toMap
      assert(streamed.size == batch.size)
      assert(streamed == batch)
      // both populations present in the streamed result too
      val tags = streamed.values.map(_._1).toSet
      assert(tags == Set("div", "footer"))
    } finally q.stop()
  }
}
