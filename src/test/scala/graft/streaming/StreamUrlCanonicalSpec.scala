package graft.streaming

import graft.SparkTestSession
import graft.text.UrlCanonical
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for online URL canonicalization: the fixture's full
  * synthetic raw-URL relation streamed in uneven micro-batches must
  * canonicalize to exactly the batch chain's output. */
class StreamUrlCanonicalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed canonicalization equals the batch rule chain") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val raw = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(UrlCanonical.rawUrls).as("u"))
      .as[(Long, String)].collect()

    val mem = MemoryStream[(Long, String)]
    val q = StreamUrlCanonical.canonicalOverStream(
        mem.toDS().toDF("doc_id", "u"))
      .writeStream.format("memory").queryName("canon_stream")
      .outputMode(StreamUrlCanonical.outputMode).start()
    try {
      val (b1, rest) = raw.splitAt(raw.length / 3)
      val (b2, b3) = rest.splitAt(1)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("canon_stream")
      .collect().map(_.toSeq).toSet
    val batch = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(UrlCanonical.rawUrls).as("u"))
      .select(col("doc_id"), col("u").as("raw_url"),
        UrlCanonical.canonicalize(col("u")).as("canonical"))
      .withColumn("host",
        regexp_extract(col("canonical"), UrlCanonical.SchemeHostRe, 2))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "stream must equal batch canonicalization")
    assert(streamed.nonEmpty)
  }
}
