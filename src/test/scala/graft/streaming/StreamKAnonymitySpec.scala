package graft.streaming

import graft.SparkTestSession
import graft.text.KAnonymity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the online k-anonymity auditor: the running
  * class counts after N uneven micro-batches equal the batch gate over
  * everything streamed; a re-delivered batch is a provable no-op; the
  * retention sweep keeps the running audit serving. */
class StreamKAnonymitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def auditSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("lang"),
      r.getAs[String]("source"), r.getAs[Long]("len_bucket"),
      r.getAs[Long]("class_size"), r.getAs[Boolean]("at_risk"))).toSet

  test("running audit after three uneven waves equals the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val waves = Seq(docs.take(50), docs.slice(50, 130), docs.drop(130))
    assert(waves.forall(_.nonEmpty))

    val base = java.nio.file.Files
      .createTempDirectory("graft-kanon-stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-kanon-stream-ckpt").toString
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamKAnonymity.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"), base, ckpt)
    try waves.foreach { w =>
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val got = StreamKAnonymity.runningAudit(spark, base)
      .getOrElse(fail("no running audit"))
    assert(auditSet(got) == auditSet(KAnonymity.kAnonymity(spark, dir)),
      "stream-maintained audit must equal the batch gate")

    // replay idempotence: re-running the LAST batch's update against
    // the same batchId overwrites its own version with the same counts
    val before = auditSet(got)
    import spark.implicits._
    StreamKAnonymity.update(spark, base,
      waves.last.toSeq.toDF("doc_id", "text", "lang", "source"),
      batchId = waves.length - 1L)
    val after = auditSet(
      StreamKAnonymity.runningAudit(spark, base).get)
    assert(after == before, "a re-delivered batch must be a no-op")

    // retention: sweeping to 1 version keeps the running audit intact
    val dropped = StreamManifest.compactVersions(base, keep = 1)
    assert(dropped >= 1, "older versions must be swept")
    assert(auditSet(StreamKAnonymity.runningAudit(spark, base).get)
      == before, "the running audit must survive the sweep")
  }
}
