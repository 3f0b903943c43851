package graft.streaming

import graft.SparkTestSession
import graft.sources.CorpusManifest
import graft.text.KAnonymity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the online release readout: after N uneven
  * micro-batches, the latest committed release version equals the batch
  * composition (content manifest + k-anonymity risk) over everything
  * streamed; a re-delivered batch is a provable no-op; the verdict MOVES
  * when a batch plants a sub-K class. */
class StreamReleaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def releaseSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
      r.getAs[Long]("n_risk_docs"), r.getAs[Boolean]("releasable"))).toSet

  private def bases(): (String, String, String, String) = {
    def t(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    (t("graft-rel-manifest"), t("graft-rel-kanon"),
      t("graft-rel-release"), t("graft-rel-ckpt"))
  }

  test("running release readout after three uneven waves equals the " +
    "batch composition; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val waves = Seq(docs.take(40), docs.slice(40, 120), docs.drop(120))
    assert(waves.forall(_.nonEmpty))

    val (mBase, kBase, rBase, ckpt) = bases()
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"),
      mBase, kBase, rBase, ckpt)
    try waves.foreach { w =>
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val got = StreamRelease.runningRelease(spark, rBase)
      .getOrElse(fail("no running release readout"))
    val full = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val want = StreamRelease.compose(
      CorpusManifest.contentManifest(full),
      KAnonymity.classCounts(full))
    assert(releaseSet(got) == releaseSet(want),
      "stream-maintained release readout must equal the batch composition")
    // the fixture has sub-K classes, so the readout is non-trivially red
    assert(releaseSet(want).exists(!_._5),
      "fixture must carry at least one non-releasable source")

    // replay idempotence: re-delivering the LAST batch recomputes the
    // same manifest/class versions and overwrites the same release row
    val before = releaseSet(got)
    StreamRelease.update(spark, mBase, kBase, rBase,
      waves.last.toSeq.toDF("doc_id", "text", "lang", "source"),
      batchId = waves.length - 1L)
    assert(releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      == before, "a re-delivered batch must be a no-op")

    // retention: sweeping every store to 1 version keeps the readout
    Seq(mBase, kBase, rBase).foreach { b =>
      assert(StreamManifest.compactVersions(b, keep = 1) >= 1)
    }
    assert(releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      == before, "the readout must survive the sweep")
  }

  test("the online verdict moves: a clean source releases until a batch " +
    "plants a sub-K class") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 10 docs, one (en, s, bucket-0) class of size 10 ≥ K — clean
    val clean = (0L until 10L).map(i =>
      (i, s"alpha$i bravo$i charlie$i", "en", "s"))
    val (mBase, kBase, rBase, ckpt) = bases()
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"),
      mBase, kBase, rBase, ckpt)
    try {
      mem.addData(clean)
      q.processAllAvailable()
      val v1 = releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      assert(v1 == Set(("s", 10L,
        clean.map(_._2.length.toLong).sum, 0L, true)),
        s"clean wave must be releasable: $v1")
      // wave 2 plants a singleton zz class in the same source
      mem.addData(Seq((10L, "delta echo foxtrot", "zz", "s")))
      q.processAllAvailable()
      val v2 = releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      assert(v2.size == 1 && !v2.head._5 && v2.head._4 == 1L &&
        v2.head._2 == 11L,
        s"the planted sub-K class must flip the online verdict: $v2")
    } finally q.stop()
  }
}
