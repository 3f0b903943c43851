package graft.streaming

import graft.SparkTestSession
import graft.sources.CorpusManifest
import graft.text.KAnonymity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the online release readout: after N uneven
  * micro-batches, the latest committed release version equals the batch
  * composition (content manifest + k-anonymity risk + the ladder-monoid
  * remediated residue) over everything streamed — and the risk columns
  * equal the BATCH release gate's, proving the online monoid derivation
  * and the per-doc batch derivation agree. A re-delivered batch is a
  * provable no-op; the verdict MOVES when a batch plants a sub-K
  * class. */
class StreamReleaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def releaseSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
      r.getAs[Long]("n_risk_docs"),
      r.getAs[Long]("n_risk_docs_remediated"),
      r.getAs[Boolean]("releasable"),
      r.getAs[Boolean]("releasable_remediated"))).toSet

  private def bases(): (String, String, String, String, String) = {
    def t(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    (t("graft-rel-manifest"), t("graft-rel-kanon"), t("graft-rel-ladder"),
      t("graft-rel-release"), t("graft-rel-ckpt"))
  }

  test("running release readout after three uneven waves equals the " +
    "batch composition AND the batch release gate's risk columns; " +
    "replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val waves = Seq(docs.take(40), docs.slice(40, 120), docs.drop(120))
    assert(waves.forall(_.nonEmpty))

    val (mBase, kBase, lBase, rBase, ckpt) = bases()
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"),
      mBase, kBase, lBase, rBase, ckpt)
    try waves.foreach { w =>
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val got = StreamRelease.runningRelease(spark, rBase)
      .getOrElse(fail("no running release readout"))
    val full = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val want = StreamRelease.compose(
      CorpusManifest.contentManifest(full),
      KAnonymity.classCounts(full),
      KAnonymity.ladderClassCounts(full))
    assert(releaseSet(got) == releaseSet(want),
      "stream-maintained release readout must equal the batch composition")
    // the fixture has sub-K classes, so the readout is non-trivially red
    assert(releaseSet(want).exists(!_._6),
      "fixture must carry at least one non-releasable source")

    // cross-gate law: the ONLINE risk columns equal the BATCH release
    // gate's (the monoid derivation ≡ the per-doc kAnonApply path)
    val gate = graft.operators.ReleaseReport.releaseReport(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_risk_docs"),
          r.getAs[Long]("n_risk_docs_remediated")))).toMap
    releaseSet(got).foreach { case (src, _, _, risk, remed, _, _) =>
      assert(gate(src) == ((risk, remed)),
        s"source $src: online (risk=$risk, remediated=$remed) must " +
          s"equal the batch release gate's ${gate(src)}")
    }

    // replay idempotence: re-delivering the LAST batch recomputes the
    // same input versions and overwrites the same release row
    val before = releaseSet(got)
    StreamRelease.update(spark, mBase, kBase, lBase, rBase,
      waves.last.toSeq.toDF("doc_id", "text", "lang", "source"),
      batchId = waves.length - 1L)
    assert(releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      == before, "a re-delivered batch must be a no-op")

    // retention: sweeping every store to 1 version keeps the readout
    Seq(mBase, kBase, lBase, rBase).foreach { b =>
      assert(StreamManifest.compactVersions(b, keep = 1) >= 1)
    }
    assert(releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      == before, "the readout must survive the sweep")
  }

  test("the online verdict moves: a clean source releases until a batch " +
    "plants a sub-K class — and the remediated verdict clears it when " +
    "the ladder can absorb it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 20 docs, one (en, s, bucket-0) class of size 20 ≥ K — clean; a
    // planted singleton is then 1/21 > the 1% budget at every level
    // that still separates it, so the chosen level is the
    // drop-everything rung where nothing is suppressed (the batch
    // ReleaseReportSpec geometry, replayed online)
    val clean = (0L until 20L).map(i =>
      (i, s"alpha$i bravo$i charlie$i", "en", "s"))
    val (mBase, kBase, lBase, rBase, ckpt) = bases()
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"),
      mBase, kBase, lBase, rBase, ckpt)
    try {
      mem.addData(clean)
      q.processAllAvailable()
      val v1 = releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      assert(v1 == Set(("s", 20L,
        clean.map(_._2.length.toLong).sum, 0L, 0L, true, true)),
        s"clean wave must be releasable in both views: $v1")
      // wave 2 plants a singleton zz class in the same source: raw risk
      // blocks; the budget rejects suppressing 1/21 (> 1%) at every
      // separating level, so the chosen rung is drop-everything —
      // nothing suppressed — and the remediated verdict releases
      mem.addData(Seq((20L, "delta echo foxtrot", "zz", "s")))
      q.processAllAvailable()
      val v2 = releaseSet(StreamRelease.runningRelease(spark, rBase).get)
      assert(v2.size == 1, s"one source: $v2")
      val (_, nDocs, _, risk, remed, ok, okRemed) = v2.head
      assert(nDocs == 21L && risk == 1L && !ok,
        s"the planted sub-K class must flip the raw online verdict: $v2")
      assert(remed == 0L && okRemed,
        s"the ladder must clear the singleton online: $v2")
    } finally q.stop()
  }
}
