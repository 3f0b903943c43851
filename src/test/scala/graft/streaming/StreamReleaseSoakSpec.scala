package graft.streaming

import graft.SparkTestSession
import graft.text.KAnonymity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Long-run soak of the composed release maintainer: ~100 UNEVEN
  * micro-batches over one closed corpus, retention sweeps interleaved
  * mid-stream — the dimension the 3–4-batch law specs never exercise:
  * version growth. Asserts (a) external state stays domain-bounded per
  * version (manifest/contam/release ∝ sources, ladder ∝ classes ×
  * levels × sources, leak ∝ flagged docs — measured as ROWS of the
  * latest version, version COUNT capped by retention), (b) the
  * retention sweep actually deletes, mid-stream, without breaking the
  * next merge (merges read the latest strictly-earlier version, which
  * `keep ≥ 1` always preserves), and (c) the readout after 100 batches
  * + sweeps still equals the batch release gate's blocker columns.
  * Store sizes are printed at batch 10/50/100 for SCALE.md's measured
  * row. */
class StreamReleaseSoakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def dirStats(base: String): (Int, Long) = {
    val d = new java.io.File(base)
    val versions = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
    def bytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(bytes).sum
    (versions.length, versions.map(bytes).sum)
  }

  test("100 uneven micro-batches with mid-stream retention: state stays " +
    "domain-bounded, sweeps delete, final readout equals the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    // uneven slicing: 99 batches of cycling size 1..3, the remainder
    // dumped as one big final batch
    val sizes = (0 until 99).map(i => i % 3 + 1)
    val cuts = sizes.scanLeft(0)(_ + _)
    val waves = (cuts.dropRight(1) zip cuts.drop(1))
      .map { case (a, z) => docs.slice(a, z) }
      .filter(_.nonEmpty) :+ docs.drop(cuts.last)
    assert(waves.size >= 100 && waves.forall(_.nonEmpty),
      s"soak needs ~100 non-empty batches, got ${waves.size}")

    def t(n: String) = java.nio.file.Files.createTempDirectory(n).toString
    val b = StreamRelease.Bases(t("soak-m"), t("soak-k"), t("soak-l"),
      t("soak-lk"), t("soak-c"), t("soak-r"))
    val feeds = StreamRelease.pairFeeds(spark, dir)
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"),
      b, feeds, t("soak-ckpt"))

    var swept = 0
    val sizesAt = scala.collection.mutable.ArrayBuffer[String]()
    try waves.zipWithIndex.foreach { case (w, i) =>
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
      // retention every 20 batches, mid-stream: keep 3 — the next
      // batch's merge base (latest < batchId) always survives
      if ((i + 1) % 20 == 0)
        swept += b.all.map(StreamManifest.compactVersions(_, keep = 3)).sum
      if (Seq(10, 50, 100).contains(i + 1)) {
        val names = Seq("manifest", "kanon", "ladder", "leak", "contam",
          "release")
        val line = (names zip b.all).map { case (n, base) =>
          val (nv, bytes) = dirStats(base)
          s"$n=${nv}v/${bytes / 1024}KiB"
        }.mkString(s"batch ${i + 1}: ", " ", "")
        sizesAt += line
        info(line)
      }
    } finally q.stop()
    assert(swept > 0, "the mid-stream retention sweeps must delete")

    // version growth is capped by retention: after a final sweep every
    // store holds exactly `keep` versions regardless of the 100-batch
    // history
    b.all.foreach(StreamManifest.compactVersions(_, keep = 3))
    b.all.foreach { base =>
      val (nv, _) = dirStats(base)
      assert(nv == 3, s"$base must hold exactly the retained versions")
    }

    // per-version state is domain-bounded, not history-bounded: the
    // latest version's ROWS equal the batch-derived relation's
    val full = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    def latestRows(base: String): Long =
      StreamRelease.runningRelease(spark, base).get.count()
    assert(latestRows(b.ladder) ==
      KAnonymity.ladderClassCounts(full).count(),
      "ladder store must hold exactly the classes × levels × sources rows")
    val nSources = full.select("source").distinct().count()
    assert(latestRows(b.manifest) == nSources &&
      latestRows(b.release) == nSources,
      "manifest/release stores must stay sources-sized")

    // and the readout still equals the batch gate after 100 batches +
    // interleaved sweeps
    val gate = graft.operators.ReleaseReport.releaseReport(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_risk_docs"),
          r.getAs[Long]("n_risk_docs_remediated"),
          r.getAs[Long]("n_leak_docs"),
          r.getAs[Long]("n_contam_docs")))).toMap
    StreamRelease.runningRelease(spark, b.release).get.collect()
      .foreach { r =>
        val src = r.getAs[String]("source")
        val got = (r.getAs[Long]("n_risk_docs"),
          r.getAs[Long]("n_risk_docs_remediated"),
          r.getAs[Long]("n_leak_docs"), r.getAs[Long]("n_contam_docs"))
        assert(gate(src) == got,
          s"source $src after the soak: $got != gate ${gate(src)}")
      }
  }
}
