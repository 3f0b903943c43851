package graft.streaming

import graft.SparkTestSession
import graft.dedup.DedupQueries
import graft.sim.BitextMine
import graft.sources.CorpusManifest
import graft.text.{KAnonymity, Sampling}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the online release readout, now over EVERY
  * composable blocker: after N uneven micro-batches of a closed corpus,
  * the latest committed release version equals the batch composition
  * (content manifest + k-anon risk raw/remediated + cross-split leak
  * docs + contamination counts) — and each blocker column equals the
  * BATCH release gate's, proving the online monoid/set derivations and
  * the per-doc batch gates agree. A re-delivered batch is a provable
  * no-op; the verdict MOVES when a batch plants a sub-K class; and the
  * one scoped-out blocker (translated contamination) is proven
  * NON-composable by a planted geometry where one arriving candidate
  * flips the flag of a pair it is not part of. */
class StreamReleaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def releaseSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
      r.getAs[Long]("n_risk_docs"),
      r.getAs[Long]("n_risk_docs_remediated"),
      r.getAs[Long]("n_leak_docs"), r.getAs[Long]("n_contam_docs"),
      r.getAs[Boolean]("releasable"),
      r.getAs[Boolean]("releasable_remediated"))).toSet

  private def bases(): StreamRelease.Bases = {
    def t(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString
    StreamRelease.Bases(t("graft-rel-manifest"), t("graft-rel-kanon"),
      t("graft-rel-ladder"), t("graft-rel-leak"), t("graft-rel-contam"),
      t("graft-rel-release"))
  }

  test("running release readout after three uneven waves equals the " +
    "batch composition AND the batch release gate's blocker columns; " +
    "replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val waves = Seq(docs.take(40), docs.slice(40, 120), docs.drop(120))
    assert(waves.forall(_.nonEmpty))

    val b = bases()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-rel-ckpt").toString
    val feeds = StreamRelease.pairFeeds(spark, dir)
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"), b, feeds, ckpt)
    try waves.foreach { w =>
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val got = StreamRelease.runningRelease(spark, b.release)
      .getOrElse(fail("no running release readout"))
    // the scope statement ships IN the stored schema
    assert(got.select("scope").distinct().as[String].collect().toSeq ==
      Seq(StreamRelease.Scope),
      "the stored rows must carry the verdict's scope")

    // composition law: online == the batch composition over everything
    // streamed, with the batch gates' own leak/contam relations
    val full = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val docsSrc = full.select(col("doc_id"), col("source"))
    val leakPairs = Sampling.splitLeakage(spark, dir)
    val leakFlags = leakPairs.select(col("a_id").as("doc_id"))
      .unionByName(leakPairs.select(col("b_id").as("doc_id")))
      .distinct().join(docsSrc, "doc_id")
    val contamCounts = DedupQueries.decontaminate(spark, dir)
      .select(col("doc_id")).distinct().join(docsSrc, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_contam_docs"))
    val want = StreamRelease.compose(
      CorpusManifest.contentManifest(full),
      KAnonymity.classCounts(full),
      KAnonymity.ladderClassCounts(full),
      leakFlags, contamCounts)
    assert(releaseSet(got) == releaseSet(want),
      "stream-maintained release readout must equal the batch composition")
    // the fixture carries nonzero leak AND contamination mass, so the
    // new columns are non-trivially exercised
    assert(releaseSet(want).exists(_._6 > 0L),
      "fixture must carry at least one leak-blocked source")
    assert(releaseSet(want).exists(_._7 > 0L),
      "fixture must carry at least one contamination-blocked source")

    // cross-gate law: the ONLINE blocker columns equal the BATCH
    // release gate's (monoid/set derivations ≡ the per-doc gates), and
    // the online verdict is exactly the gate's verdict restricted to
    // the composable blockers
    val gate = graft.operators.ReleaseReport.releaseReport(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_risk_docs"),
          r.getAs[Long]("n_risk_docs_remediated"),
          r.getAs[Long]("n_leak_docs"),
          r.getAs[Long]("n_contam_docs")))).toMap
    releaseSet(got).foreach {
      case (src, _, _, risk, remed, leak, contam, ok, okRemed) =>
        assert(gate(src) == ((risk, remed, leak, contam)),
          s"source $src: online (risk=$risk, remediated=$remed, " +
            s"leak=$leak, contam=$contam) must equal the batch gate's " +
            s"${gate(src)}")
        assert(ok == (risk == 0L && leak == 0L && contam == 0L) &&
          okRemed == (remed == 0L && leak == 0L && contam == 0L),
          s"source $src: the online verdict must be the gate's verdict " +
            "over exactly the composable blockers")
    }

    // replay idempotence: re-delivering the LAST batch recomputes the
    // same input versions and overwrites the same release row
    val before = releaseSet(got)
    StreamRelease.update(spark, b, feeds,
      waves.last.toSeq.toDF("doc_id", "text", "lang", "source"),
      batchId = waves.length - 1L)
    assert(releaseSet(StreamRelease.runningRelease(spark, b.release).get)
      == before, "a re-delivered batch must be a no-op")

    // retention: sweeping every store to 1 version keeps the readout
    b.all.foreach { base =>
      assert(StreamManifest.compactVersions(base, keep = 1) >= 1)
    }
    assert(releaseSet(StreamRelease.runningRelease(spark, b.release).get)
      == before, "the readout must survive the sweep")
  }

  test("a source implicated in a leak BEFORE any of its own docs arrive " +
    "gets a blocking row (n_docs=0) — its flags are not silently dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // pick a cross-split leaking pair whose endpoints live in DIFFERENT
    // sources, and stream ONLY one endpoint — the partner's source has
    // ingested nothing when the readout is taken
    val docsSrc = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val pair = Sampling.splitLeakage(spark, dir)
      .join(docsSrc.select(col("doc_id").as("a_id"),
        col("source").as("src_a")), "a_id")
      .join(docsSrc.select(col("doc_id").as("b_id"),
        col("source").as("src_b")), "b_id")
      .filter(col("src_a") =!= col("src_b"))
      .select("a_id", "src_a", "src_b").head()
    val (aId, aSrc, bSrc) =
      (pair.getLong(0), pair.getString(1), pair.getString(2))
    val aDoc = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") === aId)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].head()

    val b = bases()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-rel-orphan-ckpt").toString
    val feeds = StreamRelease.pairFeeds(spark, dir)
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"), b, feeds, ckpt)
    try { mem.addData(aDoc); q.processAllAvailable() } finally q.stop()

    val rows = StreamRelease.runningRelease(spark, b.release).get
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_leak_docs"),
          r.getAs[Boolean]("releasable"),
          r.getAs[Boolean]("releasable_remediated")))).toMap
    assert(rows.contains(bSrc),
      s"partner source $bSrc (no ingested docs) must still get a row")
    val (bDocs, bLeak, bOk, bOkRemed) = rows(bSrc)
    assert(bDocs == 0L && bLeak >= 1L && !bOk && !bOkRemed,
      s"orphan source $bSrc must read n_docs=0 with blocking leak " +
        s"flags, got $bDocs/$bLeak/$bOk/$bOkRemed")
    // the arriving side's own source carries its endpoint too
    assert(rows(aSrc)._2 >= 1L,
      s"arriving source $aSrc must carry its own endpoint's flag")
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
    // ReleaseReportSpec geometry, replayed online). Every text is
    // unique and 3 words long, so the frozen index yields no near-dup
    // pairs (no leak) and no eval overlap reaches the contamination
    // threshold — the movement below is PURELY the k-anon dimension.
    val clean = (0L until 20L).map(i =>
      (i, s"alpha$i bravo$i charlie$i", "en", "s"))
    val planted = (20L, "delta echo foxtrot", "zz", "s")
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-rel-move").toString
    (clean :+ planted).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    val feeds = StreamRelease.pairFeeds(spark, corpusDir)

    val b = bases()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-rel-move-ckpt").toString
    val mem = MemoryStream[(Long, String, String, String)]
    val q = StreamRelease.maintain(
      mem.toDS().toDF("doc_id", "text", "lang", "source"), b, feeds, ckpt)
    try {
      mem.addData(clean)
      q.processAllAvailable()
      val v1 = releaseSet(StreamRelease.runningRelease(spark, b.release).get)
      assert(v1 == Set(("s", 20L,
        clean.map(_._2.length.toLong).sum, 0L, 0L, 0L, 0L, true, true)),
        s"clean wave must be releasable in both views: $v1")
      // wave 2 plants a singleton zz class in the same source: raw risk
      // blocks; the budget rejects suppressing 1/21 (> 1%) at every
      // separating level, so the chosen rung is drop-everything —
      // nothing suppressed — and the remediated verdict releases
      mem.addData(Seq(planted))
      q.processAllAvailable()
      val v2 = releaseSet(StreamRelease.runningRelease(spark, b.release).get)
      assert(v2.size == 1, s"one source: $v2")
      val (_, nDocs, _, risk, remed, leak, contam, ok, okRemed) = v2.head
      assert(nDocs == 21L && risk == 1L && leak == 0L && contam == 0L && !ok,
        s"the planted sub-K class must flip the raw online verdict: $v2")
      assert(remed == 0L && okRemed,
        s"the ladder must clear the singleton online: $v2")
    } finally q.stop()
  }

  test("translated contamination is NOT per-document composable: one " +
    "arriving candidate flips an existing flag — the measured reason " +
    "the online verdict scopes it out") {
    import spark.implicits._
    def v(x: Double): Array[Float] =
      Array(x.toFloat, math.sqrt(1 - x * x).toFloat, 0f)
    // eval doc e on the x-axis; fr candidates at controlled cosine to e
    val e = (0L, "en", Array(1f, 0f, 0f))
    val c100 = (100L, "fr", v(0.9)) // the flagged "translation"
    val c101 = (101L, "fr", v(0.1)) // far candidate (margin context)
    val prefix = Seq(e, c100, c101)
    // two more near-but-not-best candidates ARRIVE: they densify e's
    // neighborhood (x-penalty rises 0.5 → 0.675), dragging the margin
    // of (e, c100) from 1.286 below the 1.15 threshold — a pair NEITHER
    // arrival is part of loses its flag
    val arrivals = Seq((102L, "fr", v(0.85)), (103L, "fr", v(0.85)))

    def flags(rows: Seq[(Long, String, Array[Float])]): Set[(Long, Long)] =
      BitextMine.decontamOver(rows.toDF("doc_id", "lang", "embedding"))
        .filter(col("margin") >= BitextMine.MarginThresh)
        .select(col("src_id"), col("tgt_id"))
        .as[(Long, Long)].collect().toSet

    val before = flags(prefix)
    assert(before == Set((0L, 100L)),
      s"the prefix corpus must flag the planted translation: $before")
    val after = flags(prefix ++ arrivals)
    assert(after.isEmpty,
      s"two unrelated arrivals must UN-flag (0,100) via the margin's " +
        s"corpus-relative denominator: $after")
    // hence no counting/set monoid over arriving docs can maintain the
    // flag set: the update for (102, 103) would need to RETRACT a flag
    // on (0, 100) — exactly what StreamRelease.Scope states
    assert(StreamRelease.Scope.contains("translated-contamination"))
  }
}
