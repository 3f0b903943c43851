package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Release-gate contract on planted corpora: a clean corpus is
  * releasable; planting ONE violation of each blocking kind (sub-K
  * quasi-identifier class, cross-split near-dup pair, eval
  * contamination) flips `releasable` for exactly the affected source.
  * Fixture-level agreement with the composed gates is covered by the
  * oracle; this spec proves the verdict MOVES. */
class ReleaseReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // distinct, dissimilar filler texts (≥ 3 words for shingling, < 100
  // chars so every doc lands in len bucket 0)
  private def filler(i: Long): String =
    s"token$i alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i"

  /** 20 clean docs: two sources × 10 docs, one (lang, source, bucket)
    * class each (size 10 ≥ K), ids ≥ DecontamEvalDocs so the eval set
    * is empty, texts mutually dissimilar. */
  private def cleanRows: Seq[(Long, String, String, String)] =
    (100L until 120L).map { i =>
      (i, filler(i), "en", if (i < 110) "a" else "b")
    }

  private def writeCorpus(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-release").toString
    rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def report(dir: String):
      Map[String, (Long, Long, Long, Long, Boolean)] =
    ReleaseReport.releaseReport(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_risk_docs"), r.getAs[Long]("n_leak_docs"),
          r.getAs[Long]("n_contam_docs"), r.getAs[Long]("n_xcontam_docs"),
          r.getAs[Boolean]("releasable"))))
      .toMap

  /** The engine's split assignment, replayed driver-side (sha256 of
    * "split|<id>", first 8 hex chars as a long, mod 100). */
  private def splitOf(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"split|$id".getBytes("UTF-8"))
    val bucket = java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16) % 100
    if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
  }

  test("a clean corpus is releasable for every source") {
    val rep = report(writeCorpus(cleanRows))
    assert(rep.keySet == Set("a", "b"))
    rep.foreach { case (src, (risk, leak, contam, xcontam, ok)) =>
      assert(risk == 0 && leak == 0 && contam == 0 && xcontam == 0 && ok,
        s"source $src must be clean: risk=$risk leak=$leak contam=$contam")
    }
  }

  test("a planted sub-K quasi-identifier class flips releasable for its " +
    "source only") {
    val rep = report(writeCorpus(cleanRows :+
      ((120L, filler(120L), "zz", "a"))))
    assert(rep("a") == ((1L, 0L, 0L, 0L, false)),
      s"source a must carry exactly the planted singleton: ${rep("a")}")
    assert(rep("b")._5, "source b must stay releasable")
  }

  test("remediation view: a sub-K class blocks raw release but the " +
    "budget-chosen generalization clears it — releasable_remediated") {
    val rows = ReleaseReport
      .releaseReport(spark, writeCorpus(cleanRows :+
        ((120L, filler(120L), "zz", "a"))))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_risk_docs"),
          r.getAs[Long]("n_risk_docs_remediated"),
          r.getAs[Boolean]("releasable"),
          r.getAs[Boolean]("releasable_remediated"))))
      .toMap
    // the zz singleton is raw risk; the ladder's chosen level (here the
    // drop-everything level 4, the first within the 1% budget) merges it
    // into the size-21 class, so the remediated mass is zero
    assert(rows("a") == ((1L, 0L, false, true)),
      s"source a must block raw and release remediated: ${rows("a")}")
    assert(rows("b") == ((0L, 0L, true, true)),
      s"source b is clean in both views: ${rows("b")}")
  }

  test("remediation impossible (corpus smaller than K): the report " +
    "degrades to residue = raw risk instead of crashing or lying green") {
    val rows = ReleaseReport
      .releaseReport(spark, writeCorpus(
        (200L until 203L).map(i => (i, filler(i), "en", "a"))))
      .collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_risk_docs"),
        r.getAs[Long]("n_risk_docs_remediated"),
        r.getAs[Boolean]("releasable"),
        r.getAs[Boolean]("releasable_remediated")))
    // 3 docs < K=5: every doc is raw risk, no ladder level fits the
    // budget (even one-class-of-all is sub-K), so nothing remediates
    assert(rows.toSeq == Seq(("a", 3L, 3L, false, false)),
      s"remediated residue must equal raw risk when no level fits: " +
        rows.toSeq)
  }

  test("remediation never clears a leak: releasable_remediated still " +
    "blocks on the leakage column") {
    val ids = (200L until 260L)
    val train = ids.find(splitOf(_) == "train").get
    val test0 = ids.find(splitOf(_) == "test").get
    val dup = "identical leak text with enough words to shingle " +
      "and verify jaccard one"
    val rows = ReleaseReport
      .releaseReport(spark, writeCorpus(cleanRows ++
        Seq((train, dup, "en", "a"), (test0, dup, "en", "a"))))
      .collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Boolean]("releasable_remediated")).toMap
    assert(!rows("a"), "coarsening quasi-identifiers cannot remediate a " +
      "cross-split leak — the remediated verdict must still block")
    assert(rows("b"))
  }

  test("a planted cross-split near-dup pair flips releasable via the " +
    "leakage column") {
    // pick two ids the hash split assigns to DIFFERENT splits
    val ids = (200L until 260L)
    val train = ids.find(splitOf(_) == "train").get
    val test0 = ids.find(splitOf(_) == "test").get
    val dup = "identical leak text with enough words to shingle " +
      "and verify jaccard one"
    val rep = report(writeCorpus(cleanRows ++
      Seq((train, dup, "en", "a"), (test0, dup, "en", "a"))))
    val (risk, leak, contam, xcontam, ok) = rep("a")
    assert(leak == 2L, s"both pair ends must be leak docs, got $leak")
    assert(risk == 0L && contam == 0L && xcontam == 0L && !ok)
    assert(rep("b")._5, "source b must stay releasable")
  }

  test("planted eval contamination flips releasable via the " +
    "contamination column") {
    // an eval doc (id < DecontamEvalDocs) sharing all shingles with a
    // corpus doc in the SAME split (so the leak column stays clean)
    val evalId = 5L
    val corpusId = (200L until 300L)
      .find(i => splitOf(i) == splitOf(evalId)).get
    val shared = "contaminated benchmark passage with plenty of words " +
      "to produce at least five distinct shingles"
    val rep = report(writeCorpus(cleanRows ++
      Seq((evalId, shared, "en", "a"), (corpusId, shared, "en", "a"))))
    val (risk, leak, contam, xcontam, ok) = rep("a")
    assert(contam == 1L,
      s"exactly the corpus-side doc is contaminated, got $contam")
    assert(leak == 0L && risk == 0L && xcontam == 0L && !ok)
    assert(rep("b")._5, "source b must stay releasable")
  }

  test("a planted TRANSLATION of an eval doc flips releasable via the " +
    "cross-lingual contamination column") {
    import spark.implicits._
    // six xx docs (class size 6 ≥ K keeps the risk column clean): one
    // is the planted translation of eval doc 5 (near-identical
    // embedding), five are orthogonal distractors
    val xxIds = (250L to 255L)
    val rows = cleanRows ++
      Seq((5L, filler(5L), "en", "a")) ++
      xxIds.map(i => (i, filler(i), "xx", "a"))
    val dir = writeCorpus(rows)
    def axis(i: Int): Array[Float] = {
      val a = new Array[Float](8); a(i) = 1f; a
    }
    val embs =
      Seq((5L, axis(0)), (250L, axis(0))) ++ // 250 = the translation
        (251L to 255L).zipWithIndex.map { case (i, k) => (i, axis(k + 1)) }
    embs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rep = report(dir)
    val (risk, leak, contam, xcontam, ok) = rep("a")
    assert(xcontam == 1L,
      s"exactly the planted translation is flagged, got $xcontam")
    assert(risk == 0L && leak == 0L && contam == 0L && !ok)
    assert(rep("b")._5, "source b must stay releasable")
  }
}
