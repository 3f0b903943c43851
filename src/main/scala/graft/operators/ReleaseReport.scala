package graft.operators

import graft.Tables
import graft.sources.DropAudit
import graft.text.{KAnonymity, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The release gate — ONE relation a release review reads, composing
  * the governance tiers that previously only existed as separate gates
  * (`drop_audit`, `k_anonymity`, `split_leakage`, `decontaminate`,
  * `dataset_card`): per source, the input size, the write-funnel
  * breakdown (kept / exact-dup / near-dup / quality — exactly
  * [[DropAudit]]'s verdicts, so the report can never disagree with the
  * funnel), the k-anonymity risk mass (documents in sub-K
  * quasi-identifier classes at the audit key), the eval-leakage mass
  * (documents in any cross-split near-duplicate pair), the
  * contamination mass (documents the decontaminator would drop) and
  * the TRANSLATED contamination mass (documents `bitext_decontam`
  * flags as translations of eval docs — zero, stated not silent, on a
  * corpus without an embedding space) — and
  * a single `releasable` verdict: no risk, no leakage, no
  * contamination of either kind. Dedup/quality drops do NOT block release (the funnel
  * already handles them); the three blocking columns are the ones that
  * poison a RELEASE rather than a document.
  *
  * The review also reads the POST-remediation view on the same row:
  * `n_risk_docs_remediated` is the suppressed mass at the
  * budget-chosen generalization level ([[KAnonymity.kAnonApply]] — the
  * publisher's actual action), and `releasable_remediated` re-evaluates
  * the verdict with raw risk replaced by it — so a release blocked only
  * by quasi-identifier risk shows, pre- and post-remediation on one
  * row, whether executing the ladder clears it. Leakage and
  * contamination never remediate by coarsening and still block.
  *
  * Every column composes an already-proven operator relation, so
  * beyond its own oracle this gate certifies the tiers AGREE with each
  * other on one join surface.
  *
  * Scale: the funnel breakdown rides [[DropAudit]] (one corpus scan +
  * memoized pair-bound joins); risk is the k-anonymity class rollup
  * re-aggregated per source (partials ∝ classes); leakage is a
  * projection of the memoized verified-pair relation joined to the
  * doc→source map; contamination is the broadcast eval-shingle join.
  * Everything after is sources-sized, broadcast-joined. */
object ReleaseReport {

  /** Whether the corpus ships an embedding space — probed through the
    * SAME resolution path [[Tables]] uses (a Spark read attempt), so the
    * answer is correct on any filesystem the tables actually live on
    * (HDFS/object storage included); the former `java.io.File` check was
    * local-FS-only and silently zeroed the xcontam column elsewhere.
    * ONLY a missing path means "no embedding space": any other analysis
    * failure (torn write, unreadable schema) PROPAGATES — a governance
    * gate must fail loudly there, not zero a blocker column. */
  private def hasEmbeddings(s: SparkSession, dir: String): Boolean =
    try { Tables(s, dir, "embeddings"); true }
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(_.startsWith("PATH_NOT_FOUND")) =>
        false
    }

  def releaseReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val byVerdict = DropAudit.dropAudit(s, dir)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("verdict") === "exact_dup", 1L).otherwise(0L))
          .as("n_exact_dup"),
        sum(when(col("verdict") === "near_dup", 1L).otherwise(0L))
          .as("n_near_dup"),
        sum(when(col("verdict") === "quality", 1L).otherwise(0L))
          .as("n_quality"))
    // the audit gate's OWN class relation ([[KAnonymity.classCounts]]),
    // re-aggregated per source — the risk column cannot use a different
    // key than the audit it re-reads
    val risk = KAnonymity.classCounts(Tables.parallel(s, dir, "documents"))
      .filter(col("class_size") < KAnonymity.KAnon)
      .groupBy("source").agg(sum("class_size").as("n_risk_docs"))
    // the POST-remediation risk: the docs still suppressed at the
    // budget-chosen generalization level ([[KAnonymity.kAnonApply]] —
    // the SAME relation the apply gate publishes, so the review reads
    // raw risk and remediated risk off one row and can see the
    // generalization ladder actually clears (or fails to clear) a
    // blocked release
    // kAnonApply FAILS LOUDLY when no ladder level fits the budget —
    // right for the publisher's apply gate, wrong for a blocker REPORT,
    // whose job is to state the blockage: when remediation is
    // impossible, the post-remediation residue IS the raw risk (nothing
    // can be generalized away within budget), so the report degrades to
    // that instead of crashing (oracle mirrors via the NULL-level CASE).
    // ONLY the dedicated budget verdict is caught — any other
    // IllegalStateException (Spark internals, checkpoint failure) is a
    // real failure and must propagate, not be reinterpreted as
    // "remediation impossible".
    val remed =
      try KAnonymity.kAnonApply(s, dir)
        .filter(col("suppressed"))
        .select(col("doc_id"))
        .join(docs, "doc_id")
        .groupBy("source").agg(count(lit(1)).as("n_risk_docs_remediated"))
      catch {
        case _: KAnonymity.BudgetUnsatisfiableException =>
          risk.select(col("source"),
            col("n_risk_docs").as("n_risk_docs_remediated"))
      }
    val leakPairs = Sampling.splitLeakage(s, dir)
    val leak = leakPairs.select(col("a_id").as("doc_id"))
      .unionByName(leakPairs.select(col("b_id").as("doc_id")))
      .distinct()
      .join(docs, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_leak_docs"))
    val contam = graft.dedup.DedupQueries.decontaminate(s, dir)
      .select(col("doc_id")).distinct()
      .join(docs, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_contam_docs"))
    // translated eval contamination (bitext_decontam) needs the
    // embedding space — a corpus without one cannot be mined, so the
    // column is zero there (stated, not silent: the schema keeps the
    // column either way)
    val xcontam =
      if (hasEmbeddings(s, dir))
        graft.sim.BitextMine.bitextDecontam(s, dir)
          .select(col("tgt_id").as("doc_id")).distinct()
          .join(docs, "doc_id")
          .groupBy("source").agg(count(lit(1)).as("n_xcontam_docs"))
      else
        docs.select(col("source")).limit(0)
          .withColumn("n_xcontam_docs", lit(0L))
    byVerdict
      .join(broadcast(risk), Seq("source"), "left")
      .join(broadcast(remed), Seq("source"), "left")
      .join(broadcast(leak), Seq("source"), "left")
      .join(broadcast(contam), Seq("source"), "left")
      .join(broadcast(xcontam), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("n_exact_dup"), col("n_near_dup"), col("n_quality"),
        coalesce(col("n_risk_docs"), lit(0L)).as("n_risk_docs"),
        coalesce(col("n_risk_docs_remediated"), lit(0L))
          .as("n_risk_docs_remediated"),
        coalesce(col("n_leak_docs"), lit(0L)).as("n_leak_docs"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"),
        coalesce(col("n_xcontam_docs"), lit(0L)).as("n_xcontam_docs"))
      .withColumn("releasable",
        col("n_risk_docs") === 0L && col("n_leak_docs") === 0L &&
          col("n_contam_docs") === 0L && col("n_xcontam_docs") === 0L)
      // the verdict AFTER executing the chosen generalization: the same
      // blockers with raw risk replaced by the suppressed-at-chosen-level
      // mass — a source blocked only by quasi-identifier risk releases
      // here once the ladder clears it (leak/contamination never
      // remediate by coarsening, so those columns still block)
      .withColumn("releasable_remediated",
        col("n_risk_docs_remediated") === 0L && col("n_leak_docs") === 0L &&
          col("n_contam_docs") === 0L && col("n_xcontam_docs") === 0L)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "release_report" -> releaseReport)

  /** Oracle: the funnel verdicts, k-anon risk rollup, cross-split leak
    * docs and both contamination kinds replayed in one WITH — each
    * sub-chain is the corresponding standalone gate's oracle builder
    * ([[DropAudit.verdictsCtes]], [[Sampling.splitCte]],
    * [[graft.sim.BitextMine.decontamCtes]], the shared lshpairs/shingle
    * CTEs), stated ONCE in the codebase so the composed gate cannot
    * drift from its parts. NOTE the translated-contamination sub-chain
    * reads the embeddings table unconditionally: the oracle runs only
    * on the driver's full sf dirs; the engine's no-embeddings zero
    * branch (fd-style corpora) is spec-covered, not oracle-covered. */
  def oracles: Map[String, String] = {
    // lshPairsCte already begins with the shared `sh` shingle CTE — the
    // contamination sub-chain reuses it rather than redefining it
    val lsh = graft.dedup.DedupQueries.lshPairsCte
    Map("release_report" ->
      (s"WITH RECURSIVE $lsh,\n" +
        s"""${DropAudit.verdictsCtes},
          |byv AS (SELECT source, count(*)::BIGINT AS n_docs,
          |  count(*) FILTER (verdict = 'kept')::BIGINT AS n_kept,
          |  count(*) FILTER (verdict = 'exact_dup')::BIGINT AS n_exact_dup,
          |  count(*) FILTER (verdict = 'near_dup')::BIGINT AS n_near_dup,
          |  count(*) FILTER (verdict = 'quality')::BIGINT AS n_quality
          |  FROM verdicts GROUP BY 1),
          |risk AS (SELECT source, sum(n)::BIGINT AS n_risk_docs FROM (
          |    SELECT lang, source,
          |      length(text) // ${KAnonymity.LenBucket} AS lb,
          |      count(*) AS n
          |    FROM documents GROUP BY 1, 2, 3)
          |  WHERE n < ${KAnonymity.KAnon} GROUP BY source),
          |${Sampling.splitCte},
          |leakdocs AS (SELECT DISTINCT doc_id FROM (
          |    SELECT l.a_id AS doc_id FROM lshpairs l
          |      JOIN sp sa ON sa.doc_id = l.a_id
          |      JOIN sp sb ON sb.doc_id = l.b_id
          |      WHERE sa.split <> sb.split
          |    UNION ALL
          |    SELECT l.b_id FROM lshpairs l
          |      JOIN sp sa ON sa.doc_id = l.a_id
          |      JOIN sp sb ON sb.doc_id = l.b_id
          |      WHERE sa.split <> sb.split)),
          |leak AS (SELECT d.source, count(*)::BIGINT AS n_leak_docs
          |         FROM leakdocs ld JOIN documents d ON d.doc_id = ld.doc_id
          |         GROUP BY 1),
          |contampairs AS (SELECT c.doc_id, e.doc_id AS eval_id,
          |    count(*) AS n
          |  FROM (SELECT doc_id, s FROM sh
          |        WHERE doc_id >= ${graft.dedup.DedupQueries.DecontamEvalDocs}) c
          |  JOIN (SELECT doc_id, s FROM sh
          |        WHERE doc_id < ${graft.dedup.DedupQueries.DecontamEvalDocs}) e
          |    ON e.s = c.s
          |  GROUP BY 1, 2
          |  HAVING count(*) >= ${graft.dedup.DedupQueries.DecontamMinOverlap}),
          |contamdocs AS (SELECT DISTINCT doc_id FROM contampairs),
          |contam AS (SELECT d.source, count(*)::BIGINT AS n_contam_docs
          |           FROM contamdocs cd JOIN documents d ON d.doc_id = cd.doc_id
          |           GROUP BY 1),
          |${graft.sim.BitextMine.decontamCtes},
          |xcontam AS (SELECT d.source, count(*)::BIGINT AS n_xcontam_docs
          |            FROM xflag x JOIN documents d ON d.doc_id = x.doc_id
          |            GROUP BY 1),
          |${KAnonymity.applyCtes("ka")},
          |karemed AS (SELECT d.source,
          |    count(*)::BIGINT AS n_risk_docs_remediated
          |  FROM kaapplied a JOIN documents d ON d.doc_id = a.doc_id
          |  WHERE a.suppressed GROUP BY 1)
          |SELECT b.source, b.n_docs, b.n_kept, b.n_exact_dup, b.n_near_dup,
          |  b.n_quality,
          |  coalesce(r.n_risk_docs, 0)::BIGINT AS n_risk_docs,
          |  (CASE WHEN (SELECT level FROM kachosen) IS NULL
          |     THEN coalesce(r.n_risk_docs, 0)
          |     ELSE coalesce(kr.n_risk_docs_remediated, 0) END)::BIGINT
          |    AS n_risk_docs_remediated,
          |  coalesce(l.n_leak_docs, 0)::BIGINT AS n_leak_docs,
          |  coalesce(c.n_contam_docs, 0)::BIGINT AS n_contam_docs,
          |  coalesce(x.n_xcontam_docs, 0)::BIGINT AS n_xcontam_docs,
          |  (coalesce(r.n_risk_docs, 0) = 0 AND coalesce(l.n_leak_docs, 0) = 0
          |    AND coalesce(c.n_contam_docs, 0) = 0
          |    AND coalesce(x.n_xcontam_docs, 0) = 0) AS releasable,
          |  ((CASE WHEN (SELECT level FROM kachosen) IS NULL
          |      THEN coalesce(r.n_risk_docs, 0)
          |      ELSE coalesce(kr.n_risk_docs_remediated, 0) END) = 0
          |    AND coalesce(l.n_leak_docs, 0) = 0
          |    AND coalesce(c.n_contam_docs, 0) = 0
          |    AND coalesce(x.n_xcontam_docs, 0) = 0) AS releasable_remediated
          |FROM byv b
          |LEFT JOIN risk r USING (source)
          |LEFT JOIN karemed kr USING (source)
          |LEFT JOIN leak l USING (source)
          |LEFT JOIN contam c USING (source)
          |LEFT JOIN xcontam x USING (source)""".stripMargin))
  }
}
