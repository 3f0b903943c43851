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
    val risk = Tables.parallel(s, dir, "documents")
      .select(col("lang"), col("source"),
        expr(s"length(text) div ${KAnonymity.LenBucket}").as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < KAnonymity.KAnon)
      .groupBy("source").agg(sum("n").as("n_risk_docs"))
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
      if (new java.io.File(s"$dir/embeddings.parquet").exists())
        graft.sim.BitextMine.bitextDecontam(s, dir)
          .select(col("tgt_id").as("doc_id")).distinct()
          .join(docs, "doc_id")
          .groupBy("source").agg(count(lit(1)).as("n_xcontam_docs"))
      else
        docs.select(col("source")).limit(0)
          .withColumn("n_xcontam_docs", lit(0L))
    byVerdict
      .join(broadcast(risk), Seq("source"), "left")
      .join(broadcast(leak), Seq("source"), "left")
      .join(broadcast(contam), Seq("source"), "left")
      .join(broadcast(xcontam), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("n_exact_dup"), col("n_near_dup"), col("n_quality"),
        coalesce(col("n_risk_docs"), lit(0L)).as("n_risk_docs"),
        coalesce(col("n_leak_docs"), lit(0L)).as("n_leak_docs"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"),
        coalesce(col("n_xcontam_docs"), lit(0L)).as("n_xcontam_docs"))
      .withColumn("releasable",
        col("n_risk_docs") === 0L && col("n_leak_docs") === 0L &&
          col("n_contam_docs") === 0L && col("n_xcontam_docs") === 0L)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "release_report" -> releaseReport)

  /** Oracle: the funnel verdicts, k-anon risk rollup, cross-split leak
    * docs and contamination docs replayed in one WITH — each sub-chain
    * is the corresponding standalone gate's proven oracle. */
  def oracles: Map[String, String] = {
    import graft.text.TextQueries._
    // lshPairsCte already begins with the shared `sh` shingle CTE — the
    // contamination sub-chain reuses it rather than redefining it
    val lsh = graft.dedup.DedupQueries.lshPairsCte
    Map("release_report" ->
      (s"WITH RECURSIVE $lsh,\n" +
        s"""edges AS (SELECT a_id AS src, b_id AS dst FROM lshpairs
          |          UNION SELECT b_id, a_id FROM lshpairs),
          |reach(a, b) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
          |comp AS (SELECT a AS doc_id, min(b) AS cluster_id
          |         FROM reach GROUP BY a),
          |exk AS (SELECT doc_id,
          |          min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
          |        FROM documents),
          |wq AS (SELECT doc_id,
          |         list_filter(string_split(text, ' '), x -> x <> '') AS w
          |       FROM documents),
          |g AS (SELECT doc_id FROM wq WHERE len(w) >= 1
          |        AND (len(w) BETWEEN $GopherMinWords AND $GopherMaxWords)
          |        AND list_sum(list_transform(w, x -> length(x))) * 1.0
          |            / len(w) >= $GopherMinMeanLen
          |        AND list_sum(list_transform(w, x -> length(x))) * 1.0
          |            / len(w) <= $GopherMaxMeanLen
          |        AND len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
          |            * 1.0 / len(w) >= $GopherMinAlphaFrac
          |        AND len(list_filter(w, x -> x IN ($stopListSql)))
          |            >= $GopherMinStopHits),
          |verdicts AS (SELECT d.doc_id, d.source,
          |  CASE WHEN e.keeper <> d.doc_id THEN 'exact_dup'
          |       WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id
          |         THEN 'near_dup'
          |       WHEN d.doc_id NOT IN (SELECT doc_id FROM g) THEN 'quality'
          |       ELSE 'kept' END AS verdict
          |  FROM documents d
          |  JOIN exk e ON e.doc_id = d.doc_id
          |  LEFT JOIN comp c ON c.doc_id = d.doc_id),
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
          |sp AS (SELECT doc_id,
          |  CASE WHEN ('0x' || substr(sha256('split|' || doc_id), 1, 8))::BIGINT
          |         % 100 < 80 THEN 'train'
          |       WHEN ('0x' || substr(sha256('split|' || doc_id), 1, 8))::BIGINT
          |         % 100 < 90 THEN 'val'
          |       ELSE 'test' END AS split
          |  FROM documents),
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
          |            GROUP BY 1)
          |SELECT b.source, b.n_docs, b.n_kept, b.n_exact_dup, b.n_near_dup,
          |  b.n_quality,
          |  coalesce(r.n_risk_docs, 0)::BIGINT AS n_risk_docs,
          |  coalesce(l.n_leak_docs, 0)::BIGINT AS n_leak_docs,
          |  coalesce(c.n_contam_docs, 0)::BIGINT AS n_contam_docs,
          |  coalesce(x.n_xcontam_docs, 0)::BIGINT AS n_xcontam_docs,
          |  (coalesce(r.n_risk_docs, 0) = 0 AND coalesce(l.n_leak_docs, 0) = 0
          |    AND coalesce(c.n_contam_docs, 0) = 0
          |    AND coalesce(x.n_xcontam_docs, 0) = 0) AS releasable
          |FROM byv b
          |LEFT JOIN risk r USING (source)
          |LEFT JOIN leak l USING (source)
          |LEFT JOIN contam c USING (source)
          |LEFT JOIN xcontam x USING (source)""".stripMargin))
  }
}
