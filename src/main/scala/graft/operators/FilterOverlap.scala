package graft.operators

import graft.Tables
import graft.dedup.{ConnectedComponents, DedupQueries}
import graft.text.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filter-overlap matrix — the redundancy audit of the preprocessing
  * pipeline itself: for every pair of removal filters, how many
  * documents BOTH would remove, and the Jaccard of their removal sets.
  * High overlap means a filter is mostly re-flagging what another
  * already catches (candidate to drop or reorder for cost); zero
  * overlap means the filters carry independent signal. The
  * [[Pipeline.datasetCard]] discipline applied to the pipeline instead
  * of the corpus: every axis reuses the exact operator its standalone
  * gate proves — [[ConnectedComponents.removalTiers]] for both dedup
  * tiers, [[TextQueries.gopherFlags]] for the rule set,
  * [[DedupQueries.decontaminate]]'s corpus side — so the matrix cannot
  * drift from its parts. (The PII scanner is deliberately absent: it
  * is structurally zero on this corpus — a degenerate axis — and has
  * its own fixture-backed gate.)
  *
  * The axis dimension comes from a literal VALUES relation, so a
  * filter that removes nothing still appears with n = 0 instead of
  * silently vanishing from the matrix.
  *
  * Scale shape at 100 TB: the flag relation is output-sized (flagged
  * docs × 4 filters); the pair join is doc-keyed with ≤ C(4,2) rows
  * out per doc; the matrix itself is filters²-bounded. All heavy
  * lifting happens inside the reused component relations, each already
  * scale-adjudicated under its own family law. */
object FilterOverlap {

  val FilterNames = Seq("exact_dup", "near_dup", "gopher_fail",
    "contaminated")

  def filterOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select("doc_id")
    val (ex, near) = ConnectedComponents.removalTiers(s, dir)
    val qpass = TextQueries.gopherFlags(Tables(s, dir, "documents"))
      .filter(col("pass")).select("doc_id")
    val qfail = docs.join(qpass, Seq("doc_id"), "left_anti")
    val contam = DedupQueries.decontaminate(s, dir)
      .select("doc_id").distinct()
    val f = Seq(
      ("exact_dup", ex.select("doc_id")),
      ("near_dup", near.select("doc_id")),
      ("gopher_fail", qfail),
      ("contaminated", contam))
      .map { case (n, d) => d.select(col("doc_id"), lit(n).as("f")) }
      .reduce(_ unionByName _)
      .distinct()
      .localCheckpoint(true) // output-sized; read by singles + both sides
    val singles = f.groupBy("f").agg(count(lit(1)).as("n"))
    val both = f.as("a").join(f.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.f") < col("b.f"))
      .groupBy(col("a.f").as("f_a"), col("b.f").as("f_b"))
      .agg(count(lit(1)).as("n_both"))
    import s.implicits._
    val names = FilterNames.toDF("name")
    names.as("x").join(names.as("y"), col("x.name") < col("y.name"))
      .select(col("x.name").as("f_a"), col("y.name").as("f_b"))
      .join(broadcast(singles.withColumnRenamed("f", "f_a")
        .withColumnRenamed("n", "n_a")), Seq("f_a"), "left")
      .join(broadcast(singles.withColumnRenamed("f", "f_b")
        .withColumnRenamed("n", "n_b")), Seq("f_b"), "left")
      .join(broadcast(both), Seq("f_a", "f_b"), "left")
      .select(col("f_a"), col("f_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"))
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_both") > 0,
          round(col("n_both") /
            (col("n_a") + col("n_b") - col("n_both")), 4))
          .otherwise(lit(0.0)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_overlap" -> filterOverlap)

  val oracles: Map[String, String] = {
    import TextQueries._
    Map(
      "filter_overlap" ->
        (s"WITH RECURSIVE ${DedupQueries.lshPairsCte},\n" +
          s"""edges AS (SELECT a_id AS src, b_id AS dst FROM lshpairs
            |          UNION SELECT b_id, a_id FROM lshpairs),
            |reach(a, b) AS (
            |  SELECT src, src FROM edges
            |  UNION
            |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
            |comp AS (SELECT a AS doc_id, min(b) AS cluster_id
            |         FROM reach GROUP BY a),
            |ex AS (SELECT doc_id FROM (
            |         SELECT doc_id,
            |           min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
            |         FROM documents)
            |       WHERE doc_id <> keeper),
            |near AS (SELECT doc_id FROM comp
            |         WHERE doc_id <> cluster_id
            |           AND doc_id NOT IN (SELECT doc_id FROM ex)),
            |qc AS (SELECT doc_id, len(w) AS n_words,
            |         list_sum(list_transform(w, x -> length(x))) AS sum_len,
            |         len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
            |           AS n_alpha,
            |         len(list_filter(w, x -> x IN ($stopListSql))) AS n_stop
            |       FROM (SELECT doc_id,
            |               list_filter(string_split(text, ' '), x -> x <> '')
            |                 AS w
            |             FROM documents)
            |       WHERE len(w) >= 1),
            |qpass AS (SELECT doc_id FROM qc
            |        WHERE n_words BETWEEN $GopherMinWords AND $GopherMaxWords
            |          AND sum_len * 1.0 / n_words >= $GopherMinMeanLen
            |          AND sum_len * 1.0 / n_words <= $GopherMaxMeanLen
            |          AND n_alpha * 1.0 / n_words >= $GopherMinAlphaFrac
            |          AND n_stop >= $GopherMinStopHits),
            |qfail AS (SELECT doc_id FROM documents
            |          WHERE doc_id NOT IN (SELECT doc_id FROM qpass)),
            |contam AS (SELECT DISTINCT c.doc_id
            |  FROM sh c JOIN sh e ON c.s = e.s
            |  WHERE e.doc_id < ${DedupQueries.DecontamEvalDocs}
            |    AND c.doc_id >= ${DedupQueries.DecontamEvalDocs}
            |  GROUP BY c.doc_id, e.doc_id
            |  HAVING count(*) >= ${DedupQueries.DecontamMinOverlap}),
            |f AS (
            |  SELECT DISTINCT doc_id, f FROM (
            |    SELECT doc_id, 'exact_dup' AS f FROM ex
            |    UNION ALL SELECT doc_id, 'near_dup' FROM near
            |    UNION ALL SELECT doc_id, 'gopher_fail' FROM qfail
            |    UNION ALL SELECT doc_id, 'contaminated' FROM contam)),
            |singles AS (SELECT f, count(*)::BIGINT AS n FROM f GROUP BY f),
            |bothc AS (
            |  SELECT a.f AS f_a, b.f AS f_b, count(*)::BIGINT AS n_both
            |  FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.f < b.f
            |  GROUP BY 1, 2),
            |names AS (SELECT unnest(['exact_dup', 'near_dup',
            |  'gopher_fail', 'contaminated']) AS name)
            |SELECT x.name AS f_a, y.name AS f_b,
            |  coalesce(sa.n, 0)::BIGINT AS n_a,
            |  coalesce(sb.n, 0)::BIGINT AS n_b,
            |  coalesce(bc.n_both, 0)::BIGINT AS n_both,
            |  CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
            |            - coalesce(bc.n_both, 0) > 0
            |    THEN round(coalesce(bc.n_both, 0) * 1.0 /
            |      (coalesce(sa.n, 0) + coalesce(sb.n, 0)
            |        - coalesce(bc.n_both, 0)), 4)
            |    ELSE 0.0 END AS jaccard
            |FROM names x JOIN names y ON x.name < y.name
            |LEFT JOIN singles sa ON sa.f = x.name
            |LEFT JOIN singles sb ON sb.f = y.name
            |LEFT JOIN bothc bc ON bc.f_a = x.name AND bc.f_b = y.name"""
            .stripMargin))
  }
}
