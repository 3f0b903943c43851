package graft.sim

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings"; the
  * method behind CCMatrix/LASER-scale parallel-corpus extraction) — the
  * cross-lingual leg of the curation engine: given one multilingual
  * embedding space, find for each source-language document its best
  * translation candidate in every other language, scored by the RATIO
  * margin rather than raw cosine:
  *
  *   margin(x, y) = cos(x, y) / ((xPen(x) + yPen(y)) / 2)
  *
  * where `xPen(x)` is the mean cosine of x to its [[NnK]] nearest
  * candidates and `yPen(y)` the mean cosine of y to its [[NnK]] nearest
  * batch queries. Raw cosine over-mines hubs (vectors close to
  * everything); the margin normalizes by each side's local density so a
  * pair only scores high when the two are MUTUALLY exceptional — the
  * paper's key finding, and the reason every production mining stack
  * ships margins, not cosines. Pairs with `margin >= ` [[MarginThresh]]
  * are mined; the `mutual` flag marks the paper's strictest
  * ("intersection") variant — x is y's best match too.
  *
  * Mining runs BATCHED, the production shape: a bounded query batch
  * (every [[QMod]]-th source-language doc — at 100 TB, the unit of work
  * a mining job processes per task wave) against the full candidate
  * side. Both margin penalties are computed w.r.t. this batch/candidate
  * split, exactly what a batched miner observes.
  *
  * Scale shape: the batch is collected into ONE array row and broadcast
  * ([[Ivf]] / [[Pq]] model-crossJoin playbook), so the candidate scan is
  * a single zero-shuffle projection — each candidate row computes its
  * full cosine vector to the batch, takes its own top-[[NnK]] penalty
  * IN-ROW (sorted-slice fold, no shuffle), and explodes to pair rows
  * that already carry `y_pen`. The only shuffles are (a) the per-
  * (query, lang) top-k for `x_pen` — a `row_number` window that Spark
  * executes as partial+final WindowGroupLimit, so ≤ [[NnK]] rows per
  * (query, lang) per input partition cross the exchange (the q13
  * discipline), and (b) the same WindowGroupLimit shape for the
  * forward/backward argmax. Nothing corpus-sized is ever collected;
  * pair-relation cost is |batch| × |candidates| — the brute-mining
  * budget itself, which production bounds by ANN candidate pruning (the
  * [[Ivf]] bucket path) without changing any of this plumbing.
  *
  * Float discipline: both engines fold the top-k penalty over the SAME
  * descending-sorted list (Spark `sort_array` + sequential `aggregate`;
  * DuckDB `list_sort(..., 'DESC')` + `list_sum`), so the IEEE summation
  * order is identical and margins are bit-equal — ranks and the
  * threshold cut never straddle an ulp.
  */
object BitextMine {

  /** Mining source language: the pivot every multilingual corpus mines
    * from (CCMatrix mines against English first). */
  val SrcLang = "en"

  /** Query batch: every QMod-th source-language doc — bounded, the
    * batched-mining unit. */
  val QMod = 10

  /** Margin penalty depth (the paper uses k = 4). */
  val NnK = 4

  /** Ratio-margin mining threshold (paper operating range 1.04–1.2;
    * 1.15 keeps the fixture relation non-empty at every SF while
    * genuinely pruning the forward-best list). */
  val MarginThresh = 1.15

  /** `(doc_id, lang, embedding)` — documents joined 1:1 to their
    * embedding rows (`vec_id = doc_id`, the HybridRetrieval
    * convention). */
  private def docVecs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "documents").select(col("doc_id"), col("lang"))
      .join(Tables.parallel(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")

  /** Sequential left-to-right fold of the top-[[NnK]] of a cosine array
    * (descending sort, slice, sum) divided by k — the deterministic
    * penalty both engines share. */
  private def topkMean(cosArr: Column): Column =
    aggregate(slice(sort_array(cosArr, asc = false), 1, NnK),
      lit(0.0), (acc, x) => acc + x) / NnK

  /** Forward-best relation over any `(doc_id, lang, embedding)` input:
    * for every (batch query, candidate language) the argmax-margin
    * candidate, with cosine, margin and the mutual-best flag. Exposed
    * relation-first so specs can mine planted geometries. */
  def forwardBest(dv: DataFrame): DataFrame = {
    import SimilarityQueries.dot
    val withNorm = dv.withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val batch = withNorm.filter(col("lang") === SrcLang && col("doc_id") % QMod === 0)
      .agg(collect_list(struct(col("doc_id").as("src_id"),
        col("embedding").as("semb"), col("nrm").as("snrm"))).as("batch"))
    // candidate scan: cosines to the whole batch + own top-k penalty,
    // computed in-row — zero shuffle until the pair explode
    val cands = withNorm.filter(col("lang") =!= SrcLang)
      .crossJoin(broadcast(batch))
      .withColumn("cosb", transform(col("batch"), b =>
        dot(col("embedding"), b.getField("semb")) /
          (col("nrm") * b.getField("snrm"))))
      .withColumn("y_pen", topkMean(col("cosb")))
    val pairs = cands
      .select(col("doc_id").as("tgt_id"), col("lang").as("tgt_lang"),
        col("y_pen"), explode(arrays_zip(col("batch"), col("cosb"))).as("z"))
      .select(col("z.batch.src_id").as("src_id"), col("tgt_id"),
        col("tgt_lang"), col("z.cosb").as("cos"), col("y_pen"))
      // read twice (x-penalty aggregation + margin join) — materialize
      // once, nothing pinned after the action completes (house pattern)
      .localCheckpoint(true)
    // x-side penalty: top-k per (query, lang) — WindowGroupLimit keeps
    // the exchange at ≤ NnK rows per group per partition; the k survivors
    // are re-sorted into one list so the fold order matches the oracle
    val xw = Window.partitionBy(col("src_id"), col("tgt_lang"))
      .orderBy(col("cos").desc, col("tgt_id").asc)
    val xpen = pairs.withColumn("rk", row_number().over(xw))
      .filter(col("rk") <= NnK)
      .groupBy("src_id", "tgt_lang")
      .agg(topkMean(collect_list(col("cos"))).as("x_pen"))
    val margins = pairs.join(broadcast(xpen), Seq("src_id", "tgt_lang"))
      .withColumn("margin",
        col("cos") / ((col("x_pen") + col("y_pen")) / 2))
      // read twice (forward + backward argmax) — same discipline
      .localCheckpoint(true)
    val fw = Window.partitionBy(col("src_id"), col("tgt_lang"))
      .orderBy(col("margin").desc, col("tgt_id").asc)
    val bw = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin").desc, col("src_id").asc)
    val fwd = margins.withColumn("rk", row_number().over(fw))
      .filter(col("rk") === 1)
      .select(col("src_id"), col("tgt_lang"), col("tgt_id"),
        col("cos"), col("margin"))
    val bwd = margins.withColumn("rk", row_number().over(bw))
      .filter(col("rk") === 1)
      .select(col("tgt_id").as("b_tgt"), col("src_id").as("b_src"))
    fwd.join(broadcast(bwd),
        col("tgt_id") === col("b_tgt") && col("src_id") === col("b_src"),
        "left")
      .select(col("src_id"), col("tgt_lang"), col("tgt_id"),
        col("cos"), col("margin"), col("b_src").isNotNull.as("mutual"))
  }

  /** Gate: mined pairs — forward-best candidates above the margin
    * threshold, with the mutual (intersection-variant) flag. */
  def bitextMine(s: SparkSession, dir: String): DataFrame =
    forwardBest(docVecs(s, dir))
      .filter(col("margin") >= MarginThresh)
      .select(col("src_id"), col("tgt_lang"), col("tgt_id"),
        round(col("cos"), 4).as("cosine"),
        round(col("margin"), 4).as("margin"), col("mutual"))

  /** Gate: per-language mining calibration — the readout that decides
    * per-language thresholds in production (mining yield varies by
    * language distance; CCMatrix tunes thresholds per pair). Counts plus
    * order-free margin extremes over the forward-best relation. */
  def bitextLangStats(s: SparkSession, dir: String): DataFrame =
    forwardBest(docVecs(s, dir))
      .groupBy("tgt_lang")
      .agg(count(lit(1)).as("n_best"),
        sum(when(col("margin") >= MarginThresh, 1L).otherwise(0L))
          .as("n_mined"),
        sum(when(col("margin") >= MarginThresh && col("mutual"), 1L)
          .otherwise(0L)).as("n_mutual"),
        round(min(col("margin")), 4).as("min_margin"),
        round(max(col("margin")), 4).as("max_margin"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bitext_mine" -> bitextMine,
    "bitext_lang_stats" -> bitextLangStats)

  /** CTE chain ending in `fwd(src_id, tgt_lang, tgt_id, cos, margin,
    * mutual)` — the forward-best relation both oracles read. Penalty
    * folds mirror Spark's sorted-slice order exactly. */
  private def fwdCtes: String = {
    val dot = SimilarityQueries.sqlDot("s.embedding", "t.embedding")
    s"""dv AS (SELECT d.doc_id, d.lang, e.embedding
      |        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      |src AS (SELECT doc_id, embedding,
      |          sqrt(${SimilarityQueries.sqlDot("embedding", "embedding")}) AS nrm
      |        FROM dv WHERE lang = '$SrcLang' AND doc_id % $QMod = 0),
      |tgt AS (SELECT doc_id, lang, embedding,
      |          sqrt(${SimilarityQueries.sqlDot("embedding", "embedding")}) AS nrm
      |        FROM dv WHERE lang <> '$SrcLang'),
      |pairs AS (SELECT s.doc_id AS src_id, t.doc_id AS tgt_id,
      |            t.lang AS tgt_lang, $dot / (s.nrm * t.nrm) AS cos
      |          FROM src s JOIN tgt t ON true),
      |xpen AS (SELECT src_id, tgt_lang,
      |           list_sum(list_sort(list(cos), 'DESC')) / $NnK AS x_pen
      |         FROM (SELECT *, row_number() OVER (
      |                 PARTITION BY src_id, tgt_lang
      |                 ORDER BY cos DESC, tgt_id ASC) AS rk FROM pairs)
      |         WHERE rk <= $NnK GROUP BY 1, 2),
      |ypen AS (SELECT tgt_id,
      |           list_sum(list_slice(list_sort(list(cos), 'DESC'), 1, $NnK))
      |             / $NnK AS y_pen
      |         FROM pairs GROUP BY 1),
      |m AS (SELECT p.*, p.cos / ((x.x_pen + y.y_pen) / 2) AS margin
      |      FROM pairs p
      |      JOIN xpen x ON x.src_id = p.src_id AND x.tgt_lang = p.tgt_lang
      |      JOIN ypen y ON y.tgt_id = p.tgt_id),
      |fwd0 AS (SELECT * FROM (SELECT *, row_number() OVER (
      |           PARTITION BY src_id, tgt_lang
      |           ORDER BY margin DESC, tgt_id ASC) AS rk FROM m)
      |         WHERE rk = 1),
      |bwd AS (SELECT tgt_id, src_id FROM (SELECT *, row_number() OVER (
      |          PARTITION BY tgt_id
      |          ORDER BY margin DESC, src_id ASC) AS rk FROM m)
      |        WHERE rk = 1),
      |fwd AS (SELECT f.src_id, f.tgt_lang, f.tgt_id, f.cos, f.margin,
      |          (b.src_id IS NOT NULL) AS mutual
      |        FROM fwd0 f LEFT JOIN bwd b
      |          ON b.tgt_id = f.tgt_id AND b.src_id = f.src_id)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "bitext_mine" ->
      s"""WITH $fwdCtes
        |SELECT src_id, tgt_lang, tgt_id, round(cos, 4) AS cosine,
        |  round(margin, 4) AS margin, mutual
        |FROM fwd WHERE margin >= $MarginThresh""".stripMargin,
    "bitext_lang_stats" ->
      s"""WITH $fwdCtes
        |SELECT tgt_lang, count(*)::BIGINT AS n_best,
        |  count(*) FILTER (margin >= $MarginThresh)::BIGINT AS n_mined,
        |  count(*) FILTER (margin >= $MarginThresh AND mutual)::BIGINT
        |    AS n_mutual,
        |  round(min(margin), 4) AS min_margin,
        |  round(max(margin), 4) AS max_margin
        |FROM fwd GROUP BY 1""".stripMargin)
}
