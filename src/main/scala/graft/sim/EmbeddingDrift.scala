package graft.sim

import graft.Tables
import graft.sim.SimilarityQueries.{dot, sqlDot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space drift monitor — the vector-side sibling of the text
  * `source_drift` pass: between two snapshots, did a label's embedding
  * DISTRIBUTION move (new encoder version, upstream content shift,
  * collapsed region)? Statistics per label: the cosine between the two
  * snapshots' centroids (1.0 = no directional drift) and each
  * snapshot's mean vector norm (scale drift — e.g. an un-normalized
  * batch sneaking in). Snapshots are the deterministic halves
  * `vec_id % 2` (the same stand-in discipline `source_drift` and the
  * decontamination operators use); a real `snapshot` column is a
  * one-line input change.
  *
  * Exactness across engines is the interesting part: a distributed
  * float SUM is order-dependent (IEEE addition is not associative), so
  * a naive centroid would hash-mismatch any oracle. The centroid sums
  * therefore run in FIXED-POINT: each coordinate is scaled to
  * `round(x · 2²⁴)` (exact — a float has 24 significand bits, and the
  * product is correctly rounded identically in both engines) and summed
  * as integers, which IS associative; cosine is computed from the
  * integer sum vectors at the end (scale-invariant, so the 2²⁴ factor
  * cancels), and mean norms divide integer sums once at the output.
  * The same trick `pagerank_knn` uses to keep a float fixed-point
  * iteration hash-exact. At gate scale the sums stay far below 2⁶³
  * (coordinate sums ≤ n·2²⁴); a 100 TB run lifts them to decimal(38,0)
  * exactly as `source_drift` documents for its cross-products.
  *
  * Scale shape: one posexplode → (label, half, dim) integer partials
  * (map-side combined, bounded by labels × 2 × dim per partition —
  * dimension-bounded, not corpus-bounded), one labels×2-row array
  * rebuild, one per-label join. No corpus-sized state anywhere.
  */
object EmbeddingDrift {

  /** Fixed-point scale: 2²⁴ — one unit per float significand step at
    * |x| < 1 (embeddings are ~L2-normalized). */
  val Q = 1L << 24

  /** The per-vector fixed-point projections — single definitions shared
    * with the streaming twin ([[graft.streaming.StreamDrift]]) so the
    * two surfaces cannot drift on quantization. */
  def qCol(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(d, x => round(x * Q, 0).cast("long"))
  def nqCol(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sqrt(dot(d, d)) * Q, 0).cast("long")

  def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "embeddings")
      .withColumn("h", (col("vec_id") % 2).cast("int"))
      .withColumn("d", transform(col("embedding"), x => x.cast("double")))
      .withColumn("q", qCol(col("d")))
      .withColumn("nq", nqCol(col("d")))

    val sums = e.select(col("label"), col("h"),
        posexplode(col("q")).as(Seq("dim", "qv")))
      .groupBy("label", "h", "dim")
      .agg(sum("qv").as("sq"))
    val cent = sums.groupBy("label", "h")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("sq")))),
        x => x.getField("sq").cast("double")).as("c"))
    val stats = e.groupBy("label", "h")
      .agg(count(lit(1)).as("n"), sum("nq").as("snq"))

    // label×2 rows, read by BOTH halves — materialize once so the
    // centroid and stats aggregations run one corpus pass each, not two
    val side = cent.join(stats, Seq("label", "h")).localCheckpoint(true)
    def half(i: Int) = side.filter(col("h") === i)
      .select(col("label"), col("c").as(s"c$i"), col("n").as(s"n$i"),
        col("snq").as(s"s$i"))
    half(0).join(half(1), "label")
      .select(col("label"), col("n0"), col("n1"),
        round(dot(col("c0"), col("c1")) /
          (sqrt(dot(col("c0"), col("c0"))) *
            sqrt(dot(col("c1"), col("c1")))), 4).as("centroid_cos"),
        round(col("s0").cast("double") / (col("n0") * Q).cast("double"), 4)
          .as("mean_norm_0"),
        round(col("s1").cast("double") / (col("n1") * Q).cast("double"), 4)
          .as("mean_norm_1"))
  }

  /** Mirror-cluster threshold: two labels whose centroids agree above
    * this cosine are flagged as semantic mirrors. */
  val MirrorCos = 0.98

  /** Pairwise centroid-cosine matrix over labels — the semantic
    * MIRROR detector: two labels whose mean embeddings nearly coincide
    * are the same content under different tags (a mirrored crawl, a
    * re-ingested dump, a duplicated shard), which per-label dedup can
    * never see. Same fixed-point discipline as [[embeddingDrift]]:
    * integer centroid sums (associative, hash-exact), cosine only at
    * the output. Scale: partials bounded by labels × dim per
    * partition; the pair stage is a labels² self-join over L rows —
    * corpus-independent both ways. */
  def labelCentroidSim(s: SparkSession, dir: String): DataFrame =
    centroidSimOver(Tables.parallel(s, dir, "embeddings"))

  /** The matrix core over any `(label, embedding)` relation — factored
    * out so the mirror branch (absent from the gate corpus, whose 10
    * labels are genuinely distinct clusters: max pair cosine 0.34) is
    * exercised by a planted-mirror spec. */
  def centroidSimOver(emb: DataFrame): DataFrame = {
    val e = emb
      .withColumn("d", transform(col("embedding"), x => x.cast("double")))
      .withColumn("q", qCol(col("d")))
    val cent = e.select(col("label"),
        posexplode(col("q")).as(Seq("dim", "qv")))
      .groupBy("label", "dim")
      .agg(sum("qv").as("sq"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("sq")))),
        x => x.getField("sq").cast("double")).as("c"))
      .join(e.groupBy("label").agg(count(lit(1)).as("n")), "label")
      // label-bounded, read by both matrix sides — one build
      .localCheckpoint(true)
    def side(p: String) = cent.select(col("label").as(s"label_$p"),
      col("c").as(s"c_$p"), col("n").as(s"n_$p"))
    side("a").join(broadcast(side("b")),
        col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(dot(col("c_a"), col("c_b")) /
          (sqrt(dot(col("c_a"), col("c_a"))) *
            sqrt(dot(col("c_b"), col("c_b")))), 4).as("centroid_cos"))
      .withColumn("is_mirror", col("centroid_cos") >= MirrorCos)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_drift" -> embeddingDrift,
    "label_centroid_sim" -> labelCentroidSim)

  val oracles: Map[String, String] = Map(
    "label_centroid_sim" ->
      s"""WITH e AS (
        |  SELECT label,
        |    list_transform(embedding, x -> x::DOUBLE) AS d
        |  FROM embeddings),
        |qv AS (SELECT label,
        |    list_transform(d, x -> round(x * ${Q}.0)::BIGINT) AS q
        |  FROM e),
        |d1 AS (SELECT label, unnest(list_transform(
        |    range(1, len(q) + 1), i -> {'dim': i, 'v': q[i]})) AS u
        |  FROM qv),
        |sums AS (SELECT label, u.dim AS dim, sum(u.v)::BIGINT AS sq
        |  FROM d1 GROUP BY 1, 2),
        |cent AS (SELECT label, list(sq::DOUBLE ORDER BY dim) AS c
        |  FROM sums GROUP BY 1),
        |ns AS (SELECT label, count(*)::BIGINT AS n FROM qv GROUP BY 1),
        |side AS (SELECT cent.label, c, n
        |  FROM cent JOIN ns ON cent.label = ns.label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  a.n AS n_a, b.n AS n_b,
        |  round((${sqlDot("a.c", "b.c")}) /
        |    (sqrt(${sqlDot("a.c", "a.c")}) * sqrt(${sqlDot("b.c", "b.c")})),
        |    4) AS centroid_cos,
        |  round((${sqlDot("a.c", "b.c")}) /
        |    (sqrt(${sqlDot("a.c", "a.c")}) * sqrt(${sqlDot("b.c", "b.c")})),
        |    4) >= $MirrorCos AS is_mirror
        |FROM side a JOIN side b ON a.label < b.label""".stripMargin,
    "embedding_drift" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, (vec_id % 2)::INT AS h,
        |    list_transform(embedding, x -> x::DOUBLE) AS d
        |  FROM embeddings),
        |qv AS (SELECT label, h,
        |    list_transform(d, x -> round(x * ${Q}.0)::BIGINT) AS q,
        |    round(sqrt(${sqlDot("d", "d")}) * ${Q}.0)::BIGINT AS nq
        |  FROM e),
        |d1 AS (SELECT label, h, unnest(list_transform(
        |    range(1, len(q) + 1), i -> {'dim': i, 'v': q[i]})) AS u
        |  FROM qv),
        |sums AS (SELECT label, h, u.dim AS dim, sum(u.v)::BIGINT AS sq
        |  FROM d1 GROUP BY 1, 2, 3),
        |cent AS (SELECT label, h, list(sq::DOUBLE ORDER BY dim) AS c
        |  FROM sums GROUP BY 1, 2),
        |stats AS (SELECT label, h, count(*) AS n, sum(nq)::BIGINT AS snq
        |  FROM qv GROUP BY 1, 2),
        |side AS (SELECT cent.label, cent.h, c, n, snq
        |  FROM cent JOIN stats ON cent.label = stats.label
        |    AND cent.h = stats.h),
        |j AS (SELECT a.label, a.c AS c0, b.c AS c1, a.n AS n0, b.n AS n1,
        |    a.snq AS s0, b.snq AS s1
        |  FROM side a JOIN side b ON a.label = b.label
        |  WHERE a.h = 0 AND b.h = 1)
        |SELECT label, n0, n1,
        |  round((${sqlDot("c0", "c1")}) /
        |    (sqrt(${sqlDot("c0", "c0")}) * sqrt(${sqlDot("c1", "c1")})), 4)
        |    AS centroid_cos,
        |  round(s0::DOUBLE / (n0 * $Q)::DOUBLE, 4) AS mean_norm_0,
        |  round(s1::DOUBLE / (n1 * $Q)::DOUBLE, 4) AS mean_norm_1
        |FROM j""".stripMargin)
}
