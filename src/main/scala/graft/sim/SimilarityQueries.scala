package graft.sim

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  *
  *  - exact brute-force cosine top-k against a query vector (the correctness
  *    baseline; a broadcast of the query + one scan, no shuffle),
  *  - random-hyperplane LSH bucketing (8 sha256-derived hyperplanes → 8-bit
  *    sign bucket): the sub-linear candidate path at scale — bucket
  *    histogram + within-bucket re-rank queries.
  *
  * All dot products are summed left-to-right in double precision with
  * float→double promotion per element, exactly as the DuckDB oracle's
  * `list_sum(list_transform(...))` computes them, so scores match
  * bit-for-bit before rounding.
  */
object SimilarityQueries {

  val NumPlanes = 8

  /** Left-to-right double dot product of two array columns — the custom
    * codegen expression [[graft.functions.ArrayDot]] (bit-identical to the
    * HOF `aggregate` composition it replaced, but fused into whole-stage
    * codegen with no per-row sequence allocation). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ArrayDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplane coefficient — same value as
    * DuckDB `(('0x'||substr(sha256(j||'_'||i),1,8))::BIGINT % 2001 - 1000)
    * / 1000.0`. */
  def planeCoef(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${j}_$i".getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % 2001 - 1000) / 1000.0
  }

  /** 8-bit LSH sign bucket of an embedding column (dimension `dim`). */
  def lshBucket(emb: Column, dim: Int): Column =
    lshBucket(emb, dim, NumPlanes)

  /** `planes`-bit LSH sign bucket — the occupancy dial's general form:
    * each extra hyperplane halves expected bucket occupancy. */
  def lshBucket(emb: Column, dim: Int, planes: Int): Column = {
    val chars = (0 until planes).map { j =>
      val plane = array((1 to dim).map(i => lit(planeCoef(j, i))): _*)
      when(dot(emb, plane) >= 0, "1").otherwise("0")
    }
    concat(chars: _*)
  }

  /** Target expected bucket occupancy the production dial pins. With
    * occupancy held at T, the kNN self-join's pair work Σ n_b² ≈
    * (N/T)·T² = N·T stays LINEAR in corpus size. */
  val KnnTargetOccupancy = 8L

  /** The occupancy dial: hyperplane count for an N-vector corpus so that
    * expected uniform occupancy N/2^P ≤ `targetOccupancy` — P grows by
    * one per corpus doubling (never below the fixture's [[NumPlanes]],
    * capped at 30 where the bucket id saturates any realistic corpus).
    * Production binding: `knnGraphLsh(s, dir, planesFor(corpusSize))`;
    * the gate binds the fixture constant [[NumPlanes]]. Measured
    * occupancy at 1×/10×/30× with the dial applied: `OccupancyProbe`
    * (results in SCALE_VALIDATION.md). */
  def planesFor(n: Long, targetOccupancy: Long = KnnTargetOccupancy): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    math.min(30, math.max(NumPlanes, needed))
  }

  private[graft] val Dim = 64

  /** Exact cosine top-10 neighbors of vec_id 0 (broadcast query, one scan).
    * The query norm is computed once on the broadcast side, not per row. */
  def annCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos",
        dot(col("embedding"), col("qe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("qn")))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("label"), round(col("cos"), 4).as("cosine"))
  }

  /** Batch size and per-query depth for [[annBatchTopk]]. */
  val BatchQueries = 10L
  val BatchTopK = 3

  /** Batched brute-force ANN — the shape a serving/backfill job actually
    * runs: B query vectors broadcast against ONE corpus scan, cosine per
    * (query, candidate), and a per-query top-k via a rank window that
    * Spark compiles to partial+final WindowGroupLimit (bounded state per
    * query before the shuffle, never a full sort of B×N scored pairs).
    * Amortizes the scan across the batch — B queries cost one pass, not
    * B passes; the LSH/IVF variants bound the candidate set the same way
    * for single queries. */
  def annBatchTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < BatchQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    e.filter(col("vec_id") >= BatchQueries)
      .crossJoin(broadcast(q))
      .withColumn("cos",
        dot(col("embedding"), col("qe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("qn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= BatchTopK)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("label"), round(col("cos"), 4).as("cosine"))
  }

  /** LSH bucket histogram — the data layout a bucketed ANN index would
    * partition by at scale. */
  def annLshBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, dir, "embeddings")
      .select(col("vec_id"), lshBucket(col("embedding"), Dim).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"), min("vec_id").as("min_vec"))

  /** Shared LSH probe + re-rank: top-5 cosine neighbors of vec_id 0 among
    * vectors whose bucket is the query's bucket or one of its first
    * `nFlips` Hamming-1 neighbors. Both ANN query paths are this shape —
    * single-probe is the zero-flip case — so the re-rank contract
    * (cosine expression, tie-break, rounding, output columns) that must
    * stay bit-identical to the oracles lives in exactly one place. */
  private def lshProbeTopk(s: SparkSession, dir: String, nFlips: Int): DataFrame = {
    val e = Tables.parallel(s, dir, "embeddings")
      .withColumn("bucket", lshBucket(col("embedding"), Dim))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val probeCols =
      col("qbucket") +: (0 until nFlips).map(j => flipAt(col("qbucket"), j))
    val probes = q.select(col("qe"), col("qn"),
      explode(array(probeCols: _*)).as("probe"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), col("bucket") === col("probe"))
      .withColumn("cos",
        dot(col("embedding"), col("qe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) * col("qn")))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(5)
      .select(col("vec_id"), col("label"), col("bucket"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Within-bucket re-rank: top-5 cosine neighbors of vec_id 0 among the
    * vectors sharing its LSH bucket (the sub-linear ANN query path). */
  def annLshTopk(s: SparkSession, dir: String): DataFrame =
    lshProbeTopk(s, dir, nFlips = 0)

  /** Flip bit `j` (0-based) of a `planes`-char "0101…" bucket string. */
  private def flipAt(b: Column, j: Int, planes: Int = NumPlanes): Column =
    concat(substring(b, 1, j),
      when(substring(b, j + 1, 1) === "1", "0").otherwise("1"),
      substring(b, j + 2, planes - j - 1))

  /** Multi-probe LSH top-k: probe the query's bucket plus every bucket at
    * Hamming distance 1 (9 probes for 8 planes) — the standard
    * recall/latency dial for sign-LSH: ~9/256 of the corpus scanned
    * instead of 1/256, recovering neighbors that fall just across one
    * hyperplane. The probe set joins the bucketed corpus as a broadcast
    * equi-join, so the plan stays index-shaped (no full-corpus Hamming
    * scan). */
  def annLshMultiprobe(s: SparkSession, dir: String): DataFrame =
    lshProbeTopk(s, dir, nFlips = NumPlanes)

  /** Embedding-cosine near-duplicate pairs: LSH bucket self-join bounds the
    * candidate set (same 8-bit sign bucket), exact cosine >= 0.4 verifies —
    * the embedding-space analog of MinHash+verify for text. */
  def dedupEmbeddingCosine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.parallel(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), Dim).as("bucket"))
    e.as("a").join(e.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Top neighbors kept per vector in the kNN graph. */
  val KnnK = 5

  /** Corpus×corpus kNN GRAPH over the LSH buckets — the all-vectors
    * neighbor structure that graph clustering, kNN-propagated quality
    * labels, and SemDeDup-style analyses consume. Unlike the `ann_*`
    * queries (a broadcast QUERY side against the corpus), this is a
    * bucket equi-SELF-join: every vector probes only its own sign
    * bucket, so pair work is Σ n_b² over bucket sizes — bounded by the
    * bucket histogram (`ann_lsh_buckets`), never N². Per-vector top-k
    * ranks inside the window (partial+final WindowGroupLimit), ties
    * broken by neighbor id; vectors alone in their bucket emit no rows
    * (the honest LSH recall regime — widen with Hamming-probe buckets
    * exactly as `ann_lsh_multiprobe` does for queries). */
  def knnGraphLsh(s: SparkSession, dir: String): DataFrame =
    knnGraphLsh(s, dir, NumPlanes)

  /** One-slot MATERIALIZED memo of the default-plane directed graph —
    * for internal consumers that each need the whole relation: the
    * mutual-edge builder (GraphStats — every structure/centrality gate)
    * and PageRank's directed walk both read it; without the memo each
    * rebuilt the bucket self-join from the scan (the r8 bench showed
    * pagerank_knn paying a second kNN build). The `knn_graph_lsh` GATE
    * itself keeps calling the raw form so its plan lock pins the real
    * build, not a checkpoint scan. Same bounded-eviction policy as the
    * other artifact memos. */
  def knnGraphLshShared(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val key = (s, dir, graft.Tables.sourceStamp(dir, "embeddings"))
      knnLshMemo match {
        case Some((k, v)) if k == key => v
        case _ =>
          val v = knnGraphLsh(s, dir, NumPlanes).localCheckpoint(true)
          knnLshMemo = Some((key, v))
          v
      }
    }

  private var knnLshMemo:
    Option[((SparkSession, String, Long), DataFrame)] = None

  /** Drop the memoized default-plane graph (tests; corpus switches). */
  def releaseKnnLsh(): Unit = synchronized { knnLshMemo = None }

  /** Dialed form: production binds `planes = planesFor(corpusSize)` so
    * bucket occupancy — and with it the in-join Σ n_b² pair work — stays
    * pinned as the corpus grows; the gate binds the fixture constant. */
  def knnGraphLsh(s: SparkSession, dir: String, planes: Int): DataFrame =
    knnGraph(s, dir, planes, multiprobe = false)

  /** Recall-widened kNN graph: each vector's candidate set is its own
    * bucket PLUS every bucket at Hamming distance 1 (the probe dial from
    * [[annLshMultiprobe]], applied to the whole graph build) — recovers
    * neighbors that fall just across one hyperplane, the main recall
    * loss of sign-LSH bucketing. Candidate work grows by ×(planes+1)
    * per vector, still Σ n_b²-bounded per probe; per-vector top-K
    * cosine lists dominate the single-probe graph's element-wise
    * (candidate superset — spec'd). */
  def knnGraphMultiprobe(s: SparkSession, dir: String): DataFrame =
    knnGraph(s, dir, NumPlanes, multiprobe = true)

  private def knnGraph(s: SparkSession, dir: String, planes: Int,
                       multiprobe: Boolean): DataFrame = {
    val e = Tables.parallel(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"),
        lshBucket(col("embedding"), Dim, planes).as("bucket"))
    // probe relation: the vector's bucket, plus its Hamming-1 buckets
    // when multiprobing (probes are distinct, so no pair matches twice)
    val a =
      if (!multiprobe) e.select(col("vec_id"), col("embedding"),
        col("nrm"), col("bucket").as("probe"))
      else e.select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array(col("bucket") +:
          (0 until planes).map(j => flipAt(col("bucket"), j, planes)): _*))
          .as("probe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    a.as("a").join(e.as("b"),
        col("a.probe") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KnnK)
      .select(col("a_id"), col("rk").cast("long").as("rk"),
        col("b_id"), round(col("cos"), 4).as("cosine"))
  }

  /** Int8 scalar quantization round-trip — the 4× compression step an
    * embedding store applies before indexing at scale. Per vector:
    * min/max range, codes `q_i = round((x_i - mn) / scale)` with
    * `scale = (mx - mn)/255`, reconstruction MSE, and an exact integer
    * checksum of the codes (`sum q_i * i`) so the oracle proves the CODES
    * are bit-identical, not just the rounded stats. All arithmetic is
    * correctly-rounded IEEE ops in the same order as the oracle's
    * `list_transform`/`list_reduce` (fold seed 0.0 + left-to-right), so
    * every double matches bit-for-bit before the output rounding. */
  def embedQuantize(s: SparkSession, dir: String): DataFrame = {
    def recon(i: Column): Column =
      col("mn") + element_at(col("q"), i) * col("scale")
    def diff(i: Column): Column = element_at(col("d"), i) - recon(i)
    Tables.parallel(s, dir, "embeddings")
      .withColumn("d", transform(col("embedding"), x => x.cast("double")))
      .withColumn("mn", array_min(col("d")))
      .withColumn("mx", array_max(col("d")))
      .withColumn("scale", (col("mx") - col("mn")) / 255.0)
      .withColumn("q",
        when(col("scale") === 0.0, transform(col("d"), _ => lit(0.0)))
          .otherwise(transform(col("d"),
            x => round((x - col("mn")) / col("scale"), 0))))
      .withColumn("q_checksum",
        aggregate(sequence(lit(1), size(col("q"))), lit(0L),
          (acc, i) => acc + element_at(col("q"), i).cast("long") * i))
      .withColumn("sq_sum",
        aggregate(sequence(lit(1), size(col("d"))), lit(0.0),
          (acc, i) => acc + diff(i) * diff(i)))
      .select(col("vec_id"),
        round(col("mn"), 6).as("mn"), round(col("mx"), 6).as("mx"),
        col("q_checksum"),
        round(col("sq_sum") / size(col("d")), 8).as("mse"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> annCosineTopk,
    "ann_batch_topk" -> annBatchTopk,
    "ann_lsh_buckets" -> annLshBuckets,
    "ann_lsh_topk" -> annLshTopk,
    "ann_lsh_multiprobe" -> annLshMultiprobe,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine,
    "knn_graph_lsh" -> knnGraphLsh,
    "knn_graph_multiprobe" -> knnGraphMultiprobe,
    "embed_quantize" -> embedQuantize)

  // ------------------------------------------------------------- oracles
  private[graft] def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, $Dim + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  private def sqlPlaneDot(emb: String, j: Int): String =
    s"list_sum(list_transform(range(1, $Dim + 1), i -> $emb[i]::DOUBLE * " +
      s"((('0x' || substr(sha256('${j}_' || i), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)))"

  private[sim] def sqlBucket(emb: String): String =
    (0 until NumPlanes).map(j =>
      s"(CASE WHEN ${sqlPlaneDot(emb, j)} >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")

  /** Oracle twin of [[lshProbeTopk]] — one generator for both the
    * single-probe (0 flips) and multi-probe cases, mirroring the shared
    * Spark helper so the re-rank contract can't drift one-sided. */
  private def lshProbeTopkSql(nFlips: Int): String = {
    val flips = (0 until nFlips).map(j =>
      s"substr(qb, 1, $j) || (CASE WHEN substr(qb, ${j + 1}, 1) = '1' " +
        s"THEN '0' ELSE '1' END) || substr(qb, ${j + 2}, ${NumPlanes - j - 1})")
    val probeList = ("qb" +: flips).mkString(",\n    ")
    s"""WITH b AS (SELECT vec_id, label, embedding,
      |    ${sqlBucket("embedding")} AS bucket FROM embeddings),
      |q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0),
      |probes AS (SELECT unnest([$probeList]) AS probe FROM q),
      |d AS (SELECT vec_id, label, bucket,
      |    ${sqlDot("embedding", "qe")} AS dp,
      |    ${sqlDot("embedding", "embedding")} AS na,
      |    ${sqlDot("qe", "qe")} AS nq
      |  FROM b, q
      |  WHERE vec_id <> 0 AND bucket IN (SELECT probe FROM probes))
      |SELECT vec_id, label, bucket,
      |  round(dp / (sqrt(na) * sqrt(nq)), 4) AS cosine
      |FROM d ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC
      |LIMIT 5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "embed_quantize" ->
      s"""WITH d AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS d FROM embeddings),
        |m AS (SELECT vec_id, d, list_min(d) AS mn, list_max(d) AS mx,
        |        (list_max(d) - list_min(d)) / 255.0 AS scale
        |      FROM d),
        |q AS (SELECT vec_id, d, mn, mx, scale,
        |        CASE WHEN scale = 0 THEN list_transform(d, x -> 0.0)
        |             ELSE list_transform(d, x -> round((x - mn) / scale))
        |        END AS q
        |      FROM m)
        |SELECT vec_id, round(mn, 6) AS mn, round(mx, 6) AS mx,
        |  list_sum(list_transform(range(1, len(q) + 1),
        |    i -> q[i]::BIGINT * i))::BIGINT AS q_checksum,
        |  round(list_reduce(list_transform(range(1, len(d) + 1),
        |    i -> (d[i] - (mn + q[i] * scale)) * (d[i] - (mn + q[i] * scale))),
        |    (a, b) -> a + b) / len(d), 8) AS mse
        |FROM q""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |    ${sqlBucket("embedding")} AS bucket FROM embeddings),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    ${sqlDot("a.embedding", "b.embedding")} AS dp,
        |    ${sqlDot("a.embedding", "a.embedding")} AS na,
        |    ${sqlDot("b.embedding", "b.embedding")} AS nb
        |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT a_id, b_id, round(dp / (sqrt(na) * sqrt(nb)), 4) AS cosine
        |FROM p WHERE dp / (sqrt(na) * sqrt(nb)) >= 0.4""".stripMargin,
    "knn_graph_multiprobe" -> {
      val flips = (0 until NumPlanes).map(j =>
        s"substr(bucket, 1, $j) || (CASE WHEN substr(bucket, ${j + 1}, 1) = '1' " +
          s"THEN '0' ELSE '1' END) || substr(bucket, ${j + 2}, ${NumPlanes - j - 1})")
      val probeList = ("bucket" +: flips).mkString(",\n    ")
      s"""WITH b AS (SELECT vec_id, embedding,
        |    ${sqlBucket("embedding")} AS bucket FROM embeddings),
        |pr AS (SELECT vec_id, embedding, unnest([
        |    $probeList]) AS probe FROM b),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    ${sqlDot("a.embedding", "b.embedding")} AS dp,
        |    ${sqlDot("a.embedding", "a.embedding")} AS na,
        |    ${sqlDot("b.embedding", "b.embedding")} AS nb
        |  FROM pr a JOIN b b ON a.probe = b.bucket AND a.vec_id <> b.vec_id),
        |r AS (SELECT a_id, b_id, dp / (sqrt(na) * sqrt(nb)) AS cos,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY dp / (sqrt(na) * sqrt(nb)) DESC, b_id ASC) AS rk
        |  FROM p)
        |SELECT a_id, rk::BIGINT AS rk, b_id, round(cos, 4) AS cosine
        |FROM r WHERE rk <= $KnnK""".stripMargin
    },
    "knn_graph_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
        |    ${sqlBucket("embedding")} AS bucket FROM embeddings),
        |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    ${sqlDot("a.embedding", "b.embedding")} AS dp,
        |    ${sqlDot("a.embedding", "a.embedding")} AS na,
        |    ${sqlDot("b.embedding", "b.embedding")} AS nb
        |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        |r AS (SELECT a_id, b_id, dp / (sqrt(na) * sqrt(nb)) AS cos,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY dp / (sqrt(na) * sqrt(nb)) DESC, b_id ASC) AS rk
        |  FROM p)
        |SELECT a_id, rk::BIGINT AS rk, b_id, round(cos, 4) AS cosine
        |FROM r WHERE rk <= $KnnK""".stripMargin,
    "ann_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT vec_id, label,
        |  ${sqlDot("embedding", "qe")} AS dp,
        |  ${sqlDot("embedding", "embedding")} AS na,
        |  ${sqlDot("qe", "qe")} AS nq
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id, label,
        |  round(dp / (sqrt(na) * sqrt(nq)), 4) AS cosine
        |FROM d ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC
        |LIMIT 10""".stripMargin,
    "ann_batch_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
        |           WHERE vec_id < $BatchQueries),
        |d AS (SELECT q.q_id, e.vec_id, e.label,
        |  ${sqlDot("e.embedding", "qe")} AS dp,
        |  ${sqlDot("e.embedding", "e.embedding")} AS na,
        |  ${sqlDot("qe", "qe")} AS nq
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id >= $BatchQueries)
        |SELECT q_id, rk, vec_id, label,
        |  round(dp / (sqrt(na) * sqrt(nq)), 4) AS cosine
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY q_id
        |        ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC) AS rk
        |      FROM d)
        |WHERE rk <= $BatchTopK""".stripMargin,
    "ann_lsh_buckets" ->
      s"""SELECT ${sqlBucket("embedding")} AS bucket,
        |  count(*) AS n_vectors, min(vec_id) AS min_vec
        |FROM embeddings GROUP BY 1""".stripMargin,
    "ann_lsh_multiprobe" -> lshProbeTopkSql(NumPlanes),
    "ann_lsh_topk" -> lshProbeTopkSql(0))
}
