package graft.functions

import graft.Tables
import graft.text.TextQueries.{hex32, trigrams, trigramsSql, words}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the cardinality-estimate
  * tier of the extension surface (Bar-Yossef et al. 2002; the same family
  * as DataSketches theta). Keep the k smallest DISTINCT values of a
  * uniform 32-bit hash; the k-th smallest estimates the density, so
  * D ≈ (k-1) · 2³² / h₍k₎.
  *
  * Why this sketch and not HyperLogLog here: the estimator is a pure
  * function of a deterministic hash, so an external engine can reproduce
  * it EXACTLY (DuckDB orders the same sha256-derived hashes and reads the
  * k-th) — the sketch stays inside the hash-equality correctness gate
  * instead of a weaker rows-only check, while keeping the properties that
  * matter at 100 TB: O(k) state, associative/commutative merge (partial
  * aggregation map-side, k longs per group over the wire, never the
  * distinct values themselves), and run-to-run determinism.
  */
object Kmv {

  /** Sketch size: relative error ~ 1/√(k−2) ≈ 13 %. */
  val K = 64

  /** 2³² — the hash range; [[K]]−1 times this is double-exact (< 2⁵³). */
  val HashRange = 4294967296.0

  /** THE estimator — the single scalar definition every surface (batch
    * Column expr, streaming state, specs) derives from: exact below k,
    * density-based at k. */
  def estimate(buf: Buf): Double =
    if (buf.items.size < K) buf.items.size.toDouble
    else (K - 1) * HashRange / buf.items.last

  final case class Buf(items: Vector[Long]) // ascending, distinct, size <= K

  /** Mergeable bottom-k-distinct-hash aggregator (UDAF tier). */
  final class KmvAgg(k: Int) extends Aggregator[Long, Buf, Seq[Long]] {
    override def zero: Buf = Buf(Vector.empty)

    // First index whose value is >= h (the buffer is sorted ascending).
    private def lowerBound(v: Vector[Long], h: Long): Int = {
      var lo = 0
      var hi = v.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (v(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def reduce(b: Buf, h: Long): Buf = {
      val v = b.items
      // O(1) rejection of the overwhelmingly common case once saturated:
      // a hash at or above the current k-th minimum can never enter the
      // sketch (and equality means it's already present)
      if (v.size >= k && h >= v.last) b
      else {
        val i = lowerBound(v, h)
        if (i < v.size && v(i) == h) b // already present
        else Buf(v.patch(i, h :: Nil, 0).take(k))
      }
    }

    override def merge(a: Buf, b: Buf): Buf =
      Buf((a.items ++ b.items).distinct.sorted.take(k))

    override def finish(b: Buf): Seq[Long] = b.items

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Gate query: per source, the KMV estimate of the distinct-shingle count
    * next to the exact count (the exact column exists to make the gate
    * self-validating; a production run would emit the sketch alone). The
    * estimate divides exact integers — (k−1)·2³² is double-exact below
    * 2⁵³ — so the value is bit-identical cross-engine. */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new KmvAgg(K), Encoders.scalaLong)
    val sh = Tables.parallel(s, dir, "documents")
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("source"), explode(trigrams(col("w"))).as("sg"))
    sh.groupBy("source")
      .agg(kmv(hex32(col("sg"))).as("sk"),
        countDistinct(col("sg")).as("n_exact"))
      .select(col("source"), col("n_exact"),
        size(col("sk")).cast("long").as("n_kept"),
        round(when(size(col("sk")) < K, size(col("sk")).cast("double"))
          .otherwise(lit((K - 1) * HashRange) /
            element_at(col("sk"), K).cast("double")), 4).as("est_distinct"))
  }

  // ------------------------------------------- KMV set operations
  /** Sketch-tier SOURCE OVERLAP — the scale path beside the exact
    * `source_overlap` join (theta-sketch set operations over the same
    * KMV minima, Bar-Yossef et al. 2002 / DataSketches theta): the
    * exact query joins every cross-source shingle occurrence (linear
    * but corpus-sized); this one ships K=[[K]] longs per source and
    * answers every pairwise overlap from the sketches alone.
    *
    * Estimators, per unordered source pair (a < b), with U = the K
    * smallest of the merged minima:
    *  - union: exact `|U|` while unsaturated (both sketches are then
    *    complete sets), else `(K−1)·2³² / U₍K₎` — [[estimate]] applied
    *    to the merged sketch;
    *  - Jaccard: `|{h ∈ U : h ∈ A ∧ h ∈ B}| / |U|` — U is a uniform
    *    K-sample of the union, membership in both sketches marks the
    *    intersection within it;
    *  - shared: `J_est × union_est`.
    * Every input is a deterministic sha256-derived hash and every step
    * is integer or a replayed IEEE expression, so DuckDB reproduces
    * the estimates bit-exactly — the sketch stays inside the
    * hash-equality gate (same argument as [[kmvDistinct]]).
    *
    * Scale shape: one partial-aggregated sketch pass ∝ tokens, then a
    * sources² pair expansion over K-long arrays — sources are a
    * FIXED-cardinality dimension (20 here; hundreds in production), so
    * the pair stage is corpus-independent. The exact twin stays the
    * gate's cross-check; at 100 TB one runs the sketches. */
  def sourceOverlapKmv(s: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new KmvAgg(K), Encoders.scalaLong)
    val sk = Tables.parallel(s, dir, "documents")
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("source"), explode(trigrams(col("w"))).as("sg"))
      .groupBy("source")
      .agg(kmv(hex32(col("sg"))).as("sk"))
    val u = slice(array_sort(array_union(col("a.sk"), col("b.sk"))), 1, K)
    val pairs = sk.as("a").join(sk.as("b"),
      col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"), u.as("u"))
      .withColumn("n_u", size(col("u")))
      .withColumn("in_both", size(filter(col("u"),
        h => array_contains(col("ska"), h) &&
          array_contains(col("skb"), h))))
      .withColumn("est_union",
        when(col("n_u") < K, col("n_u").cast("double"))
          .otherwise(lit((K - 1) * HashRange) /
            element_at(col("u"), K).cast("double")))
    pairs.select(col("src_a"), col("src_b"),
      round(col("est_union"), 4).as("est_union"),
      round(col("in_both").cast("double") / col("n_u"), 4)
        .as("est_jaccard"),
      round(col("in_both").cast("double") / col("n_u") * col("est_union"),
        4).as("est_shared"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmv_distinct" -> kmvDistinct,
    "source_overlap_kmv" -> sourceOverlapKmv)

  val oracles: Map[String, String] = Map(
    "kmv_distinct" ->
      s"""WITH t AS (
        |  SELECT source, unnest($trigramsSql) AS sg
        |  FROM (SELECT source, list_filter(string_split(text, ' '),
        |                x -> x <> '') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |d AS (SELECT DISTINCT source, sg FROM t),
        |h AS (SELECT DISTINCT source,
        |        ('0x' || substr(sha256(sg), 1, 8))::BIGINT AS hk
        |      FROM d),
        |r AS (SELECT source, hk, row_number() OVER (
        |        PARTITION BY source ORDER BY hk) AS rk
        |      FROM h),
        |e AS (SELECT source, count(*) AS n_exact FROM d GROUP BY source),
        |k AS (SELECT source, max(hk) AS hk_k, count(*) AS n_kept
        |      FROM r WHERE rk <= $K GROUP BY source)
        |SELECT e.source, e.n_exact::BIGINT AS n_exact,
        |  k.n_kept::BIGINT AS n_kept,
        |  round(CASE WHEN k.n_kept < $K THEN k.n_kept::DOUBLE
        |        ELSE ${(K - 1) * 4294967296.0} / k.hk_k END, 4)
        |    AS est_distinct
        |FROM e JOIN k USING (source)""".stripMargin,
    "source_overlap_kmv" ->
      s"""WITH t AS (
        |  SELECT source, unnest($trigramsSql) AS sg
        |  FROM (SELECT source, list_filter(string_split(text, ' '),
        |                x -> x <> '') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |h AS (SELECT DISTINCT source,
        |        ('0x' || substr(sha256(sg), 1, 8))::BIGINT AS hk
        |      FROM t),
        |r AS (SELECT source, hk, row_number() OVER (
        |        PARTITION BY source ORDER BY hk) AS rk
        |      FROM h),
        |s AS (SELECT source, list(hk ORDER BY hk ASC) AS sk
        |      FROM r WHERE rk <= $K GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |        a.sk AS ska, b.sk AS skb,
        |        list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:$K] AS u
        |      FROM s a JOIN s b ON a.source < b.source),
        |q AS (SELECT src_a, src_b, len(u) AS n_u,
        |        len(list_filter(u, x -> list_contains(ska, x)
        |          AND list_contains(skb, x))) AS in_both,
        |        CASE WHEN len(u) < $K THEN len(u)::DOUBLE
        |          ELSE ${(K - 1) * 4294967296.0} / u[$K]::DOUBLE END
        |          AS est_union
        |      FROM p)
        |SELECT src_a, src_b, round(est_union, 4) AS est_union,
        |  round(in_both::DOUBLE / n_u, 4) AS est_jaccard,
        |  round(in_both::DOUBLE / n_u * est_union, 4) AS est_shared
        |FROM q""".stripMargin)
}
