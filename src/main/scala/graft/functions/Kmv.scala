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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmv_distinct" -> kmvDistinct)

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
        |FROM e JOIN k USING (source)""".stripMargin)
}
