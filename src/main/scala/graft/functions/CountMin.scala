package graft.functions

import graft.Tables
import graft.text.TextQueries.words
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) — the
  * frequency-estimate tier of the sketch family, next to KMV's
  * cardinality tier: d pairwise-independent hash rows × w buckets of
  * counters; a token's estimate is the MIN of its d cells and never
  * undercounts (every cell is its true count plus non-negative collision
  * mass).
  *
  * The sketch is built as a RELATION, not a UDAF: explode each distinct
  * token into its d (row, bucket) cells and sum — the counter matrix is
  * a (source, j, bkt) table of at most d·w rows per group. That is the
  * shape a 1000-executor build wants anyway (map-side partial sums, one
  * shuffle of vocab-sized rows, merge = the same sum), it keeps every
  * stage inside whole-stage codegen, and the oracle mirrors it as plain
  * GROUP BY SQL. All arithmetic is 64-bit integer (the minhash operand
  * bound: a_j, h < 2³¹ so a_j·h < 2⁶²), so the gate is hash-exact.
  *
  * Scale: the heavy relation is the (source, token) count table — one
  * shuffle with partial aggregation; everything after is vocab-sized × d.
  * At 100 TB you'd cap the exploded vocab per partition the same way; the
  * sketch never materializes per-occurrence state.
  */
object CountMin {

  /** Depth (hash rows): error probability ~ e^-d. */
  val Depth = 4

  /** Width (buckets per row): overestimate ~ N·e/w. 256 keeps the fixture
    * collisions visible-but-small; production uses 2¹⁶+. */
  val Width = 256

  /** Universal-hash modulus (Mersenne prime 2³¹−1), same operand-bound
    * discipline as the minhash permutations. */
  val Prime = 2147483647L

  val TopK = 5

  /** Token hash for the sketch: a 28-bit sha256 prefix, deliberately
    * BELOW the modulus. hex32 ranges over [0, 2³²) which the bucket map
    * reduces mod 2³¹−1 — under that reduction two tokens whose 32-bit
    * hashes differ by exactly 2³¹−1 would collide in ALL d rows at once
    * (row collisions not independent, weakening the e^−d bound). With
    * h < 2²⁸ < Prime the reduction is injective on the hash domain, so
    * simultaneous-row collisions require a genuine 28-bit hash collision. */
  def tokenHash(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 7), 16, 10).cast("long")

  /** Deterministic row coefficients from sha256 of the row index —
    * seed-free, reproducible anywhere, inlined as literals into both
    * engines (the DedupQueries.coefSource discipline). */
  private def coefSource(tag: String, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"countmin-$tag-$j".getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
  val RowA: IndexedSeq[Long] =
    (0 until Depth).map(j => coefSource("a", j) % (Prime - 1) + 1)
  val RowB: IndexedSeq[Long] =
    (0 until Depth).map(j => coefSource("b", j) % Prime)

  /** Cell coordinates of a token hash for row j. The hash is reduced mod
    * the prime BEFORE the multiply so both operands stay below 2³¹ and
    * the product below 2⁶² (no 64-bit overflow); for [[tokenHash]] inputs
    * (< 2²⁸) that reduction is the identity. */
  def bucket(h: Column, j: Int): Column =
    pmod(pmod(pmod(h, lit(Prime)) * RowA(j) + RowB(j), lit(Prime)),
      lit(Width))

  /** Explode a hashed-token row into its d (j, bkt) cells — shared with
    * the streaming twin ([[graft.streaming.StreamCountMin]]) so the two
    * surfaces cannot drift. */
  def cells(h: Column): Column = explode(array(
    (0 until Depth).map(j =>
      struct(lit(j).as("j"), bucket(h, j).as("bkt"))): _*))

  /** Gate query: per source, the [[TopK]] most frequent tokens (count
    * desc, token asc) with the exact count next to the CMS estimate —
    * self-validating like `kmv_distinct`: the gate exposes the
    * overestimate instead of hiding it. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    // vocab-sized, read twice (counter cells + top-k) — materialize once
    val cnt = Tables.parallel(s, dir, "documents")
      .select(col("source"), explode(words(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n"))
      .withColumn("h", tokenHash(col("t")))
      .localCheckpoint(true)
    val counters = cnt
      .select(col("source"), col("n"), cells(col("h")).as("c"))
      .groupBy(col("source"), col("c.j"), col("c.bkt"))
      .agg(sum("n").as("cell"))
    val top = cnt
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("n"), asc("t"))))
      .filter(col("rk") <= TopK)
    top
      .select(col("source"), col("t"), col("n"), col("rk"),
        cells(col("h")).as("c"))
      .select(col("source"), col("t"), col("n"), col("rk"),
        col("c.j").as("j"), col("c.bkt").as("bkt"))
      .join(counters, Seq("source", "j", "bkt"))
      .groupBy("source", "t", "n", "rk")
      .agg(min("cell").as("est"))
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("t").as("token"), col("n").as("n_exact"),
        col("est").as("n_cms"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cms_heavy_hitters" -> cmsHeavyHitters)

  /** Static oracle: the row coefficients are data-independent constants,
    * inlined as a VALUES table; the counter matrix and the min-of-cells
    * estimate are plain GROUP BY SQL over the identical integer
    * arithmetic. */
  val oracles: Map[String, String] = {
    val coefRows = (0 until Depth)
      .map(j => s"($j, ${RowA(j)}, ${RowB(j)})").mkString(", ")
    Map(
      "cms_heavy_hitters" ->
        s"""WITH coefs(j, a, b) AS (VALUES $coefRows),
          |tok AS (SELECT source,
          |          unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          |            AS t
          |        FROM documents),
          |cnt AS (SELECT source, t, count(*) AS n,
          |          ('0x' || substr(sha256(t), 1, 7))::BIGINT AS h
          |        FROM tok GROUP BY source, t),
          |cells AS (SELECT source, j, (((h % $Prime) * a + b) % $Prime) % $Width
          |            AS bkt,
          |            sum(n) AS cell
          |          FROM cnt CROSS JOIN coefs
          |          GROUP BY source, j, bkt),
          |top AS (SELECT * FROM (
          |          SELECT source, t, n, h, row_number() OVER (
          |            PARTITION BY source ORDER BY n DESC, t ASC) AS rk
          |          FROM cnt)
          |        WHERE rk <= $TopK)
          |SELECT top.source, top.rk, top.t AS token, top.n AS n_exact,
          |  min(cells.cell)::BIGINT AS n_cms
          |FROM top CROSS JOIN coefs
          |JOIN cells ON cells.source = top.source AND cells.j = coefs.j
          |  AND cells.bkt =
          |    (((top.h % $Prime) * coefs.a + coefs.b) % $Prime) % $Width
          |GROUP BY top.source, top.rk, top.t, top.n""".stripMargin)
  }
}
