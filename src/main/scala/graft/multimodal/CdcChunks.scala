package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup over media payloads — the
  * storage-layer half of multimodal dedup (Muthitacharoen et al. 2001,
  * LBFS; the rsync/backup-dedup family): split each decoded PCM stream
  * at ROLLING-HASH-chosen boundaries, so two clips sharing a long run
  * of samples produce identical chunks after any prefix insertion or
  * deletion (fixed-size blocks would lose alignment forever — the
  * entire point of content-defined boundaries), then count duplicate
  * chunks corpus-wide. The corpus' planted tail-edit duplicate pairs
  * land in the audio modality together (prefix-hash kind assignment),
  * so their shared prefixes deduplicate chunk-for-chunk at the gate.
  *
  * Boundary rule: a window-[[W]] Horner hash over the last W samples,
  * taken mod [[P]]; positions where it ≡ 0 (mod [[M]]) end a chunk
  * (expected chunk length ≈ M). Chunk identity: Horner hash of the
  * chunk's samples mod [[P2]] plus the length — all int64-exact, so
  * the DuckDB oracle recomputes both hashes from the analytic fixture
  * bytes and the gate is exact hash equality.
  *
  * Scale shape: decode + chunking fan out inside the partition (the
  * media byte-decode boundary, same as the codec stages); the only
  * shuffle is the (hash, len) group-count — chunk-proportional with
  * map-side combine, and the summary is a single-row rollup. */
object CdcChunks {

  val W = 8            // rolling window (samples)
  val M = 64L          // boundary modulus → expected chunk ≈ 64 samples
  val P = 1000003L     // window-hash modulus (prime)
  val P2 = 1000000007L // chunk-identity modulus (prime)
  val B = 31L          // window Horner base
  val B2 = 131L        // chunk-identity Horner base
  val TopK = 20

  /** Chunk (identity-hash, length) list of one sample stream —
    * the single definition the Spark side executes and the oracle
    * mirrors in SQL. */
  private[multimodal] def chunksOf(samples: Array[Int]): Seq[(Long, Int)] = {
    val n = samples.length
    if (n == 0) return Seq.empty
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = W - 1
    while (i < n) {
      var h = 0L
      var k = i - W + 1
      while (k <= i) { h = (h * B + samples(k)) % P; k += 1 }
      if (h % M == 0 && i < n - 1) bounds += i
      i += 1
    }
    val starts = 0 +: bounds.map(_ + 1).toSeq
    val ends = bounds.toSeq :+ (n - 1)
    starts.zip(ends).map { case (s0, e0) =>
      var g = 0L
      var t = s0
      while (t <= e0) { g = (g * B2 + samples(t)) % P2; t += 1 }
      (g, e0 - s0 + 1)
    }
  }

  final case class Chunk(id: Long, hash: Long, len: Int)

  /** Chunk instances of ONE media record (audio only) — the per-record
    * kernel shared by the batch relation and the streaming twin
    * ([[graft.streaming.StreamCdc]]), so chunk identity cannot drift
    * between deployment shapes. */
  def chunkRecord(r: Multimodal.MediaRecord): Iterator[Chunk] =
    if (r.kind != "audio") Iterator.empty
    else {
      val a = MediaCodec.decodeWav(r.bytes)
      chunksOf(a.samples).iterator.map { case (h, l) => Chunk(r.id, h, l) }
    }

  /** One row per chunk instance over the audio modality. */
  private def chunkRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.mediaFromDocuments(s, dir)
      .mapPartitions(_.flatMap(chunkRecord))
      .toDF()
  }

  private def groups(s: SparkSession, dir: String): DataFrame =
    chunkRows(s, dir)
      .groupBy("hash", "len")
      .agg(count(lit(1)).as("cnt"))

  /** Gate query: corpus-wide CDC dedup summary (1 row). */
  def cdcChunks(s: SparkSession, dir: String): DataFrame =
    groups(s, dir).agg(
      sum(col("cnt")).cast("long").as("total_chunks"),
      count(lit(1)).as("distinct_chunks"),
      (sum(col("cnt")) - count(lit(1))).cast("long").as("dup_chunks"),
      sum(col("cnt") * col("len")).cast("long").as("bytes_total"),
      sum(col("len")).cast("long").as("bytes_distinct"),
      round(sum(col("len")) / sum(col("cnt") * col("len")), 4)
        .as("dedup_ratio"))

  /** Gate query: the most-duplicated chunks (the dedup candidates a
    * storage layer would intern first). */
  def cdcTopChunks(s: SparkSession, dir: String): DataFrame =
    groups(s, dir)
      .filter(col("cnt") > 1)
      .orderBy(desc("cnt"), asc("hash"), asc("len"))
      .limit(TopK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_chunks" -> cdcChunks,
    "cdc_top_chunks" -> cdcTopChunks)

  // Oracle: recompute boundaries and chunk hashes from the analytic
  // audio bytes (sample i == text char code i) with the identical
  // Horner folds — int64-exact in both engines.
  private val chunksCte: String =
    s"""${Multimodal.docsCte},
       |a AS (SELECT id, text, n FROM docs WHERE kmod = 1),
       |s AS (SELECT id, n,
       |  list_transform(range(0, n),
       |    i -> ord(substr(text, (i + 1)::INT, 1))::BIGINT) AS sm
       |  FROM a),
       |bn AS (SELECT id, n, sm,
       |  list_filter(range($W - 1, n), i ->
       |    list_reduce(list_prepend(0::BIGINT,
       |        sm[(i - $W + 2)::INT:(i + 1)::INT]),
       |      (h, x) -> (h * $B + x) % $P) % $M = 0
       |    AND i < n - 1) AS bnds
       |  FROM s),
       |sp AS (SELECT id, sm,
       |  list_prepend(0::BIGINT, list_transform(bnds, b -> b + 1)) AS starts,
       |  list_append(bnds, n - 1) AS ends
       |  FROM bn),
       |ch AS (SELECT id,
       |  unnest(list_transform(range(1, len(starts) + 1), j ->
       |    list_reduce(list_prepend(0::BIGINT,
       |        sm[(starts[j::INT] + 1)::INT:(ends[j::INT] + 1)::INT]),
       |      (g, x) -> (g * $B2 + x) % $P2))) AS hash,
       |  unnest(list_transform(range(1, len(starts) + 1), j ->
       |    ends[j::INT] - starts[j::INT] + 1)) AS len
       |  FROM sp),
       |g AS (SELECT hash, len, count(*) AS cnt FROM ch GROUP BY hash, len)"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    "cdc_chunks" ->
      s"""WITH $chunksCte
         |SELECT sum(cnt)::BIGINT AS total_chunks,
         |  count(*)::BIGINT AS distinct_chunks,
         |  (sum(cnt) - count(*))::BIGINT AS dup_chunks,
         |  sum(cnt * len)::BIGINT AS bytes_total,
         |  sum(len)::BIGINT AS bytes_distinct,
         |  round(sum(len) * 1.0 / sum(cnt * len), 4) AS dedup_ratio
         |FROM g""".stripMargin,
    "cdc_top_chunks" ->
      s"""WITH $chunksCte
         |SELECT hash, len, cnt FROM g WHERE cnt > 1
         |ORDER BY cnt DESC, hash ASC, len ASC LIMIT $TopK""".stripMargin)
}
