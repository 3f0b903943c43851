package graft.dedup

import graft.dedup.DedupQueries.{shingles, shinglesCte, DecontamEvalDocs,
  DecontamMinOverlap, MinhashPrime, PermA, PermB}
import graft.text.TextQueries.hex32
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter prefilter for eval-set decontamination — the
  * scale path in front of [[DedupQueries.decontaminate]]'s exact join:
  * compress the eval set's shingles into [[BloomBits]] bits, broadcast
  * them, and let the 100 TB corpus side test membership with four integer
  * hashes per shingle — no shuffle of corpus shingles at all. Documents
  * that clear [[DecontamMinOverlap]] candidate shingles go to the exact
  * confirmation join; Bloom filters have NO false negatives, so nothing
  * contaminated can be missed (spec'd), and false positives only cost
  * confirmation work (the gate row emits the exact-shared count next to
  * the Bloom count to expose that rate).
  *
  * All hashing reuses the MinHash universal-hash coefficients
  * ([[DedupQueries.PermA]]/[[PermB]]) — deterministic, literal-inlined in
  * both engines — so the DuckDB oracle rebuilds the identical filter bits
  * and reproduces every candidate decision exactly. Words are 32-bit so
  * `1 << (pos % 32)` stays positive in both engines.
  */
object Bloom {

  val BloomBits = 4096L
  val NumHashes = 4

  /** The j-th Bloom bit position of a pre-reduced hash `h`. */
  private def bitPos(h: Column, j: Int): Column =
    ((h * PermA(j) + PermB(j)) % MinhashPrime) % BloomBits

  private def bitPosSql(j: Int): String =
    s"((h * ${PermA(j)} + ${PermB(j)}) % $MinhashPrime) % $BloomBits"

  def decontamBloom(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
      .withColumn("h", pmod(hex32(col("s")), lit(MinhashPrime)))

    // build: eval shingles -> k positions -> OR'd 32-bit words, collected
    // into a dense long[BloomBits/32] on the driver — the filter IS the
    // broadcast variable (128 longs, like Ivf's centroid table), so the
    // probe side needs no join at all
    val words = sh.filter(col("doc_id") < DecontamEvalDocs)
      .select(col("h")).distinct()
      .select(explode(array((0 until NumHashes).map(j => bitPos(col("h"), j)): _*))
        .as("bpos"))
      .select(expr("cast(bpos div 32 AS int)").as("word"),
        expr("shiftleft(1L, int(bpos % 32))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val dense = Array.fill((BloomBits / 32).toInt)(0L)
    words.foreach(r => dense(r.getInt(0)) = r.getLong(1))

    // probe: a PURE per-row projection — all four bit tests against the
    // literal filter array; corpus shingles are never shuffled or joined
    // for membership (the only remaining joins/shuffles are the broadcast
    // exact-shared annotation and the per-doc rollup, which map-side
    // partials compress to one row per doc per task)
    val bloomArr = typedLit(dense.toSeq)
    val passCols = (0 until NumHashes).map { j =>
      val p = s"(${bitPosSql(j)})"
      val mask = s"shiftleft(1L, int($p % 32))"
      expr(s"(element_at(_bloom, cast($p div 32 AS int) + 1) & $mask) = $mask")
    }
    val evalSet = sh.filter(col("doc_id") < DecontamEvalDocs)
      .select(col("s")).distinct().withColumn("in_eval", lit(true))
    sh.filter(col("doc_id") >= DecontamEvalDocs)
      .withColumn("_bloom", bloomArr)
      .withColumn("bloom_pass", passCols.reduce(_ && _))
      .join(broadcast(evalSet), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).cast("long")
          .as("n_bloom_pass"),
        sum(when(col("in_eval").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_exact_shared"))
      .filter(col("n_bloom_pass") >= DecontamMinOverlap)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontam_bloom" -> decontamBloom)

  val oracles: Map[String, String] = Map(
    "decontam_bloom" ->
      (s"WITH $shinglesCte,\n" +
        s"""hs AS (SELECT doc_id, s,
          |         (('0x' || substr(sha256(s), 1, 8))::BIGINT) % $MinhashPrime
          |           AS h
          |       FROM sh),
          |bh AS (SELECT DISTINCT h FROM hs WHERE doc_id < $DecontamEvalDocs),
          |bp AS (SELECT unnest([${(0 until NumHashes).map(bitPosSql).mkString(", ")}])
          |         AS bpos FROM bh),
          |bloom AS (SELECT bpos // 32 AS word,
          |            bit_or(1::BIGINT << (bpos % 32)::INT) AS bits
          |          FROM bp GROUP BY 1),
          |pr AS (SELECT doc_id, s,
          |         unnest([${(0 until NumHashes).map(bitPosSql).mkString(", ")}])
          |           AS bpos
          |       FROM hs WHERE doc_id >= $DecontamEvalDocs),
          |pw AS (SELECT doc_id, s, bpos // 32 AS word,
          |         1::BIGINT << (bpos % 32)::INT AS mask
          |       FROM pr),
          |t AS (SELECT p.doc_id, p.s,
          |        sum(CASE WHEN (b.bits & p.mask) = p.mask
          |            THEN 1 ELSE 0 END) = $NumHashes AS pass
          |      FROM pw p LEFT JOIN bloom b USING (word)
          |      GROUP BY p.doc_id, p.s),
          |e AS (SELECT DISTINCT s FROM sh WHERE doc_id < $DecontamEvalDocs),
          |r AS (SELECT t.doc_id, t.pass, (e.s IS NOT NULL) AS shared
          |      FROM t LEFT JOIN e ON t.s = e.s)
          |SELECT doc_id, count(*) AS n_shingles,
          |  sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_bloom_pass,
          |  sum(CASE WHEN shared THEN 1 ELSE 0 END)::BIGINT AS n_exact_shared
          |FROM r GROUP BY doc_id
          |HAVING sum(CASE WHEN pass THEN 1 ELSE 0 END) >= $DecontamMinOverlap"""
          .stripMargin))
}
