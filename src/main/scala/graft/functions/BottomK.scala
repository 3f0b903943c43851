package graft.functions

import graft.Tables
import graft.text.TextQueries.hex32
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash sketch — a mergeable uniform group sampler as a typed
  * custom `Aggregator` (the UDAF tier of the extension surface): keep the k
  * items with the smallest deterministic hash. Because "k smallest of a
  * uniform hash" is associative and commutative, partial aggregation works
  * map-side like any built-in aggregate, and the same k rows come back on
  * every run, partitioning and cluster size — the distributed form of
  * reservoir sampling without RNG state.
  */
object BottomK {

  final case class Buf(items: List[(Long, Long)]) // (hash, value), size <= k

  /** Aggregator over (hash, value) pairs. */
  final class BottomKAgg(k: Int) extends Aggregator[(Long, Long), Buf, Seq[Long]] {
    override def zero: Buf = Buf(Nil)

    private def trim(items: List[(Long, Long)]): Buf =
      Buf(items.sortBy(identity).take(k))

    override def reduce(b: Buf, a: (Long, Long)): Buf = trim(a :: b.items)

    override def merge(b1: Buf, b2: Buf): Buf = trim(b1.items ++ b2.items)

    override def finish(b: Buf): Seq[Long] =
      b.items.sortBy(identity).map(_._2)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Gate query: a deterministic 5-doc sample per source via the custom
    * aggregate (same rows as ordering by the hash and taking 5 — which is
    * exactly what the oracle does). The sketch's array output is exploded
    * to one (source, rk, doc_id) row per sample so the gate compares
    * scalars — the aggregation itself still runs through the UDAF. */
  def samplePerGroupAgg(s: SparkSession, dir: String): DataFrame = {
    val bottomK = udaf(new BottomKAgg(5),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    Tables(s, dir, "documents")
      .groupBy("source")
      .agg(bottomK(
        hex32(concat(col("source"), lit("|"), col("doc_id"))),
        col("doc_id")).as("sample_ids"))
      .select(col("source"), posexplode(col("sample_ids")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("col").as("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_per_group_agg" -> samplePerGroupAgg)

  val oracles: Map[String, String] = Map(
    "sample_per_group_agg" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(sha256(source || '|' || doc_id), 1, 8))::BIGINT AS hk
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY source ORDER BY hk, doc_id) AS rk
        |      FROM h)
        |SELECT source, rk::INT AS rk, doc_id
        |FROM r WHERE rk <= 5""".stripMargin)
}
