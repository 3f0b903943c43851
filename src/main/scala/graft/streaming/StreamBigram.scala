package graft.streaming

import graft.text.{BigramLm, TextQueries}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.BigramLm]] — the deployment shape of
  * the transition-surprisal filter: the top-K bigram model (with context
  * counts) and the transition total are trained ONCE on a reference
  * corpus, frozen, and every arriving document is scored against them.
  * Transitions come from the arriving document itself (adjacent-pair
  * `transform`, no shuffle), each is looked up in a literal model map
  * (the broadcast side inlined into the plan), and the mean is a per-row
  * `aggregate` fold — STATELESS append mode, the same parity contract as
  * [[StreamLmScore]]/[[StreamBm25]]/[[StreamTokenize]], pinned
  * row-for-row by `StreamBigramSpec`.
  *
  * The surprisal arithmetic matches the batch/oracle formula
  * (`length(bin(c1 div c2))`, backoff `length(bin(T))`) with integral
  * division expressed as `(c1 - pmod(c1, c2)) / c2` — the same
  * lambda-safe `div` workaround [[StreamLmScore]] documents. Model map
  * keys join w1/w2 with a single space, which whitespace tokenization
  * guarantees is unambiguous (tokens never contain whitespace).
  */
object StreamBigram {

  /** Score a (doc_id, text) stream against a frozen model: `model` maps
    * (w1, w2) to (c2, c1), `t` is the training transition total. Emits
    * (doc_id, n_trans, bg_score, grade) — the batch query's schema. */
  def scoreOverStream(docs: DataFrame,
                      model: Map[(String, String), (Long, Long)],
                      t: Long): DataFrame = {
    require(t > 0, "empty training transition stream")
    val mmap =
      if (model.isEmpty) map_from_arrays(
        expr("CAST(array() AS array<string>)"),
        expr("CAST(array() AS array<array<bigint>>)"))
      else map(model.toSeq.sortBy(_._1).flatMap { case ((w1, w2), (c2, c1)) =>
        Seq(lit(w1 + " " + w2), typedLit(Seq(c2, c1)))
      }: _*)
    val backoff = length(bin(lit(t))).cast("long")
    def surp(pair: Column): Column = {
      val e = element_at(mmap, pair)
      val c2 = element_at(e, 1)
      val c1 = element_at(e, 2)
      when(e.isNotNull,
        length(bin(((c1 - pmod(c1, c2)) / c2).cast("long"))).cast("long"))
        .otherwise(backoff)
    }
    docs
      .withColumn("w", TextQueries.words(col("text")))
      .filter(size(col("w")) >= 2)
      .withColumn("pairs", expr(
        """transform(sequence(1, size(w) - 1),
          |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("pairs")).cast("long").as("n_trans"),
        round(aggregate(transform(col("pairs"), surp(_)), lit(0L), _ + _)
          .cast("double") / size(col("pairs")), 4).as("bg_score"))
      .withColumn("grade",
        when(col("bg_score") <= BigramLm.NaturalMax, "natural")
          .when(col("bg_score") <= BigramLm.MixedMax, "mixed")
          .otherwise("synthetic"))
  }

  def outputMode: OutputMode = OutputMode.Append()
}
