package graft.streaming

import graft.text.{QuantileNorm, TextQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.QuantileNorm.qualityQuantileNorm]] —
  * the deployment shape of a calibrated quality filter: the per-source
  * CDF is built ONCE on a reference corpus (batch, bounded-domain
  * histogram), frozen into a sources-bounded array broadcast, and every
  * arriving document is scored against it with a stateless projection.
  * `cnt_less` for an arriving score is a fold over the frozen per-source
  * (score, cnt) array — ≤ 10,001 entries per source by the e4 score
  * bound — so a score BETWEEN reference histogram points still lands on
  * the exact strictly-less count. Append mode, no watermark, no state
  * store; StreamQuantileNormSpec pins stream ≡ batch on the fixture. */
object StreamQuantileNorm {

  /** Frozen per-source CDF: (source, entries[(score_e4, cnt)], n).
    * Built batch-side from the reference corpus, then MATERIALIZED into a
    * local relation — the model is sources-bounded (≤ 10,001 histogram
    * entries per source by the e4 score bound), so collecting it is the
    * same model-bounded freeze the classifier weights and PCA matrix
    * twins ship; the scoring plan then carries the CDF as a
    * LocalTableScan broadcast with no lingering aggregation exchange
    * (which would otherwise wrap the stateless micro-batch in AQE and
    * hide the plan from the streaming lock). */
  def frozenCdf(docs: DataFrame): DataFrame = {
    val agg = docs.groupBy(col("source"), col("score_e4"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(
        sort_array(collect_list(struct(col("score_e4").as("s"),
          col("cnt").as("c")))).as("entries"),
        sum("cnt").as("n"))
    val spark = docs.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(agg.collect(): _*), agg.schema)
  }

  /** Score a (doc_id, source, text) stream against the frozen CDF:
    * emits the batch gate's exact schema
    * (doc_id, source, score_e4, pct_e6, calib_band). */
  def scoreOverStream(stream: DataFrame, cdf: DataFrame): DataFrame = {
    val w = TextQueries.words(col("text"))
    val scored = stream
      .select(col("doc_id"), col("source"),
        size(w).as("n_words"), size(array_distinct(w)).as("n_uniq"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("source"),
        round(col("n_uniq").cast("double") / col("n_words").cast("double")
          * 10000, 0).cast("long").as("score_e4"))
    val c = broadcast(cdf.withColumnRenamed("source", "c_source"))
    scored.join(c, col("source") === col("c_source"), "left")
      .withColumn("cnt_less",
        coalesce(aggregate(col("entries"), lit(0L),
          (acc, e) => acc + when(e("s") < col("score_e4"), e("c"))
            .otherwise(lit(0L))), lit(0L)))
      .withColumn("n", coalesce(col("n"), lit(1L)))
      .select(col("doc_id"), col("source"), col("score_e4"),
        QuantileNorm.pctE6(col("cnt_less"), col("n")).as("pct_e6"))
      .withColumn("calib_band", QuantileNorm.band(col("pct_e6")))
  }

  def outputMode: OutputMode = OutputMode.Append()
}
