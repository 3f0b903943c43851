package graft.streaming

import graft.text.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.text.QualityClassifier.qualityClassifier]] —
  * the deployment shape of a model-based quality filter: the linear probe
  * is trained ONCE on a reference corpus (batch, closed-form), frozen, and
  * every arriving document is scored against it. Feature build + score are
  * one stateless per-row projection (the six weights ride in the plan as
  * literals), so: append mode, no watermark, no state store — a one-doc
  * micro-batch and a million-doc batch score identically, which
  * StreamClassifierSpec pins against the batch gate query. */
object StreamClassifier {

  /** Score a (doc_id, text) stream with frozen probe weights; emits the
    * batch query's exact schema (doc_id, label, score, pred). */
  def scoreOverStream(docs: DataFrame, weights: Array[Double]): DataFrame =
    QualityClassifier.scoreWith(docs, weights)

  def outputMode: OutputMode = OutputMode.Append()
}
