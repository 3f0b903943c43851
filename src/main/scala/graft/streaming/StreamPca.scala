package graft.streaming

import graft.sim.EmbedPca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.sim.EmbedPca]]'s apply side — the
  * frozen-model scoring shape every trained-operator twin uses
  * (classifier, LM scorers, drift): the projection matrix is trained
  * ONCE in batch, frozen into literals, and every arriving embedding
  * emits its principal + whitened coordinates. Pure per-row projection:
  * STATELESS append mode, no watermark, no state — micro-batching
  * cannot change any coordinate, and stream ≡ batch is exact because
  * [[EmbedPca.projectionCols]] is the single definition both sides
  * select. */
object StreamPca {

  /** Score a (vec_id, embedding) stream with a frozen model. */
  def projectionsOverStream(vecs: DataFrame, m: EmbedPca.Model): DataFrame =
    vecs.select(col("vec_id") +: EmbedPca.projectionCols(m): _*)

  def outputMode: OutputMode = OutputMode.Append()
}
