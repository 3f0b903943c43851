package graft.streaming

import graft.text.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of [[graft.functions.Hll]] — a running distinct-
  * trigram estimate per source over an unbounded document stream.
  * `approx_count_distinct` is a declarative aggregate with a mergeable
  * register buffer, so Structured Streaming folds each micro-batch into
  * ~1.4 KB of state per group and the estimate after any prefix of the
  * stream equals the batch estimate over the same rows (register max is
  * commutative/associative — order- and batching-independent, the same
  * witness the batch spec proves for partitioning).
  *
  * This twin is also the clearest argument for the sketch: the exact
  * `count(DISTINCT)` column of the batch gate CANNOT run here — Spark
  * rejects distinct aggregates on streams outright (the state would be
  * every distinct value forever). At 100 TB-scale ingest the register
  * sketch is not an approximation of the streaming plan; it IS the only
  * streaming plan.
  */
object StreamHll {

  /** Per-source running distinct-trigram estimate of a (source, text)
    * stream. Complete mode: the tiny per-source result is re-emitted
    * each trigger. */
  def distinctOverStream(docs: DataFrame, rsd: Double): DataFrame =
    TextQueries.sourceTrigrams(docs)
      .groupBy("source")
      .agg(approx_count_distinct(col("sg"), rsd).as("n_hll"))

  def outputMode: OutputMode = OutputMode.Complete()
}
