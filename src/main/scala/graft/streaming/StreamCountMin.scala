package graft.streaming

import graft.functions.CountMin
import graft.functions.CountMin.tokenHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming Count-Min — the frequency sketch over an unbounded token
  * stream. Where KMV needs custom `mapGroupsWithState` state (its merge
  * is an order-statistics fold), the CMS counter matrix is a PURE SUM,
  * so the streaming build is literally the batch groupBy run in
  * streaming mode: Spark's aggregation state IS the sketch — bounded at
  * d·w rows per source no matter how many tokens flow through, with
  * map-side partial sums per micro-batch. The streaming counters after
  * any prefix of micro-batches equal the batch counters over the same
  * rows (order-insensitive, duplicate-correct), which is the parity
  * StreamCountMinSpec pins. Complete mode; no watermark — counters only
  * grow.
  */
object StreamCountMin {

  /** Running counter matrix over a (source, t) token stream: one row per
    * non-empty (source, hash-row, bucket) cell. */
  def countersOverStream(tokens: DataFrame): DataFrame =
    tokens
      .withColumn("h", tokenHash(col("t")))
      .select(col("source"), CountMin.cells(col("h")).as("c"))
      .groupBy(col("source"), col("c.j"), col("c.bkt"))
      .agg(count(lit(1)).as("cell"))

  def outputMode: OutputMode = OutputMode.Complete()
}
