package graft.streaming

import graft.sim.EmbeddingDrift
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming embedding-drift accumulation — the `embedding_drift`
  * monitor as running state over an unbounded vector stream (the shape
  * an ingest pipeline runs to watch a NEW snapshot's embedding
  * distribution converge while it lands). Per (label, half) the state
  * is exactly the batch pass's integer sums: fixed-point centroid sum
  * vector, count, norm sum — O(dim) longs per key, and because integer
  * addition is associative and order-free, the streaming state after
  * replaying any set of vectors EQUALS the batch sums over the same
  * rows regardless of micro-batching (the parity `StreamDriftSpec`
  * pins against the batch gate query's output rows). Update mode; no
  * watermark — sums never evict.
  *
  * The quantization is [[EmbeddingDrift.qCol]]/[[EmbeddingDrift.nqCol]]
  * — the SAME column expressions the batch query runs, applied in the
  * stream's stateless projection, so the two surfaces share one
  * definition of the fixed-point step.
  */
object StreamDrift {

  final case class VecEvent(label: Int, h: Int, q: Array[Long], nq: Long)

  final case class DriftSums(c: Array[Long], n: Long, s: Long)

  final case class DriftUpdate(label: Int, h: Int, c: Array[Long],
                               n: Long, s: Long)

  /** Stateless projection from raw (vec_id, label, embedding) rows to
    * quantized events — shared expressions with the batch pass. */
  def toEvents(raw: DataFrame): DataFrame = {
    val d = transform(col("embedding"), x => x.cast("double"))
    raw.select(col("label").cast("int").as("label"),
      (col("vec_id") % 2).cast("int").as("h"),
      EmbeddingDrift.qCol(d).as("q"),
      EmbeddingDrift.nqCol(d).as("nq"))
  }

  def updateState(key: (Int, Int), events: Iterator[VecEvent],
                  state: GroupState[DriftSums]): DriftUpdate = {
    var cur = state.getOption.getOrElse(DriftSums(Array.empty, 0L, 0L))
    for (e <- events) {
      val c = if (cur.c.isEmpty) new Array[Long](e.q.length)
        else cur.c.clone()
      e.q.indices.foreach(i => c(i) += e.q(i))
      cur = DriftSums(c, cur.n + 1, cur.s + e.nq)
    }
    state.update(cur)
    DriftUpdate(key._1, key._2, cur.c, cur.n, cur.s)
  }

  /** Running per-(label, half) sums, update mode. */
  def sumsOverStream(events: Dataset[VecEvent])(
      implicit spark: SparkSession): Dataset[DriftUpdate] = {
    import spark.implicits._
    events
      .groupByKey(e => (e.label, e.h))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (k: (Int, Int), it: Iterator[VecEvent],
         st: GroupState[DriftSums]) => updateState(k, it, st))
  }

  /** Finish a pair of half-sums into the batch query's output row —
    * same arithmetic order (double dot left-to-right, one division,
    * HALF_UP rounding at 4) as the batch plan. */
  def driftRow(label: Int, h0: DriftSums, h1: DriftSums)
      : (Int, Long, Long, Double, Double, Double) = {
    def dot(a: Array[Long], b: Array[Long]): Double = {
      var s = 0.0
      a.indices.foreach(i => s += a(i).toDouble * b(i).toDouble)
      s
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (label, h0.n, h1.n,
      r4(dot(h0.c, h1.c) /
        (math.sqrt(dot(h0.c, h0.c)) * math.sqrt(dot(h1.c, h1.c)))),
      r4(h0.s.toDouble / (h0.n * EmbeddingDrift.Q).toDouble),
      r4(h1.s.toDouble / (h1.n * EmbeddingDrift.Q).toDouble))
  }

  def outputMode: OutputMode = OutputMode.Update()
}
