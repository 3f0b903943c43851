package graft.streaming

import graft.operators.RelationalQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Native watermarked `session_window` streaming aggregation — the
  * second streaming sessionization surface next to the custom-state
  * [[EventSessions]] (`mapGroupsWithState`). Where EventSessions keeps
  * its own per-user state machine and emits running counts in Update
  * mode, this one delegates session semantics to Spark's built-in
  * session-window state store: sessions merge as events arrive and a
  * FINALIZED session row emits once the event-time watermark passes its
  * end (Append mode) — the shape a production pipeline sinks to an
  * append-only table.
  *
  * The aggregation itself is [[RelationalQueries.sessionWindowAgg]] —
  * the IDENTICAL Column expressions as the batch gate query
  * `q24_session_window`, including the exactly-gap boundary (an event
  * exactly `gap` after its predecessor EXTENDS the session; only a
  * strictly larger gap splits — the r4 bug class), so the stream ≡
  * batch contract is by construction plus proven on a closed input in
  * `StreamSessionWindowSpec`.
  *
  * Scale: session-window state is per (user, open-session); the
  * watermark bounds how long a session can stay open, so state size is
  * O(active users × open sessions within the watermark horizon) — never
  * O(event history). At 100 TB/day the knobs are the watermark delay
  * (state horizon) and `spark.sql.shuffle.partitions` (state store
  * parallelism); the aggregation partials merge map-side like any
  * streaming agg.
  */
object StreamSessionWindows {

  /** Finalized 30-minute-gap sessions over a streaming (user_id, ts,
    * value) frame. `delay` is the watermark: how much event-time
    * lateness to tolerate before a session can finalize. */
  def sessions(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    RelationalQueries.sessionWindowAgg(events.withWatermark("ts", delay))

  /** Append: one immutable row per closed session. */
  def outputMode: OutputMode = OutputMode.Append()
}
