package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of
  * `operators.IntervalJoin` (click→purchase attribution as events arrive).
  * Spark's stream-stream equi-join with a time-range residual is exactly
  * the right physical shape here: both sides shuffle on the key, and the
  * WATERMARKS are what bound the join state — without them every click
  * ever seen must be retained forever in case a future purchase matches.
  *
  * State bound: the click side keeps `lookback + clickDelay` of event-time
  * history per key partition, the purchase side `purchaseDelay`; at 100 TB/
  * day the state store holds a sliding window of the topic, not the topic.
  *
  * The reference's pipeline is stateless (SURVEY.md §2.7 T5) — this is
  * extension surface, spec'd by streaming≡batch parity on a closed input
  * rather than a DuckDB oracle (the gate's batch `interval_join` covers
  * value correctness).
  */
object StreamIntervalJoin {

  /** Join purchases (`purchase_id`, `user_id`, `ts`) to the clicks
    * (`c_user_id`, `c_ts`, `c_event_id`) of the same user in the preceding
    * `lookback`. Watermark delays are how late each stream may arrive;
    * click state is retained for `lookback` beyond its watermark so a
    * maximally-late purchase still finds its clicks. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      lookback: String = "6 hours",
                      purchaseDelay: String = "10 minutes",
                      clickDelay: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", purchaseDelay)
    val c = clicks.withWatermark("c_ts", clickDelay)
    p.join(c, expr(
      s"""user_id = c_user_id
         |AND c_ts >= ts - INTERVAL $lookback
         |AND c_ts < ts""".stripMargin))
  }
}
