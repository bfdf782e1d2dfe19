package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations (SURVEY T3): tumbling, sliding, and
  * session windows with watermarking. Each transform takes a DataFrame with
  * a TimestampType `ts` column and works identically on a batch frame or a
  * `readStream` frame — the streaming tests drive them through real
  * StreamingQuery execution; the batch-mode shapes are oracle-checked as
  * q15/q16.
  *
  * Scale notes: windowed aggs shuffle on (window, key) — state store size is
  * bounded by (watermark horizon / slide) x key cardinality, so the
  * watermark is the knob that keeps 100 TB/day streams in bounded state.
  * Late rows beyond the watermark are dropped by Spark before the agg.
  */
object EventStreams {

  /** Bound event lateness: required for append-mode streaming aggregation,
    * and the state-eviction horizon for all three window shapes.
    */
  def watermarked(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling event-time window: per (day, event_type) counts and value sums. */
  def tumblingCounts(events: DataFrame, width: String = "1 day"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding window: 2-day window advancing 1 day — each event lands in 2
    * overlapping windows (duplication factor = width/slide, the scale cost
    * of sliding windows).
    */
  def slidingCounts(events: DataFrame,
      width: String = "2 days", slide: String = "1 day"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Session window: gap-based per-user sessions (same semantics as the
    * oracle-checked q16, here in streaming-capable form).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))

  /** Streaming exact deduplication: at-most-one row per key, with dedup
    * state EVICTED once the key's event time falls behind the watermark —
    * the streaming half of the dedup family (batch half: Dedup.q30). At
    * 100 TB/day the watermark horizon bounds state exactly like the
    * windowed aggs; an unbounded `dropDuplicates` would grow state forever.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join (SURVEY T3; the streaming twin of the
    * oracle-checked q59): clicks inner-joined to purchases by the same user
    * within the next 10 minutes. Both branches are watermarked, and the
    * time-range condition is what lets Spark EVICT join state: a buffered
    * click can be dropped once the purchase-side watermark passes
    * click_ts + window. Without the range bound, stream-stream join state
    * grows forever — the same state-size story as the windowed aggs.
    * Works identically on a batch frame (watermark is a no-op there).
    */
  def conversionJoin(events: DataFrame, window: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") < col("click_ts") + expr(s"INTERVAL $window"))
      .select(col("click_id"), col("user_id"), col("click_ts"), col("p_ts"))
  }
}
