package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the event-time-exact streaming twin of the
  * batch as-of join ([[graft.plans.AsOfJoin]] / q99): every purchase is
  * matched to the user's latest click at-or-before it, emitted as soon as
  * the WATERMARK proves no earlier click can still arrive.
  *
  * Why not a stream-stream join: Spark's stream-stream join supports
  * range predicates (see [[EventStreams.conversionJoin]]) but not
  * "greatest ts <=" argmax semantics — a purchase would emit one row per
  * qualifying click. The exact as-of needs per-key state:
  * `flatMapGroupsWithState` keyed by user, holding (a) pending purchases
  * the watermark has not yet passed and (b) a COMPACTED click history —
  * every click newer than the watermark plus at most ONE older click (the
  * latest at-or-before it; older clicks can never be the as-of match of
  * any future purchase, which the watermark guarantees is no older than
  * the watermark itself).
  *
  * State bounds — stated exactly: pending purchases and un-compacted
  * clicks are bounded by the in-flight watermark window, but the ONE
  * compacted click per user is irreducible state for an UNBOUNDED-lookback
  * as-of — a user's next purchase, arbitrarily far in the future, may
  * match their last click ever. So without `lookback`, state is O(1) per
  * user ever seen (exactly what the batch join's semantics require); with
  * `lookback = Some(horizon)` the match is REQUIRED to satisfy
  * `purchase_ts - click_ts <= horizon` (the batch `tolerance`), and every
  * click is evicted once the watermark passes `click_ts + horizon` — state
  * then really is bounded by the in-flight window and idle users drain to
  * zero via an event-time timeout.
  *
  * Emission is deterministic under ANY micro-batch slicing: a purchase
  * emits exactly when the watermark STRICTLY passes its event time. The
  * strict comparison matters at the boundary: Spark's late-data filter
  * only drops rows strictly older than the watermark, so a click with
  * ts == watermark == purchase ts can still arrive and be the match —
  * emitting at `ts == watermark` would lose it (round-5 advice).
  */
object AsOfStream {

  /** Input event. `ts` stays TimestampType end-to-end: the watermark rides
    * this column, and projecting it away before the stateful operator
    * would strip the event-time-timeout eligibility.
    */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String,
                      event_id: Long, value: Double) {
    /** exact epoch-µs (Timestamp carries ms in getTime + sub-ms in nanos) */
    def tsUs: Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  }

  /** Enriched purchase — q99's row shape. */
  final case class Enriched(event_id: Long, user_id: Long, ts_us: Long,
                            click_ts_us: Long, click_value: Double, gap_us: Long)

  /** Per-user state: compacted clicks + purchases awaiting the watermark. */
  final case class UserState(clicks: List[(Long, Double)],
                             pending: List[(Long, Long)]) // (event_id, ts_us)

  private[graft] def foldUser(
      user: Long, rows: Iterator[Ev],
      state: GroupState[UserState],
      lookbackUs: Option[Long] = None): Iterator[Enriched] = {
    val st = state.getOption.getOrElse(UserState(Nil, Nil))
    val incoming = rows.toSeq
    val clicks = (st.clicks ++ incoming.filter(_.event_type == "click")
      .map(e => (e.tsUs, e.value))).sortBy(_._1)
    val pending = st.pending ++ incoming.filter(_.event_type == "purchase")
      .map(e => (e.event_id, e.tsUs))
    val wUs = state.getCurrentWatermarkMs() * 1000L
    // STRICT <: a click with ts == watermark is not late yet and could
    // still be the match of a purchase at the same instant
    val (ready, waiting) = pending.partition(_._2 < wUs)
    val out = ready.sortBy(p => (p._2, p._1)).flatMap { case (eid, pts) =>
      clicks.filter(c => c._1 <= pts && lookbackUs.forall(pts - c._1 <= _))
        .lastOption.map { case (cts, cv) =>
          Enriched(eid, user, pts, cts, cv, pts - cts)
        }
    }
    // compact: clicks strictly older than the watermark collapse to the
    // latest one — it is the only candidate a future (ts >= watermark)
    // purchase can take from that range; under a lookback horizon even
    // that click dies once no future purchase can reach back to it
    val keptClicks =
      (clicks.filter(_._1 < wUs).lastOption.toList ++ clicks.filter(_._1 >= wUs))
        .filter(c => lookbackUs.forall(h => c._1 + h >= wUs))
    if (keptClicks.isEmpty && waiting.isEmpty) state.remove()
    else {
      state.update(UserState(keptClicks, waiting))
      // wake this key when the watermark strictly passes its oldest
      // pending purchase — and, under a lookback horizon, when the last
      // click expires — even if no further events arrive for the user
      val purchaseWake = waiting.map(_._2).minOption
      val clickExpiry = lookbackUs.flatMap(h => keptClicks.map(_._1 + h).maxOption)
      val wake = (purchaseWake.toList ++ clickExpiry.toList).minOption
      wake.foreach(w => state.setTimeoutTimestamp(w / 1000L + 1L))
    }
    out.iterator
  }

  /** Micros in an interval literal like "1 hour" / "30 minutes" (no
    * month component — months have no fixed micro length).
    */
  private def intervalUs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"month-based horizon not supported: $s")
    iv.days * 86400000000L + iv.microseconds
  }

  /** Wire the fold over a watermarked event stream (`ts` TimestampType).
    * `delay` is the lateness horizon: events later than it are dropped by
    * the watermark, exactly as in the windowed aggregations. `lookback`,
    * when set, bounds how far back a purchase may match (the batch join's
    * `tolerance`) AND therefore bounds state: clicks older than the
    * watermark minus the lookback are evicted, so idle users' state drains
    * to nothing instead of retaining one compacted click forever.
    */
  def enrich(spark: SparkSession, events: DataFrame,
             delay: String = "1 hour",
             lookback: Option[String] = None): Dataset[Enriched] = {
    import spark.implicits._
    val lookbackUs = lookback.map(intervalUs)
    events.withWatermark("ts", delay)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"),
        col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserState]) =>
          foldUser(user, rows, state, lookbackUs)
      }
  }
}
