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
  * newer than the watermark and (b) a COMPACTED click history — every
  * click newer than the watermark plus at most ONE older click (the
  * latest at-or-before it; older clicks can never be the as-of match of
  * any future purchase, whose ts must exceed the watermark). State per
  * user is therefore bounded by the in-flight window, not the stream
  * history — the same eviction argument as streaming dedup's
  * watermark-bounded index.
  *
  * Emission is deterministic under ANY micro-batch slicing: a purchase
  * emits exactly when the watermark passes its event time (late clicks
  * at-or-before it are impossible from then on), driven by an event-time
  * timeout when no new events arrive for the key.
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
      state: GroupState[UserState]): Iterator[Enriched] = {
    val st = state.getOption.getOrElse(UserState(Nil, Nil))
    val incoming = rows.toSeq
    val clicks = (st.clicks ++ incoming.filter(_.event_type == "click")
      .map(e => (e.tsUs, e.value))).sortBy(_._1)
    val pending = st.pending ++ incoming.filter(_.event_type == "purchase")
      .map(e => (e.event_id, e.tsUs))
    val wUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, waiting) = pending.partition(_._2 <= wUs)
    val out = ready.sortBy(p => (p._2, p._1)).flatMap { case (eid, pts) =>
      clicks.filter(_._1 <= pts).lastOption.map { case (cts, cv) =>
        Enriched(eid, user, pts, cts, cv, pts - cts)
      }
    }
    // compact: clicks at-or-before the watermark collapse to the latest
    // one — it is the only candidate a future (ts > watermark) purchase
    // can take from that range
    val keptClicks =
      clicks.filter(_._1 <= wUs).lastOption.toList ++ clicks.filter(_._1 > wUs)
    if (keptClicks.isEmpty && waiting.isEmpty) state.remove()
    else {
      state.update(UserState(keptClicks, waiting))
      // wake this key when the watermark passes its oldest pending
      // purchase, even if no further events arrive for the user
      if (waiting.nonEmpty)
        state.setTimeoutTimestamp(waiting.map(_._2).min / 1000L + 1L)
    }
    out.iterator
  }

  /** Wire the fold over a watermarked event stream (`ts` TimestampType).
    * `delay` is the lateness horizon: events later than it are dropped by
    * the watermark, exactly as in the windowed aggregations.
    */
  def enrich(spark: SparkSession, events: DataFrame,
             delay: String = "1 hour"): Dataset[Enriched] = {
    import spark.implicits._
    events.withWatermark("ts", delay)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"),
        col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(foldUser)
  }
}
