package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference pipeline is batch-only (SURVEY.md §2 Table B marks streaming
  * absent), so these are engine capabilities, not reference semantics: the
  * same declarative transforms run on a readStream frame — watermarked
  * tumbling/sliding window aggregation, streaming dedup, and custom session
  * state via flatMapGroupsWithState.
  */
object StreamOps {

  /** Watermarked tumbling-window counts per event_type. Late rows beyond
    * `lateness` are dropped by the watermark — at scale this bounds state. */
  def windowedCounts(events: DataFrame, windowLen: String = "10 minutes",
                     lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_cents"))

  /** Streaming exact dedup on event_id within the watermark horizon. Keyed on
    * event_id ALONE (dropDuplicatesWithinWatermark), so a replay carrying a
    * different ts is still dropped; state for ids older than the watermark is
    * evicted — bounded state at scale. */
  def dedupStream(events: DataFrame, lateness: String = "5 minutes"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream INTERVAL join — the streaming twin of the
    * batch band join (which `BandJoinRule` rewrites to a bucketed equi-join):
    * each left event pairs with the right events of the same user whose
    * timestamp falls in `(l_ts - bandSec, l_ts]`. Both sides carry
    * watermarks and the time-range condition is two explicit bounds on the
    * event-time columns, which is exactly what the engine needs to compute a
    * state-eviction horizon: right-side state older than
    * watermark - bandSec is dropped, so state stays bounded at scale
    * (an unbounded-condition stream join would grow state forever and is
    * rejected in append mode). Inputs need (user_id, ts, event_id) columns;
    * output is one row per in-band pair. */
  def intervalJoin(left: DataFrame, right: DataFrame, bandSec: Long,
                   lateness: String = "1 minute"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
        col("event_id").as("l_event"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_event"))
      .withWatermark("r_ts", lateness)
    l.join(r, col("l_user") === col("r_user") &&
      col("r_ts") <= col("l_ts") &&
      col("r_ts") > col("l_ts") - expr(s"INTERVAL $bandSec SECONDS"))
      .select(col("l_user").as("user_id"), col("l_event"), col("r_event"),
        col("l_ts"), col("r_ts"))
  }

  /** Built-in session windows: per-user gap-based sessions via the native
    * `session_window` aggregation (state managed by the engine; merging
    * windows handled internally). The declarative twin of [[sessionize]] —
    * use this when plain aggregates per session suffice; use
    * flatMapGroupsWithState when session state needs custom logic. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          lateness: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"))

  final case class SessionUpdate(user_id: Long, n_events: Long, start: Timestamp, end: Timestamp)
  // NOT private: the state encoder's generated code must see the constructor
  // (a private case class fails Janino compilation at runtime)
  final case class SessionState(n: Long, startMs: Long, endMs: Long)

  /** Custom keyed state: per-user sessions closed after `gapMs` of EVENT-TIME
    * silence — the streaming twin of q_sessionize_batch's lag()-gap rule.
    * A session normally closes when the watermark passes (last event + gap);
    * gaps VISIBLE inside one batch close immediately: the open session and
    * the incoming timestamps are folded as interval "atoms" in sorted order,
    * and every gap > gapMs between atoms emits a closed session right away —
    * so microbatch boundaries never merge two gap-separated sessions, and an
    * out-of-order (but within-watermark) event older than the open session's
    * start by more than the gap forms its own earlier session instead of
    * being merged forward. Replay/backfill batches therefore reproduce the
    * batch rule's sessions exactly, with ONE inherent append-mode caveat: an
    * event that arrives (within a nonzero-lateness watermark) AFTER the
    * session it belongs to was already emitted starts a new session rather
    * than reopening the emitted one — retraction does not exist in append
    * mode. The event-time timeout keeps the result a deterministic function
    * of the data (a processing-time timeout would not be), and the watermark
    * bounds state for idle users at scale. Emits one SessionUpdate per
    * closed session. `events` needs (user_id, ts) columns. */
  def sessionize(events: DataFrame, gapMs: Long,
                 lateness: String = "0 seconds"): Dataset[SessionUpdate] = {
    implicit val outEnc = Encoders.product[SessionUpdate]
    implicit val stateEnc = Encoders.product[SessionState]
    val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
    events
      .select(col("user_id").cast("long"), col("ts"))
      .withWatermark("ts", lateness)
      .as[(Long, Timestamp)](pairEnc)
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.n, new Timestamp(s.startMs), new Timestamp(s.endMs)))
          } else {
            // rows at/after the watermark only (Spark drops late input here).
            // Fold the open session AND the incoming events as interval
            // atoms in start order — the lag-gap rule generalized to
            // intervals. This also places a stray event more than gapMs
            // BEFORE the open session's start into its own earlier session
            // (merging it forward would diverge from the batch rule).
            val atoms = rows.map { case (_, t) =>
              SessionState(1L, t.getTime, t.getTime)
            }.toArray ++ state.getOption
            val closed = Seq.newBuilder[SessionUpdate]
            var cur: SessionState = null
            atoms.sortBy(a => (a.startMs, a.endMs)).foreach { a =>
              cur match {
                case null => cur = a
                case s if a.startMs > s.endMs + gapMs =>
                  closed += SessionUpdate(userId, s.n,
                    new Timestamp(s.startMs), new Timestamp(s.endMs))
                  cur = a
                case s =>
                  cur = SessionState(s.n + a.n, s.startMs, math.max(s.endMs, a.endMs))
              }
            }
            if (cur != null) {
              state.update(cur)
              // close when event time (the watermark) passes last-event + gap
              state.setTimeoutTimestamp(cur.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
