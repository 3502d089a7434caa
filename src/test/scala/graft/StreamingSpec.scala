package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Structured Streaming coverage: watermarked windowed aggregation with
  * late-data dropping, and streaming dedup — driven through MemoryStream →
  * memory sink, batch boundaries made explicit with processAllAvailable. */
class StreamingSpec extends AnyFunSuite with SharedSpark {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window counts; late rows beyond watermark dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = StreamOps.windowedCounts(events, windowLen = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("append").start()
    try {
      // batch 1: two rows in [10:00,10:10), one in [10:10,10:20)
      in.addData((1L, ts(1), 1L, "click", 1.0, "{}"), (2L, ts(2), 1L, "click", 2.0, "{}"),
        (3L, ts(11), 2L, "view", 3.0, "{}"))
      q.processAllAvailable()
      // batch 2: advance watermark far ahead (10:40) so earlier windows close
      in.addData((4L, ts(40), 3L, "view", 4.0, "{}"))
      q.processAllAvailable()
      // batch 3: a LATE row for the long-closed 10:00 window — must be dropped
      in.addData((5L, ts(3), 1L, "click", 8.0, "{}"))
      q.processAllAvailable()
      // batch 4: advance watermark again so the 10:40 window also closes
      in.addData((6L, ts(59), 3L, "view", 5.0, "{}"))
      q.processAllAvailable()

      val rows = spark.table("win_counts")
        .select("w_start", "event_type", "n", "sum_cents")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows.contains((ts(0), "click", 2L, 300L)),
        s"click window must have exactly the 2 on-time rows (late row dropped): $rows")
      assert(rows.contains((ts(10), "view", 1L, 300L)), rows.toString)
      assert(rows.contains((ts(40), "view", 1L, 400L)), rows.toString)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val events = in.toDF().toDF("event_id", "ts", "event_type")

    val q = StreamOps.dedupStream(events).writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      in.addData((1L, ts(1), "a"), (1L, ts(1), "a"), (2L, ts(2), "b"))
      q.processAllAvailable()
      // replays within the horizon: id 1 verbatim, id 2 with a DIFFERENT ts
      // (dedup is keyed on event_id alone, not the (event_id, ts) pair)
      in.addData((1L, ts(1), "a"), (2L, ts(4), "b"), (3L, ts(3), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"dedup failed: $ids")
    } finally q.stop()
  }

  test("built-in session_window aggregation matches the gap rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String): Timestamp = Timestamp.valueOf(s)
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")
    val q = StreamOps.sessionWindowCounts(events, gap = "30 minutes").writeStream
      .format("memory").queryName("sw_counts").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2nd session
      in.addData((1L, at("2024-01-01 10:00:00")), (1L, at("2024-01-01 10:10:00")))
      q.processAllAvailable()
      in.addData((1L, at("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData((2L, at("2024-01-01 14:00:00"))) // advances watermark past 12:30
      q.processAllAvailable()
      val rows = spark.table("sw_counts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
      assert(rows.contains((1L, at("2024-01-01 10:00:00"), 2L)),
        s"first session must have both events: $rows")
      assert(rows.contains((1L, at("2024-01-01 12:00:00"), 1L)),
        s"second session must be separate: $rows")
    } finally q.stop()
  }

  test("event-time sessionize: sessions close when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String): Timestamp = Timestamp.valueOf(s)
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")

    val q = StreamOps.sessionize(events, gapMs = 30L * 60 * 1000).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      def emitted() = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSet

      // batch 1: user 1 events at 10:00 and 10:10 (one open session);
      // watermark advances to 10:10 < 10:10+gap, so nothing closes
      in.addData((1L, at("2024-01-01 10:00:00")), (1L, at("2024-01-01 10:10:00")))
      q.processAllAvailable()
      assert(emitted().isEmpty, s"no session may close before the gap: ${emitted()}")
      // batch 2: user 2 at 11:00 advances the watermark past 10:40 -> user 1's
      // session closes (processAllAvailable includes the follow-up microbatch
      // Spark runs after a watermark change); user 2 (timeout 11:30) stays open
      in.addData((2L, at("2024-01-01 11:00:00")))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 2L, at("2024-01-01 10:00:00"), at("2024-01-01 10:10:00"))),
        s"user 1's 2-event session must close, user 2's must stay open: ${emitted()}")
      // batch 3: watermark 12:00 > 11:30 -> user 2 closes
      in.addData((3L, at("2024-01-01 12:00:00")))
      q.processAllAvailable()
      assert(emitted().contains((2L, 1L, at("2024-01-01 11:00:00"), at("2024-01-01 11:00:00"))),
        s"user 2's single-event session must close: ${emitted()}")

      // a SECOND session for user 1 after its first closed: fresh state
      in.addData((1L, at("2024-01-01 14:00:00")))
      q.processAllAvailable()
      in.addData((5L, at("2024-01-01 16:00:00"))) // watermark 16:00 > 14:30 -> closes
      q.processAllAvailable()
      assert(emitted().contains((1L, 1L, at("2024-01-01 14:00:00"), at("2024-01-01 14:00:00"))),
        s"user 1's second session must close independently: ${emitted()}")
    } finally q.stop()
  }

  test("sessionize: gap inside ONE microbatch splits sessions (replay/backfill)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String): Timestamp = Timestamp.valueOf(s)
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")

    val q = StreamOps.sessionize(events, gapMs = 30L * 60 * 1000).writeStream
      .format("memory").queryName("sessions_split").outputMode("append").start()
    try {
      def emitted() = spark.table("sessions_split")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSet

      // one batch carries THREE gap-separated sessions for user 7 (a backfill
      // shape): the two complete ones must close immediately — merging them
      // because they shared a microbatch would diverge from the batch rule
      in.addData(
        (7L, at("2024-01-01 08:00:00")), (7L, at("2024-01-01 08:10:00")),
        (7L, at("2024-01-01 10:00:00")),
        (7L, at("2024-01-01 12:00:00")), (7L, at("2024-01-01 12:05:00")))
      q.processAllAvailable()
      assert(emitted() == Set(
        (7L, 2L, at("2024-01-01 08:00:00"), at("2024-01-01 08:10:00")),
        (7L, 1L, at("2024-01-01 10:00:00"), at("2024-01-01 10:00:00"))),
        s"in-batch gaps must close all but the trailing session: ${emitted()}")

      // next batch: an event > gap after the OPEN session but before the
      // watermark passes its timeout — must close the 12:00 session, not merge
      in.addData((7L, at("2024-01-01 12:50:00")))
      q.processAllAvailable()
      assert(emitted().contains(
        (7L, 2L, at("2024-01-01 12:00:00"), at("2024-01-01 12:05:00"))),
        s"lagging-watermark arrival must still split on the gap: ${emitted()}")

      // the trailing session closes normally via the event-time timeout
      in.addData((8L, at("2024-01-01 15:00:00")))
      q.processAllAvailable()
      assert(emitted().contains(
        (7L, 1L, at("2024-01-01 12:50:00"), at("2024-01-01 12:50:00"))),
        s"trailing open session must close via watermark timeout: ${emitted()}")
    } finally q.stop()
  }

  test("sessionize: within-watermark stray BEFORE the open session splits too") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String): Timestamp = Timestamp.valueOf(s)
    val in = MemoryStream[(Long, Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")

    // nonzero lateness so an out-of-order arrival in a LATER microbatch can
    // still be above the watermark; the batch lag-gap rule would give it its
    // own earlier session — merging it forward into the open session (the
    // pre-round-4 behavior) diverged from that rule (ADVICE r3)
    val q = StreamOps.sessionize(events, gapMs = 30L * 60 * 1000,
        lateness = "3 hours").writeStream
      .format("memory").queryName("sessions_stray").outputMode("append").start()
    try {
      def emitted() = spark.table("sessions_stray")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSet

      in.addData((9L, at("2024-01-01 12:00:00"))) // open session [12:00]
      q.processAllAvailable()
      // 10:00 is >= the 09:00 watermark but more than the gap before the open
      // session's start: its own session, closed immediately (the open atom
      // right after it in the fold is > gap away)
      in.addData((9L, at("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(emitted() == Set((9L, 1L, at("2024-01-01 10:00:00"), at("2024-01-01 10:00:00"))),
        s"stray must form its own earlier session, not merge forward: ${emitted()}")
      // the open session survived untouched and closes on the watermark
      in.addData((10L, at("2024-01-01 16:00:00"))) // watermark 13:00 > 12:30
      q.processAllAvailable()
      assert(emitted().contains((9L, 1L, at("2024-01-01 12:00:00"), at("2024-01-01 12:00:00"))),
        s"open session must close unchanged: ${emitted()}")
    } finally q.stop()
  }

  test("stream-stream interval join pairs in-band events, bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Long, Timestamp, Long)]
    val r = MemoryStream[(Long, Timestamp, Long)]
    def ev(in: MemoryStream[(Long, Timestamp, Long)]) =
      in.toDF().toDF("event_id", "ts", "user_id")

    // 5-minute band: left at :10 pairs with right in (:05, :10]
    val q = StreamOps.intervalJoin(ev(l), ev(r), bandSec = 300, lateness = "1 minute")
      .writeStream.format("memory").queryName("band_join").outputMode("append").start()
    try {
      // user 1: rights at :06 (in band), :10 (boundary, in), :04 (out), :11 (after, out)
      r.addData((101L, ts(6), 1L), (102L, ts(10), 1L), (103L, ts(4), 1L), (104L, ts(11), 1L))
      // user 2: right in band but different user than the left event below
      r.addData((105L, ts(7), 2L))
      l.addData((201L, ts(10), 1L))
      q.processAllAvailable()
      // cross-batch: a later left event still pairs with earlier right state
      l.addData((202L, ts(12), 1L))
      q.processAllAvailable()
      val pairs = spark.table("band_join").select("l_event", "r_event")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(pairs == Set((201L, 101L), (201L, 102L), (202L, 102L), (202L, 104L)),
        s"in-band pairs wrong: $pairs")
      assert(spark.table("band_join").schema.fieldNames.sameElements(
        Seq("user_id", "l_event", "r_event", "l_ts", "r_ts")))
    } finally q.stop()
  }
}
