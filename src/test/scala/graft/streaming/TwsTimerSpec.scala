package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time timer behavior of [[Tws.SessionTimeoutProcessor]] that the
  * one-batch Verify oracle cannot see: timers fire in the no-data batch
  * after the watermark advances, an extended session RETRACTS its old
  * timer (no double-close), and the fire predicate is NON-STRICT
  * (expiry_ms <= watermark_ms — an expiry exactly at the watermark
  * fires; measured, not assumed). The µs/ms floor arithmetic pinned
  * here is what the st17 DuckDB twin replays. */
class TwsTimerSpec extends SparkSpec {

  private val gapMs = 60000L // 1 min session gap

  private def ts(hms: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hms")

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  test("event-time timers: gap-close inline, timer-close on watermark, " +
      "retraction on extension, strict boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tws.SessionEvent]
    Tws.withRocksDb(spark) {
      val q = Tws.sessionTimeout(
          mem.toDS().withWatermark("ts", "0 seconds"), gapMs).toDF()
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        def rows(): Set[(Long, Long, Long, Long, String)] =
          spark.table("tws_sessions")
            .as[Tws.Session].collect()
            .map(s => (s.user_id, s.start_us, s.end_us, s.cnt,
              s.closed_by)).toSet

        // batch 1 — u1: two events 30 s apart (one open session);
        // u2: events 2 min apart (> gap → first closes INLINE, second
        // stays open with a timer at 10:03:00)
        mem.addData(
          Tws.SessionEvent(1, ts("10:00:00")),
          Tws.SessionEvent(1, ts("10:00:30")),
          Tws.SessionEvent(2, ts("10:00:00")),
          Tws.SessionEvent(2, ts("10:02:00")))
        q.processAllAvailable()
        // watermark after batch 1 = 10:02:00; the no-data batch fires
        // u1's timer (10:01:30 < wm) but not u2's (10:03:00 > wm)
        assert(rows() == Set(
          (1L, us(ts("10:00:00")), us(ts("10:00:30")), 2L, "timer"),
          (2L, us(ts("10:00:00")), us(ts("10:00:00")), 1L, "gap")),
          "u1 timer-closed by the no-data batch; u2 head gap-closed")

        // batch 2 — u2 extends its open session (10:02:30, within gap):
        // the 10:03:00 timer must be RETRACTED and moved to 10:03:30.
        // u3's lone event puts the new watermark AT exactly 10:03:30 —
        // the boundary pins strictness: expiry == wm FIRES (non-strict),
        // and the fired row must be the MERGED 2-event session, proving
        // the stale 10:03:00 timer was retracted (a stale fire would
        // have closed the session early with the pre-extension shape)
        mem.addData(
          Tws.SessionEvent(2, ts("10:02:30")),
          Tws.SessionEvent(3, ts("10:03:30")))
        q.processAllAvailable()
        assert(rows().filterNot(_._5 == "gap") == Set(
          (1L, us(ts("10:00:00")), us(ts("10:00:30")), 2L, "timer"),
          (2L, us(ts("10:02:00")), us(ts("10:02:30")), 2L, "timer")),
          "expiry==watermark fires with the merged (retracted-and-" +
            "moved) session, exactly once")

        // batch 3 — a far-future sentinel pushes the watermark past
        // everything pending: u3's singleton timer-closes; the
        // sentinel's own session stays open
        mem.addData(Tws.SessionEvent(4, ts("10:10:00")))
        q.processAllAvailable()
        assert(rows() == Set(
          (1L, us(ts("10:00:00")), us(ts("10:00:30")), 2L, "timer"),
          (2L, us(ts("10:00:00")), us(ts("10:00:00")), 1L, "gap"),
          (2L, us(ts("10:02:00")), us(ts("10:02:30")), 2L, "timer"),
          (3L, us(ts("10:03:30")), us(ts("10:03:30")), 1L, "timer")),
          "all pending sessions close once the watermark passes; the " +
            "sentinel's own session never emits")
      } finally q.stop()
    }
  }
}
