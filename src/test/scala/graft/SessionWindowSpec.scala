package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Session-window streaming semantics (variable-length gap sessions). */
class SessionWindowSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  final case class UEv(ts: Timestamp, user_id: Long, value: Double)

  test("events within the gap merge into one session; a gap splits them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UEv]
    val q = StreamOps.sessionAgg(input.toDF(), gap = "10 minutes", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    input.addData(
      UEv(ts("2024-01-01 10:00:00"), 1L, 1.0),
      UEv(ts("2024-01-01 10:05:00"), 1L, 2.0),  // within gap -> same session
      UEv(ts("2024-01-01 10:30:00"), 1L, 4.0),  // 25 min later -> new session
      UEv(ts("2024-01-01 10:02:00"), 2L, 8.0))
    q.processAllAvailable()
    input.addData(UEv(ts("2024-01-01 12:00:00"), 9L, 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions")
      .select($"user_id", $"n", $"total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 2L, 3.0)), s"merged session missing: $rows")
    assert(rows.contains((1L, 1L, 4.0)), s"split session missing: $rows")
    assert(rows.contains((2L, 1L, 8.0)))
  }

  test("dedup chained into session windows: duplicates collapse, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UEv]
    val q = StreamOps.dedupedSessionAgg(input.toDF(),
        keyCols = Seq("user_id", "ts"), gap = "10 minutes",
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("dsessions")
      .outputMode("append").start()

    // identical per-epoch load: one user session of 3 events, each
    // event delivered TWICE (at-least-once replay), epochs 2 hours
    // apart (far past gap + watermark) so each epoch's state can be
    // fully evicted once the next epoch's watermark lands
    def epoch(hour: Int): Seq[UEv] = {
      val base = Seq(
        UEv(ts(f"2024-01-01 $hour%02d:00:00"), 1L, 1.0),
        UEv(ts(f"2024-01-01 $hour%02d:04:00"), 1L, 2.0),
        UEv(ts(f"2024-01-01 $hour%02d:08:00"), 1L, 4.0))
      base ++ base
    }
    val stateTotals = Seq(10, 12, 14, 16).map { h =>
      input.addData(epoch(h): _*)
      q.processAllAvailable()
      // advance the watermark past this epoch's sessions
      input.addData(UEv(ts(f"2024-01-01 ${h + 1}%02d:30:00"), 99L, 0.0))
      q.processAllAvailable()
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    q.stop()

    // duplicates collapsed: each epoch's user-1 session is (n=3, 7.0),
    // never n=6
    val sessions = spark.table("dsessions").where($"user_id" === 1L)
      .select($"n", $"total_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(sessions.length == 4, sessions.toSeq)
    assert(sessions.forall(_ == (3L, 7.0)), sessions.toSeq)

    // bounded state across >= 3 watermark advances: per-epoch load is
    // identical, so total state rows must not trend upward (evicted
    // dedup keys + finalized sessions leave; only the horizon's worth
    // stays). Allow the small constant wobble of the advancer rows.
    assert(stateTotals.last <= stateTotals.head + 2,
      s"state grew across epochs: $stateTotals")
  }
}
