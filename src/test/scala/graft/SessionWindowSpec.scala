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
}
