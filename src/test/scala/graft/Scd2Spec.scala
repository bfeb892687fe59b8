package graft

import org.apache.spark.sql.Row

/** Dual-implementation check for q155's SCD-2 history build: an
  * independent in-memory fold over the same sf0.001 events re-derives
  * the versioned validity intervals. */
class Scd2Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q155 history equals an in-memory SCD-2 fold, and intervals chain correctly") {
    val ev = graft.operators.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type")
      .collect().toSeq
      .map { case Row(u: Long, e: Long, us: Long, t: String) => (u, e, us, t) }
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(x => (x._3, x._2))
      // collapse consecutive duplicate states, then build intervals
      val changes = ordered.foldLeft(Vector.empty[(Long, String)]) { (acc, x) =>
        if (acc.nonEmpty && acc.last._2 == x._4) acc else acc :+ (x._3, x._4)
      }
      changes.zipWithIndex.map { case ((from, state), i) =>
        val to = if (i + 1 < changes.size) Some(changes(i + 1)._1) else None
        (u, i + 1, state, from, to, to.isEmpty)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q155_scd2_history")(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    assert(got == expect, s"\ngot    ${got.take(8)}\nexpect ${expect.take(8)}")

    // structural invariants a consumer relies on: versions are 1..k
    // per user, exactly one current row per user, intervals chain
    // (valid_to == next valid_from), and no zero-length or
    // same-state-adjacent versions
    got.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.size), s"user $u versions")
      assert(sorted.count(_._6) == 1 && sorted.last._6, s"user $u current flag")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"user $u interval chain broken")
          assert(a._3 != b._3, s"user $u adjacent versions share a state")
        case _ =>
      }
    }
  }

  test("q161 point-in-time join: complete, leakage-free, and transition events see their NEW state") {
    val ev = graft.operators.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS us", "event_type")
      .collect().toSeq
      .map { case Row(e: Long, u: Long, us: Long, t: String) => (e, u, us, t) }
    val got = SparkEntry.queries("q161_pit_join")(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getInt(5)))

    // completeness: every event enriched exactly once
    assert(got.size == ev.size, s"${got.size} enriched rows for ${ev.size} events")
    assert(got.map(_._1).distinct.size == got.size, "an event matched two versions")

    // the temporal-correctness reference: per user, derive the change
    // list, then the in-effect state at an event is the LAST change
    // at-or-before its timestamp — including a later change at the
    // SAME instant (two transitions at one timestamp leave an empty
    // [t, t) interval; the final state of the instant governs it).
    // The transition event sees the state it just opened — never the
    // previous one, never a future one: the leakage property.
    val inEffect = ev.groupBy(_._2).flatMap { case (_, es) =>
      val ordered = es.sortBy(x => (x._3, x._1))
      val changes = ordered.foldLeft(Vector.empty[(Long, String)]) { (acc, x) =>
        if (acc.nonEmpty && acc.last._2 == x._4) acc else acc :+ ((x._3, x._4))
      }
      ordered.map(e => e._1 -> changes.takeWhile(_._1 <= e._3).last._2)
    }
    got.foreach { case (eid, _, _, _, state, _) =>
      assert(state == inEffect(eid), s"event $eid enriched with wrong-era state")
    }
  }

  test("q165 features are leakage-free: post-cutoff events invisible, post-cutoff-only users absent") {
    import spark.implicits._
    import java.nio.file.Files
    import java.sql.Timestamp
    val day = 86400000L // ms
    val dayUs = 86400000000L
    def ts(d: Int) = new Timestamp(d.toLong * day)
    // max ts = day 100 -> cutoff = day 93
    val rows = Seq(
      (1L, ts(60), 10L, "click", 1.0, "{}"),     // old history
      (2L, ts(92), 10L, "view", 2.0, "{}"),      // inside both windows
      (3L, ts(95), 10L, "purchase", 100.0, "{}"),// POST-cutoff leakage bait
      (4L, ts(100), 20L, "click", 5.0, "{}"),    // sets max ts; user 20 has NO pre-cutoff history
      (5L, ts(93), 30L, "view", 3.0, "{}"))      // exactly AT the cutoff: included
    val d = Files.createTempDirectory("feat").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q165_feature_snapshot")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    // the user who did not exist at the cutoff is absent
    assert(!got.contains(20L), s"post-cutoff-only user materialized: $got")
    // user 10: the day-95 purchase must be INVISIBLE everywhere —
    // counts, value sum, recency, and last action
    assert(got(10L) == ((2L, 1L, 1L, 2.0, 92L * dayUs, 1L, "view")), got(10L))
    // user 30's at-cutoff event is included (<=), idle 0 days
    assert(got(30L) == ((1L, 1L, 1L, 3.0, 93L * dayUs, 0L, "view")), got(30L))
  }

  test("q174 next-event pairs equal an in-memory sliding-window recount") {
    val ev = graft.operators.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type")
      .collect().toSeq
      .map { case Row(u: Long, e: Long, us: Long, t: String) => (u, e, us, t) }
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val types = es.sortBy(x => (x._3, x._2)).map(_._4)
      types.sliding(4).filter(_.size == 4).map(w =>
        (w.take(3).mkString(" > "), w.last))
    }
    val expect = pairs.groupBy(identity).map { case ((c, nx), xs) => (c, nx, xs.size.toLong) }
      .toSeq.sortBy { case (c, nx, n) => (-n, c, nx) }.take(20)
    val got = SparkEntry.queries("q174_event_lm_dataset")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expect, s"\ngot    ${got.take(8)}\nexpect ${expect.take(8)}")
  }
}
