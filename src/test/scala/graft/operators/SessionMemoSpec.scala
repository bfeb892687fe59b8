package graft.operators

/** The memo's contract: one compute per (session, key), distinct keys
  * stay distinct — the property that makes memoizing components /
  * sqrtnIndex / pqTrained semantically transparent. */
class SessionMemoSpec extends graft.SparkSuite {

  test("computes once per (session, key) and never mixes keys") {
    var n = 0
    def mk(tag: String): String = { n += 1; s"$tag#$n" }
    val a1 = SessionMemo.get(spark, "memo-spec:a")(mk("a"))
    val a2 = SessionMemo.get(spark, "memo-spec:a")(mk("a"))
    val b1 = SessionMemo.get(spark, "memo-spec:b")(mk("b"))
    assert(a1 == "a#1" && (a2 eq a1), "second get must serve the cached instance")
    assert(b1 == "b#2", "a different key must compute fresh")
    assert(n == 2)
  }

  test("a second session gets its own entries") {
    val s2 = spark.newSession()
    var n = 0
    SessionMemo.get(spark, "memo-spec:c") { n += 1; "x" }
    SessionMemo.get(s2, "memo-spec:c") { n += 1; "y" }
    assert(n == 2, "sessions must not share memo entries")
  }

  test("racing callers converge on ONE instance (putIfAbsent, the pinning contract)") {
    // under a true race two computes may run, but every caller must
    // receive the single winning instance — a loser instance held by
    // its caller would miss pinnedRddIds and die under Bench's
    // unpersist sweep
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val callers = (1 to 8).map { i =>
      Future {
        gate.await()
        SessionMemo.get(spark, "memo-spec:race") {
          computes.incrementAndGet()
          new Object()
        }
      }
    }
    gate.countDown()
    val got = Await.result(Future.sequence(callers), 60.seconds)
    assert(got.forall(_ eq got.head),
      s"callers diverged onto ${got.distinct.size} instances (computes=${computes.get})")
  }

  test("pinnedRddIds surfaces the checkpoint RDDs of memoized frames (incl. tuples) so Bench's unpersist sweep spares them") {
    import spark.implicits._
    val df = SessionMemo.get(spark, "memo-spec:pinned") {
      Seq(1L, 2L, 3L).toDF("k").localCheckpoint(true)
    }
    val tup = SessionMemo.get(spark, "memo-spec:pinned-tuple") {
      (Seq(4L).toDF("k").localCheckpoint(true), 7L)
    }
    val pinned = SessionMemo.pinnedRddIds(spark)
    val persistent = spark.sparkContext.getPersistentRDDs.keySet
    val hits = pinned.intersect(persistent)
    assert(hits.size >= 2,
      s"both memoized checkpoints must be pinned AND persistent (pinned=$pinned persistent=$persistent)")
    // and the frames stay servable after a Bench-style sweep that spares them
    spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) => if (!pinned(id)) rdd.unpersist(false) }
    assert(df.count() == 3 && tup._1.count() == 1)
  }
}
