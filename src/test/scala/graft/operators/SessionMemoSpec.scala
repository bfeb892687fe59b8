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
}
