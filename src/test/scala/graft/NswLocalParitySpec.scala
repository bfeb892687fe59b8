package graft

/** Parity gate for the round-13 broadcast-local NSW beam
  * (Similarity.nswBeamRoundsLocal): the serve dispatches to a
  * task-local beam against broadcast artifacts when the graph fits
  * under the node cap; forcing the cap to 0 (system property) routes
  * the SAME query through the distributed round loop. The two paths
  * must produce identical rows — every published column (scored,
  * dead_scored, hits, recall) derives from the per-round visited
  * frames, so row equality proves frame equality bit-for-bit.
  *
  * r14: extended to every nswBeamRounds call site (q223's
  * incrementally-built edges, q224's live-only rebuild, q225's
  * persistence round-trip reload all feed DISTINCT artifact shapes
  * through the same dispatch), and the local frontier comparator is
  * checked against Spark's own DoubleType sort semantics on
  * non-finite scores (a zero-norm vector scores NaN/±Inf). */
class NswLocalParitySpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  test("broadcast-local beam equals distributed round loop (all 5 serves)") {
    for (name <- Seq("q219_nsw_graph_recall", "q222_nsw_tombstone_serve",
        "q223_nsw_ingest", "q224_nsw_compacted_recall",
        "q225_nsw_index_persist")) {
      val local = rows(name)
      val dist =
        try { sys.props("graft.nsw.local.maxNodes") = "0"; rows(name) }
        finally sys.props -= "graft.nsw.local.maxNodes"
      assert(local.nonEmpty, s"$name returned no rows")
      assert(local == dist, s"$name diverged:\nlocal=$local\ndist=$dist")
    }
  }

  test("local frontier order matches Spark's (cosr DESC, cid ASC) on non-finite scores") {
    import spark.implicits._
    // every non-finite class a zero-norm query/corpus vector can
    // produce through cosr = dot / (na*nb): NaN (0/0), ±Inf (x/0),
    // plus signed zeros and ties — Spark treats NaN as LARGEST and
    // -0.0 == 0.0 (nanSafeCompareDoubles)
    val vals = Seq(
      (1L, Double.NaN), (2L, Double.PositiveInfinity), (3L, 1.0),
      (4L, 0.0), (5L, -0.0), (6L, -1.0), (7L, Double.NegativeInfinity),
      (8L, Double.NaN), (9L, 1.0), (10L, Double.PositiveInfinity))
    val sparkOrder = vals.toDF("cid", "cosr")
      .orderBy(org.apache.spark.sql.functions.col("cosr").desc,
        org.apache.spark.sql.functions.col("cid"))
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    val localOrder = vals.sortWith(graft.operators.Similarity.cosrDescIdAsc)
    assert(localOrder.map(_._1) == sparkOrder.map(_._1),
      s"comparator diverged from Spark:\nlocal=$localOrder\nspark=$sparkOrder")
  }

  test("malformed node-cap override degrades instead of failing the serve") {
    val out =
      try { sys.props("graft.nsw.local.maxNodes") = "not-a-number"; rows("q219_nsw_graph_recall") }
      finally sys.props -= "graft.nsw.local.maxNodes"
    assert(out.nonEmpty)
  }
}
