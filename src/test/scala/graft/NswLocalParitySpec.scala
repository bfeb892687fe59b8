package graft

/** Parity gate for the round-13 broadcast-local NSW beam
  * (Similarity.nswBeamRoundsLocal): the serve dispatches to a
  * task-local beam against broadcast artifacts when the graph fits
  * under the node cap; forcing the cap to 0 (system property) routes
  * the SAME query through the distributed round loop. The two paths
  * must produce identical rows — every published column (scored,
  * dead_scored, hits, recall) derives from the per-round visited
  * frames, so row equality proves frame equality bit-for-bit. */
class NswLocalParitySpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  test("q219/q222 broadcast-local beam equals distributed round loop") {
    for (name <- Seq("q219_nsw_graph_recall", "q222_nsw_tombstone_serve")) {
      val local = rows(name)
      val dist =
        try { sys.props("graft.nsw.local.maxNodes") = "0"; rows(name) }
        finally sys.props -= "graft.nsw.local.maxNodes"
      assert(local.nonEmpty, s"$name returned no rows")
      assert(local == dist, s"$name diverged:\nlocal=$local\ndist=$dist")
    }
  }
}
