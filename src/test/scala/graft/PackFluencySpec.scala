package graft

/** Dual-implementation checks for the round-6 training-prep operators:
  * q153 GPT-style sequence packing (cross-chunk doc splits) and q154
  * bigram-LM fluency scoring — each re-derived by an independent
  * in-memory Scala implementation over the same sf0.001 corpus, so the
  * DuckDB oracle (cross-engine equality) and these specs (intended
  * semantics) fail independently. */
class PackFluencySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** (doc_id, source, tokens) with the engine's raw splitter (empties
    * KEPT — q74/q153 count split cells, not non-empty tokens). */
  private lazy val corpus: Seq[(Long, String, Array[String])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\W+", -1)))

  test("q153 spans equal an in-memory sequential pack, and chunks tile exactly") {
    val ctx = 256L
    val expect = corpus.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).flatMap { case (id, _, toks) =>
        val n = toks.length.toLong
        val st = cum; cum += n
        (st / ctx to (cum - 1) / ctx).map { c =>
          val s0 = math.max(st, c * ctx)
          val s1 = math.min(cum, (c + 1) * ctx)
          (src, c, id, s0 - st, s1 - s0, s0 - c * ctx)
        }
      }
    }.sortBy(t => (t._1, t._2, t._6, t._3))
    val got = run("q153_sequence_pack").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"\ngot    ${got.take(10)}\nexpect ${expect.take(10)}")

    // invariants a loader relies on: every chunk except each source's
    // last is EXACTLY ctx tokens, spans within a chunk are contiguous
    // from offset 0, and every doc's spans cover it without gaps
    got.groupBy(t => (t._1, t._2)).foreach { case ((src, c), spans) =>
      val lastChunk = got.filter(_._1 == src).map(_._2).max
      val tot = spans.map(_._5).sum
      assert(c == lastChunk || tot == ctx, s"$src chunk $c holds $tot tokens")
      val sorted = spans.sortBy(_._6)
      assert(sorted.head._6 == 0, s"$src chunk $c starts at ${sorted.head._6}")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 + a._5 == b._6, s"gap in $src chunk $c")
        case _         =>
      }
    }
    corpus.foreach { case (id, _, toks) =>
      val spans = got.filter(_._3 == id).sortBy(_._4)
      assert(spans.map(_._5).sum == toks.length.toLong, s"doc $id not fully covered")
      assert(spans.head._4 == 0L)
    }
  }

  test("q154 fluency equals an in-memory bigram LM scorer") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val biByDoc = corpus.map { case (id, _, toks) =>
      val ne = toks.filter(_.nonEmpty)
      id -> ne.zip(ne.drop(1)).toSeq
    }.toMap
    val allBi = biByDoc.values.flatten.toSeq
    val c12 = allBi.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    def p6(b: (String, String)) = 1000000L * c12(b) / c1(b._1)
    val expect = biByDoc.toSeq.filter(_._2.nonEmpty).map { case (id, bs) =>
      val ps = bs.map(p6)
      (id, ps.size.toLong, r6(ps.sum.toDouble / ps.size),
        ps.count(_ < 1000L).toLong)
    }.sortBy(_._1)
    val got = run("q154_bigram_fluency").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expect, s"\ngot    ${got.take(10)}\nexpect ${expect.take(10)}")
    // the filter signal is non-degenerate on the fixture corpus
    assert(expect.map(_._3).distinct.size > 1, "all docs scored identically")
  }
}
