package graft

import org.apache.spark.sql.Row

/** Invariant + dual-implementation checks for the round-3 curation
  * operators (q80–q88) — complements the DuckDB oracle (which proves
  * cross-engine equality) with checks that the SEMANTICS are the
  * intended ones. */
class CurationOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q85 sketches equal an independent Scala fold over the raw embeddings") {
    val got = run("q85_sign_sketch").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    raw.foreach { case Row(id: Long, emb: scala.collection.Seq[_]) =>
      val ref = emb.asInstanceOf[scala.collection.Seq[Float]].take(63).zipWithIndex
        .foldLeft(0L) { case (acc, (x, j)) => if (x > 0f) acc | (1L << j) else acc }
      assert(got(id) == ref, s"vec $id: got ${got(id)}, reference $ref")
    }
    assert(got.size == raw.length)
  }

  test("q80 keeps each distinct segment exactly once corpus-wide") {
    val out = run("q80_segment_dedup").collect()
    // every doc appears, totals are sane
    out.foreach { r =>
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept >= 0 && kept <= total, r.toString)
    }
    // sum of kept segments == number of DISTINCT segments in the corpus
    // (keep-first retains exactly one occurrence per distinct segment)
    val keptSum = out.map(_.getLong(2)).sum
    import spark.implicits._
    val distinctSegs = graft.operators.Tables.documents(spark, dir)
      .select($"doc_id", org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lower($"text"), "\\W+").as("toks"))
      .selectExpr(
        """explode(transform(sequence(0, CAST((size(toks) + 7) div 8 AS INT) - 1),
             i -> concat_ws(' ', slice(toks, i * 8 + 1, 8)))) AS chunk""")
      .distinct().count()
    assert(keptSum == distinctSegs, s"kept $keptSum vs distinct $distinctSegs")
  }

  test("q81 covers every non-benchmark doc and levels agree with shares") {
    val out = run("q81_contamination_levels").collect()
    val nonBench = graft.operators.Tables.documents(spark, dir)
      .filter("source <> 'src0'").count()
    assert(out.length == nonBench, s"${out.length} rows for $nonBench docs")
    out.foreach { r =>
      val (hits, share, level) = (r.getLong(2), r.getDouble(3), r.getString(4))
      val expected = if (hits == 0) "clean" else if (share < 0.1) "low" else "high"
      assert(level == expected, r.toString)
      assert(share >= 0.0 && share <= 1.0, r.toString)
    }
  }

  test("q84 never starts a doc past its source budget") {
    run("q84_token_budget_pack").collect().foreach { r =>
      val (ntok, cum) = (r.getLong(2), r.getLong(3))
      assert(cum - ntok < 3000L, r.toString)
    }
  }

  test("q86 pairs respect the hamming threshold and the sketch they claim") {
    val sk = run("q85_sign_sketch").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    run("q86_sign_dup_pairs").collect().foreach { r =>
      val (ida, idb, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(ida < idb, r.toString)
      assert(h == java.lang.Long.bitCount(sk(ida) ^ sk(idb)), r.toString)
      assert(h <= 16, r.toString)
    }
  }

  test("q87 predictions are the deterministic majority of the top-5 neighbors") {
    run("q87_knn_label").collect().foreach { r =>
      val (label, pred, votes, agree) =
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))
      assert(votes >= 1L && votes <= 5L, r.toString)
      assert(agree == (label == pred), r.toString)
    }
  }

  test("q88 funnel is monotone per source and totals match the corpus") {
    val out = run("q88_curation_funnel").collect()
    out.foreach { r =>
      val (n, e, c, q) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= e && e >= c && c >= q && q >= 0, r.toString)
    }
    val total = out.map(_.getLong(1)).sum
    assert(total == graft.operators.Tables.documents(spark, dir).count())
  }
}
