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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q84 equals an independent Scala re-derivation of the budget pack") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // reference: per source, md5(doc_id) order, cumsum of non-empty
    // token counts, keep docs that START inside the 3000-token budget
    val expected = docs
      .map { case (id, src, text) =>
        val ntok = text.toLowerCase(java.util.Locale.ROOT)
          .split("\\W+", -1).count(_.nonEmpty).toLong
        (src, md5hex(id.toString), id, ntok)
      }
      .groupBy(_._1).values.flatMap { rows =>
        var cum = 0L
        rows.toSeq.sortBy(_._2).flatMap { case (src, _, id, ntok) =>
          val start = cum; cum += ntok
          if (start < 3000L) Some((id, src, ntok, cum)) else None
        }
      }.toSet
    val got = run("q84_token_budget_pack").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
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

  test("q87 predictions equal an independent Scala k-NN majority vote") {
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), v, r.getInt(2))
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nrm = raw.map { case (id, v, _) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = raw.map { case (id, v, l) => id -> ((v, l)) }.toMap
    val expected = raw.filter(_._1 < 50).map { case (qid, qv, qlabel) =>
      val top5 = raw.filter(_._1 != qid)
        .map { case (cid, cv, clabel) =>
          (cid, clabel, r6(dot(qv, cv) / (nrm(qid) * nrm(cid))))
        }
        .sortBy { case (cid, _, cosr) => (-cosr, cid) }.take(5)
      val (predLabel, votes) = top5.groupBy(_._2).view
        .mapValues(_.size).toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      (qid, qlabel, predLabel, votes.toLong, qlabel == predLabel)
    }.toSet
    val got = run("q87_knn_label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
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
