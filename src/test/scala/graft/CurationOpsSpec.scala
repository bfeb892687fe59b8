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

  test("q115 redaction chain leaves no residual PII match on the shipped chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.CurationOps
    // Exactly the shipped chain (shared helper), applied to the same
    // augmented column the query builds — after redaction, every PII
    // pattern must have ZERO remaining matches, and each placeholder
    // must appear (each doc gets one of each kind injected).
    val aug = graft.operators.Tables.documents(spark, dir)
      .withColumn("aug", concat(
        expr("substr(text, 1, 40)"), lit(" reach "), $"source", lit("_"),
        $"doc_id".cast("string"), lit("@example.com or 555-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"), lit(" from 10."),
        ($"doc_id" % 256).cast("string"), lit(".0."),
        expr("(doc_id div 7) % 256").cast("string"), lit(" "),
        expr("substr(text, 41)")))
      .withColumn("redacted", CurationOps.piiRedacted($"aug"))
    val residual = CurationOps.piiPatterns.map { case (pat, _) =>
      sum(size(regexp_extract_all($"redacted", lit(pat), lit(0))))
    }
    val missingTag = CurationOps.piiPatterns.map { case (_, tag) =>
      sum(when(!$"redacted".contains(tag), 1L).otherwise(0L))
    }
    val row = aug.agg(residual.head, (residual.tail ++ missingTag): _*).head()
    (0 until 3).foreach(i => assert(row.getLong(i) == 0L, s"residual matches for ${CurationOps.piiPatterns(i)._1}"))
    (3 until 6).foreach(i => assert(row.getLong(i) == 0L, s"docs missing ${CurationOps.piiPatterns(i - 3)._2}"))
    // and the registry aggregate tags every doc at least once per kind
    val out = run("q115_pii_redact").collect()
    out.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) >= n && r.getLong(3) >= n && r.getLong(4) >= n, r.toString)
    }
  }

  test("q116 winnowing guarantees a shared fingerprint for a shared 6-token run") {
    import spark.implicits._
    import graft.operators.CurationOps
    // Schleimer et al. §2: with k=3, w=4 any common substring of
    // k+w-1 = 6 tokens contributes at least one common fingerprint.
    // Two docs share exactly one 6-token run amid disjoint junk.
    val shared = "quick brown foxes jump over walls"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta eta theta"),
      (2L, s"one two three four five six $shared seven eight nine ten"),
      (3L, "totally unrelated words with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val fps = CurationOps.winnowFps(docs).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs must not share fingerprints")
    // pairs on real data: shared >= 3, overlap in (0, 1]
    run("q116_winnow_overlap").collect().foreach { r =>
      assert(r.getLong(2) >= 3L, r.toString)
      val ov = r.getDouble(3)
      assert(ov > 0.0 && ov <= 1.0, r.toString)
    }
  }

  test("q117 scores equal an independent Scala unigram re-derivation") {
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("\\W+").filter(_.nonEmpty).toSeq).toMap
    val freq = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = freq.values.sum
    val vocab = freq.size.toLong
    // Spark's round(double, 6) rounds the double's shortest-decimal
    // form HALF_UP, and davg divides in IEEE doubles — replicate both.
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("q117_unigram_rarity").collect()
    assert(got.length == docs.count(_._2.nonEmpty))
    got.foreach { r =>
      val toks = docs(r.getLong(0))
      val cs = toks.map(freq)
      assert(r.getLong(1) == toks.size.toLong, s"n_toks ${r.toString}")
      assert(r.getLong(2) == cs.min, s"min_freq ${r.toString}")
      assert(r.getDouble(3) == r6(cs.sum.toDouble / cs.size), s"mean_freq ${r.toString}")
      val rare = cs.count(c => c * 2 * vocab < total)
      assert(r.getDouble(4) == r6(rare.toDouble / cs.size), s"rare_ratio ${r.toString}")
    }
  }

  test("q119 equals an independent Scala re-derivation of span coverage") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // mirror Spark's split(lower(text), '\\W+') — limit -1 KEEPS
    // trailing empty tokens (the q84 precedent), and they are part of
    // the segment text here
    val segs = docs.flatMap { case (id, src, text) =>
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\W+", -1)
      val n = (toks.length + 7) / 8
      (0 until n).map { i =>
        (id, src, md5hex(toks.slice(i * 8, i * 8 + 8).mkString(" ")).take(16))
      }
    }
    val occ = segs.groupBy(_._3).view.mapValues(_.length).toMap
    val perDoc = segs.groupBy(s => (s._1, s._2)).map { case ((id, src), ss) =>
      (id, src, ss.length.toLong, ss.count(x => occ(x._3) > 1).toLong)
    }.toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = perDoc.groupBy(_._2).map { case (src, ds) =>
      val total = ds.map(_._3).sum
      val dup = ds.map(_._4).sum
      (src, ds.size.toLong, total, dup, r6(dup.toDouble / total),
        ds.count(d => d._4 * 2 >= d._3).toLong)
    }.toSet
    val got = run("q119_dup_span_coverage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q122 equals an independent Scala OOV re-derivation") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq))
    val cf = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val vocab = cf.toSeq.sortBy { case (t, n) => (-n, t) }.take(1000).map(_._1).toSet
    val expected = docs.map { case (id, toks) =>
      val nTok = toks.size.toLong
      val nOov = toks.count(t => !vocab(t)).toLong
      (id, nTok, nOov, if (nTok == 0) 0.0 else r6(nOov.toDouble / nTok))
    }.toSet
    val got = run("q122_oov_rate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // sanity of the signal itself: rates live in [0,1] and the corpus
    // contains at least one doc with OOV mass when |vocab| was capped
    got.foreach { case (id, _, _, rate) =>
      assert(rate >= 0.0 && rate <= 1.0, s"doc $id rate $rate") }
    if (cf.size > 1000) assert(got.exists(_._3 > 0L))
  }

  test("q127 novelty equals a first-occurrence re-derivation; opening bucket is all-new") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (bucket, gram) pairs via the engine's gram kernel, RAW strings
    val bsh = graft.operators.Tables.documents(spark, dir)
      .withColumn("toks", split(lower($"text"), "\\W+"))
      .withColumn("s", explode(expr(graft.operators.Dedup.gramArraySql(3))))
      .select(expr("doc_id DIV 100").as("bucket"), $"s")
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val first = bsh.groupBy(_._2).map { case (s, v) => (s, v.map(_._1).min) }
    val expected = bsh.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, rows) =>
      val nNew = rows.count { case (_, s) => first(s) == b }
      (b, rows.length.toLong, nNew.toLong, r6(nNew.toDouble / rows.length))
    }
    val got = run("q127_novelty_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    // laws: the earliest bucket is 100% novel; every distinct gram is
    // new in exactly one bucket
    assert(got.head._4 == 1.0)
    assert(got.map(_._3).sum == first.size.toLong)
  }

  test("q129 rank blend equals a Scala rank-sum over raw metrics") {
    val raw = graft.operators.Tables.documents(spark, dir)
      .select("source", "doc_id", "n_chars", "text").collect()
      .map { r =>
        val toks = r.getString(3).toLowerCase.split("\\W+").filter(_.nonEmpty)
        (r.getString(0), r.getLong(1), r.getLong(2),
          toks.length.toLong, toks.distinct.length.toLong)
      }
    def ranks(rows: Array[(String, Long, Long, Long, Long)], metric: ((String, Long, Long, Long, Long)) => Long) =
      rows.sortBy(t => (-metric(t), t._2)).zipWithIndex
        .map { case (t, i) => t._2 -> (i + 1) }.toMap
    val expected = raw.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, rows) =>
      val rLen = ranks(rows, _._3); val rTok = ranks(rows, _._4); val rDiv = ranks(rows, _._5)
      rows.map(t => (t._2, rLen(t._2), rTok(t._2), rDiv(t._2),
          (rLen(t._2) + rTok(t._2) + rDiv(t._2)).toLong))
        .sortBy(t => (t._5, t._1)).take(10).zipWithIndex
        .map { case ((id, r1, r2, r3, bl), i) => (src, id, r1, r2, r3, bl, i + 1) }
    }
    val got = run("q129_rank_blend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getInt(6))).toSeq
    assert(got == expected, s"got=${got.take(2)} expected=${expected.take(2)}")
  }
}
