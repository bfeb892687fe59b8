package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the corpus-curation operators' contracts: short-doc routing,
  * repetition-signal values, decontamination flagging, and the exact
  * equivalence of q72's two-phase top-K to a plain single window. */
class TrainingOpsSpec extends SparkSuite {

  /** Miniature documents table: a repetitive doc, a clean doc, short
    * docs, and a benchmark/corpus 5-gram overlap pair. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("trainingdocs").toString
    val repetitive = "spam ham spam ham spam ham spam ham spam ham"
    val clean = (1 to 10).map(i => s"w$i").mkString(" ")
    val benchDoc = "alpha beta gamma delta epsilon zeta eta"
    val contaminatedDoc = "intro alpha beta gamma delta epsilon outro end"
    Seq(
      (1L, repetitive, "en", "src0", repetitive.length.toLong),
      (2L, clean, "en", "src1", clean.length.toLong),
      (3L, "the end", "en", "src1", 7L),   // 2 tokens: no rep signal
      (4L, "", "en", "src1", 0L),          // empty
      (5L, benchDoc, "en", "src0", benchDoc.length.toLong),
      (6L, contaminatedDoc, "en", "src1", contaminatedDoc.length.toLong),
      (7L, clean, "en", "src1", clean.length.toLong) // exact dup of 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q69 repetition ratios: repetitive doc scores high, clean doc zero, short docs excluded") {
    val rows = SparkEntry.queries("q69_repetition_ratio")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // 10 tokens -> 9 bigrams, 2 distinct ("spam ham" x5, "ham spam" x4)
    assert(rows(1L)._1 == math.rint((1.0 - 2.0 / 9.0) * 1e6) / 1e6, rows(1L))
    assert(rows(1L)._2 > 0.7)                        // 8 trigrams, 2 distinct
    assert(rows(2L) == ((0.0, 0.0)))
    assert(!rows.contains(3L) && !rows.contains(4L)) // < 3 tokens: no signal
  }

  test("q70 ngram jaccard pairs exact dups via rare shingles, routes short docs out") {
    val pairs = SparkEntry.queries("q70_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((2L, 7L)), pairs.toSeq)
    assert(pairs.head._3 == 1.0) // identical shingle sets
  }

  test("q71 decontaminate flags only corpus docs sharing a 5-gram with the src0 benchmark") {
    val flagged = SparkEntry.queries("q71_decontaminate")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 6 shares "alpha beta gamma delta epsilon" with benchmark doc 5;
    // doc 1 is IN the benchmark slice so it is never flagged
    assert(flagged == Set(6L), flagged)
  }

  test("q72 source caps match an independent driver-side computation on real data") {
    val real = "/root/testdata/sf0.001"
    val rows = graft.operators.Tables.documents(spark, real)
      .select("source", "n_chars", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (src, ds) =>
      val kept = ds.sortBy(d => (-d._2, d._3)).take(10)
      (src, kept.length.toLong, (ds.length - kept.length).toLong, kept.map(_._2).sum)
    }.toSet
    val got = SparkEntry.queries("q72_source_caps")(spark, real)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q74 shard packing matches an independent driver-side computation") {
    val real = "/root/testdata/sf0.001"
    val rows = graft.operators.Tables.documents(spark, real)
      .selectExpr("source", "doc_id", "size(split(lower(text), '\\\\W+')) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._2).toSeq.map { d =>
        val shard = cum / 500; cum += d._3; (src, shard, d._3)
      }
    }.groupBy(t => (t._1, t._2))
      .map { case ((src, sh), ts) => (src, sh, ts.size.toLong, ts.map(_._3).sum) }.toSet
    val got = SparkEntry.queries("q74_shard_pack")(spark, real)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q75 fixed-size stratified sample keeps the N smallest hashes per stratum") {
    val real = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q75_stratified_topn")(spark, real)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perLang = got.groupBy(_._1)
    perLang.values.foreach(sel => assert(sel.length <= 50))
    val all = graft.operators.Tables.documents(spark, real)
      .selectExpr("lang", "doc_id", "md5(CAST(doc_id AS STRING)) AS h")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    all.groupBy(_._1).foreach { case (lang, ds) =>
      val expect = ds.sortBy(_._3).take(50).map(_._2).toSeq
      val sel = perLang(lang).sortBy(_._2).map(_._3).toSeq
      assert(sel == expect, s"stratum $lang")
    }
  }

  test("q76 drops new docs near-identical to the existing corpus, keeps unique and token-less ones") {
    import spark.implicits._
    val d = Files.createTempDirectory("incdedup").toString
    val textA = (1 to 40).map(i => s"tok$i").mkString(" ")
    val textB = (1 to 40).map(i => s"other$i").mkString(" ")
    Seq(
      (1L, textA, "en", "src1", textA.length.toLong),  // existing corpus
      (2L, textA, "en", "src11", textA.length.toLong), // new, dup of 1 -> dropped
      (3L, textB, "en", "src12", textB.length.toLong), // new, unique -> kept
      (4L, "", "en", "src13", 0L)                      // new, token-less -> kept
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val kept = SparkEntry.queries("q76_incremental_dedup")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L), kept)
  }

  test("q69 expression equals a naive Scala computation on 200 random docs") {
    import spark.implicits._
    // fixed-seed random word-soup docs, including heavy repetition and
    // minimum length (3 tokens)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "g")
    val docs = (0 until 200).map { i =>
      val len = 3 + rnd.nextInt(30)
      val toks = Vector.fill(len)(vocab(rnd.nextInt(vocab.length)))
      (i.toLong, toks.mkString(" "))
    }
    def naiveRep(toks: Seq[String], n: Int): Double = {
      val grams = toks.sliding(n).map(_.mkString(" ")).toVector
      math.rint((1.0 - grams.distinct.size.toDouble / grams.size) * 1e6) / 1e6
    }
    val d = Files.createTempDirectory("repprop").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q69_repetition_ratio")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    docs.foreach { case (id, t) =>
      val toks = t.split(" ").toSeq
      assert(got(id) == ((naiveRep(toks, 2), naiveRep(toks, 3))), s"doc $id")
    }
  }

  test("q74 conserves tokens: shard totals sum to the corpus token count per source") {
    val real = "/root/testdata/sf0.001"
    val perSourceTotals = graft.operators.Tables.documents(spark, real)
      .selectExpr("source", "size(split(lower(text), '\\\\W+')) AS n")
      .groupBy("source").sum("n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sharded = SparkEntry.queries("q74_shard_pack")(spark, real)
      .collect().map(r => (r.getString(0), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(sharded == perSourceTotals)
  }

  test("q73 stratified sample is deterministic and per-stratum bounded") {
    val real = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q73_stratified_sample")(spark, real)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = SparkEntry.queries("q73_stratified_sample")(spark, real)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b) // pure function of the rows: identical across runs
    val totals = graft.operators.Tables.documents(spark, real)
      .groupBy("lang").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    a.foreach { case (lang, n) => assert(n <= totals(lang), s"$lang oversampled") }
  }

  /** Per-doc distinct 3-gram shingle sets, via the engine's own gram
    * kernel but RAW strings (no hashes) — the pairing operators under
    * test run on xxhash64 shingle ids, so equality against these sets
    * also proves collision-freedom on this corpus. */
  private def shingleSets(real: String): Map[Long, Set[String]] = {
    import spark.implicits._
    graft.operators.Tables.documents(spark, real)
      .withColumn("toks", split(lower($"text"), "\\W+"))
      .withColumn("s", explode(expr(graft.operators.Dedup.gramArraySql(3))))
      .select($"doc_id", $"s").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q125 prefix filter is LOSSLESS: equals brute-force exact Jaccard >= 0.5") {
    val real = "/root/testdata/sf0.001"
    val sets = shingleSets(real)
    val ids = sets.keys.toVector.sorted
    // brute force over ALL pairs — no prefix filter, no candidate cap:
    // anything the operator's pruning lost would show up here
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.size).iterator
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if inter > 0
      jacc = r6(inter.toDouble / (a.size + b.size - inter))
      if jacc >= 0.5
    } yield (ids(i), ids(j), jacc)).toSet
    val got = SparkEntry.queries("q125_ppjoin")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q128 containment equals a Scala re-derivation of the capped pipeline") {
    val real = "/root/testdata/sf0.001"
    val sets = shingleSets(real)
    // candidate stage: grams in <= 8 docs, pairs sharing >= 2 of them
    val byGram = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val shared = collection.mutable.Map.empty[(Long, Long), Int]
    byGram.values.filter(_.size <= 8).foreach { docs =>
      for (i <- docs.indices; j <- i + 1 until docs.size)
        shared.updateWith((docs(i), docs(j)))(c => Some(c.getOrElse(0) + 1))
    }
    val expected = (for {
      ((ida, idb), n) <- shared.iterator if n >= 2
      a = sets(ida); b = sets(idb)
      cont = r6((a & b).size.toDouble / math.min(a.size, b.size))
      if cont >= 0.8
    } yield {
      val (cid, oid) = if (a.size <= b.size) (ida, idb) else (idb, ida)
      (cid, oid, math.min(a.size, b.size).toLong, math.max(a.size, b.size).toLong, cont)
    }).toSet
    val got = SparkEntry.queries("q128_containment")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSet == expected,
      s"missing=${(expected -- got.toSet).take(3)} extra=${(got.toSet -- expected).take(3)}")
    // published direction law: the contained side is the smaller set
    got.foreach { case (_, _, nc, ng, _) => assert(nc <= ng) }
  }

  test("q132 equals a BigInt tf-idf cosine re-derivation over raw shingles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val real = "/root/testdata/sf0.001"
    // shingle multisets via the engine's gram kernel, RAW strings
    val rows = graft.operators.Tables.documents(spark, real)
      .withColumn("toks", split(lower($"text"), "\\W+"))
      .withColumn("s", explode(expr(graft.operators.Dedup.gramArraySql(3))))
      .select($"doc_id", $"s").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = rows.groupBy(identity).map { case ((d, s), v) => ((d, s), v.length.toLong) }
    val nDocs = graft.operators.Tables.documents(spark, real).count()
    val df = tf.keys.groupBy(_._2).map { case (s, v) => (s, v.size.toLong) }
    val w = tf.map { case ((d, s), t) => ((d, s), t * ((1000000L * nDocs) / df(s))) }
    val byDoc = w.groupBy(_._1._1).map { case (d, m) =>
      d -> m.map { case ((_, s), wv) => s -> wv } }
    val n2 = byDoc.map { case (d, m) => d -> m.values.map(v => BigInt(v) * BigInt(v)).sum }
    val rare = tf.keys.filter(k => df(k._2) <= 8).toSeq
    val cand = rare.groupBy(_._2).values.flatMap { docs =>
      val ids = docs.map(_._1).toSeq.sorted
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = cand.flatMap { case (ida, idb) =>
      val (ma, mb) = (byDoc(ida), byDoc(idb))
      val dot = ma.collect { case (s, wa) if mb.contains(s) => BigInt(wa) * BigInt(mb(s)) }.sum
      val cos = r6(dot.toDouble / (math.sqrt(n2(ida).toDouble) * math.sqrt(n2(idb).toDouble)))
      if (cos >= 0.5) Some((ida, idb, cos)) else None
    }.toSet
    val got = SparkEntry.queries("q132_tfidf_pairs")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q175 allocation partitions the budget exactly and equals a mirrored in-memory chain") {
    val budget = 1000000L
    val real = "/root/testdata/sf0.001"
    val rows = graft.operators.Tables.documents(spark, real)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("\\W+").count(_.nonEmpty).toLong))
    val nTok = rows.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    // mirror the engine's tree exactly: IEEE sqrt, DECIMAL(30,10)
    // quantized sum, one multiply/divide, floor, largest remainder
    val w = nTok.map { case (s, n) => s -> math.sqrt(n.toDouble) }
    val tw = w.values.map(x =>
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val fr = w.toSeq.map { case (s, wi) =>
      val raw = budget.toDouble * wi / tw
      (s, nTok(s), math.floor(raw).toLong, raw - math.floor(raw))
    }
    val k = budget - fr.map(_._3).sum
    val order = fr.sortBy { case (s, _, _, rem) => (-rem, s) }.map(_._1).zipWithIndex.toMap
    val expect = fr.map { case (s, n, fl, _) =>
      (s, n, fl + (if (order(s) < k) 1L else 0L))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q175_temperature_alloc")(spark, real).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._3).sum == budget, s"allocation does not partition the budget: $got")
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // temperature sanity: allocation order follows corpus-size order,
    // but flatter — the biggest source gets LESS than its raw share
    val bySize = nTok.toSeq.sortBy(-_._2)
    val totTok = nTok.values.sum
    val gotMap = got.map(t => t._1 -> t._3).toMap
    val (bigSrc, bigN) = bySize.head
    assert(gotMap(bigSrc).toDouble / budget <= bigN.toDouble / totTok + 1e-9,
      "sqrt temperature must flatten the biggest source's share")
  }

  test("q180 materialization hits each source's q175 allocation within one doc, equals an in-memory replay") {
    val real = "/root/testdata/sf0.001"
    val alloc = SparkEntry.queries("q175_temperature_alloc")(spark, real).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SparkEntry.queries("q180_epoch_materialize")(spark, real).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // identity: per source, Σ repeats·n_tokens lands in [alloc,
    // alloc + longest doc) — the boundary doc is included by contract
    got.groupBy(_._1).foreach { case (src, docs) =>
      val (srcTokens, a) = alloc(src)
      assert(docs.map(_._3).sum == srcTokens)
      val emitted = docs.map(d => d._4 * d._3).sum
      val maxDoc = docs.map(_._3).max
      assert(emitted >= a && emitted < a + maxDoc,
        s"$src emitted $emitted for alloc $a (max doc $maxDoc)")
    }
    // dual implementation: md5(doc_id) hash order, strict-prefix fill
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect = got.groupBy(_._1).toSeq.flatMap { case (src, docs) =>
      val (srcTokens, a) = alloc(src)
      val full = a / srcTokens
      val rem = a % srcTokens
      val ordered = docs.map(d => (md5hex(d._2.toString), d._2, d._3)).sortBy(t => (t._1, t._2))
      val cumBefore = ordered.scanLeft(0L)(_ + _._3).init
      ordered.zip(cumBefore).map { case ((_, id, nt), cb) =>
        (src, id, nt, full + (if (cb < rem) 1L else 0L))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == expect)
  }

  test("q181 buckets are tight powers of two and masses conserve") {
    val real = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q181_padding_waste")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (b, nd, st, pad, pf, fe) =>
      assert(b >= 16 && java.lang.Long.bitCount(b) == 1, s"bucket $b not a pow2 >= 16")
      assert(pad == nd * b - st)
      assert(pf == r6(pad.toDouble / (nd * b)) && fe == r6(st.toDouble / (nd * b)))
      // tightness: the bucket's docs could not all fit one bucket down
      // (unless at the 16 floor); no doc exceeds its bucket
      assert(st <= nd * b)
    }
    // conservation vs the corpus: doc counts and token mass
    val docs = graft.operators.Tables.documents(spark, real)
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\W+").count(_.nonEmpty).toLong)
    assert(rows.map(_._2).sum == docs.length)
    assert(rows.map(_._3).sum == docs.sum)
    // per-doc bucket assignment matches the integer-log2 banding
    def pow2ceil(n: Long): Long = {
      var b = 16L; while (b < n) b <<= 1; b
    }
    val expectBuckets = docs.groupBy(pow2ceil).map { case (b, xs) => b -> xs.length.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == expectBuckets)
  }

  test("q183 adjacency counts equal a GLOBAL-order in-memory replay (bucketed two-phase = one global lag)") {
    val real = "/root/testdata/sf0.001"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.operators.Tables.documents(spark, real)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ordered = docs.map { case (id, src) => (md5hex(id.toString), id, src) }
      .sortBy(t => (t._1, t._2)).map(_._3)
    val sameAdj = ordered.zip(ordered.tail).filter(p => p._1 == p._2)
      .groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val n = docs.length.toLong
    val expect = docs.groupBy(_._2).map { case (src, xs) =>
      val nd = xs.length.toLong
      val sa = sameAdj.getOrElse(src, 0L)
      val mix = if (nd > 1) Some(r6(sa.toDouble * n / (nd * (nd - 1)))) else None
      (src, nd, sa, r6(nd.toDouble * (nd - 1) / n), mix)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q183_shuffle_mix_audit")(spark, real).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // adjacency mass bound: at most N-1 adjacent pairs exist at all
    assert(got.map(_._3).sum <= n - 1)
  }

  test("q194 quality yield: suffix-sum identities, yield 1.0 at the full-keep cut, monotone in the cut") {
    val rows = SparkEntry.queries("q194_quality_yield")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byCut = rs.sortBy(_._2)
      // keeping from decile 1 keeps everything
      val full = byCut.head
      assert(full._2 == 1 && full._7 == 1.0, s"$src: full-keep row must yield 1.0: $full")
      assert(full._5 == rs.map(_._3).sum && full._6 == rs.map(_._4).sum,
        s"$src: full-keep row must equal the per-decile sums")
      // kept columns are exact suffix sums and non-increasing in the cut
      byCut.foreach { r =>
        val suffixDocs = rs.filter(_._2 >= r._2).map(_._3).sum
        val suffixToks = rs.filter(_._2 >= r._2).map(_._4).sum
        assert(r._5 == suffixDocs && r._6 == suffixToks,
          s"$src cut=${r._2}: kept must be the suffix sum: $r")
      }
      assert(byCut.map(_._7).reverse.toSeq == byCut.map(_._7).reverse.sorted.toSeq,
        s"$src: token_yield must be non-decreasing toward lower cuts")
    }
  }
}
