package graft

import java.nio.file.Files

/** Pins the dedup operators' edge-case contract (VERDICT r1 item 5):
  * docs with <3 tokens produce no shingles, exit near-dup entirely,
  * and are handled by the exact-dedup stage only. */
class DedupSpec extends SparkSuite {

  /** A miniature documents.parquet with short (<3 token) and normal
    * docs, including byte-identical short dups and near-identical long
    * docs. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("dedupdocs").toString
    val longA = (1 to 40).map(i => s"token$i").mkString(" ")
    val longB = (1 to 40).map(i => if (i == 40) "changed" else s"token$i").mkString(" ")
    Seq(
      (1L, "the end", "en", "web", 7L),          // 2 tokens
      (2L, "the end", "en", "web", 7L),          // exact dup of 1
      (3L, "the start", "en", "web", 9L),        // 2 tokens, NOT a dup of 1
      (4L, "one", "en", "web", 3L),              // 1 token
      (5L, longA, "en", "web", longA.length.toLong),
      (6L, longB, "en", "web", longB.length.toLong), // near-dup of 5
      (7L, "", "en", "web", 0L)                  // empty
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("sub-3-token docs produce no shingles and no minhash signature") {
    val sigs = SparkEntry.queries("q26_minhash_signature")(spark, dir)
    assert(sigs.select("doc_id").collect().map(_.getLong(0)).toSet == Set(5L, 6L))
  }

  test("sub-3-token docs never appear in near-dup pairs, even byte-identical ones") {
    val pairs = SparkEntry.queries("q27_minhash_dup_pairs")(spark, dir)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    // docs 1 and 2 are byte-identical but short: near-dup must NOT pair
    // them (exact dedup owns that case); 5/6 is the only near-dup pair
    assert(pairs.toSeq == Seq((5L, 6L)))
  }

  test("q61 excludes token-less docs from simhash pairing (no zero-fingerprint mega-bucket)") {
    val pairs = SparkEntry.queries("q61_simhash_pairs")(spark, dir)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 7 is empty: simhash64([]) = 0, and without the guard every
    // token-less doc would pair with every other at hamming 0
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L), pairs.toSeq)
    // identical short docs DO pair here (same token set -> same bits);
    // near-dup by token-set is simhash's contract, unlike the 3-gram
    // minhash path which routes them to exact dedup
    assert(pairs.contains((1L, 2L)), pairs.toSeq)
  }

  test("q58 routes short docs through exact dedup: identical short docs still collapse") {
    val kept = SparkEntry.queries("q58_training_prep")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 2 (exact dup of 1) must be gone regardless of quality gating;
    // doc 1 survives exact dedup (whether it passes the quality gate is
    // the gate's business — assert only the dedup-stage contract)
    assert(!kept.contains(2L))
    // doc 6 (near-dup loser of 5) must be gone
    assert(!kept.contains(6L))
  }

  /** Brute-force reference for q156: enumerate every stride-1 k-token
    * window by VALUE (no hashing — the md5 key in the operator must be
    * behaviorally invisible), mark positions of globally repeated
    * windows, coalesce overlapping-or-adjacent intervals, measure. */
  private def exactSubstrRef(
      docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\W+", -1).toSeq }.toMap
    val wins = toks.toSeq.flatMap { case (id, w) =>
      if (w.size >= k) (0 to w.size - k).map(i => (id, i, w.slice(i, i + k).mkString(" ")))
      else Nil
    }
    val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dupPos = wins.filter(x => occ(x._3) > 1)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    toks.map { case (id, w) =>
      val ps = dupPos.getOrElse(id, Seq.empty)
      // gaps-and-islands: break when the position gap exceeds k
      val spans = ps.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, p)                            => List((p, p + k - 1))
        case ((s, e) :: rest, p) if p - (e - k + 1) <= k => (s, p + k - 1) :: rest
        case (acc, p)                            => (p, p + k - 1) :: acc
      }.reverse
      val covered = spans.map { case (s, e) => e - s + 1 }
      id -> ((w.size.toLong, spans.size.toLong,
        covered.sum.toLong, if (covered.isEmpty) 0L else covered.max.toLong))
    }
  }

  test("q156 matches a brute-force by-value reference, incl. within-doc repeats and boundary straddles") {
    import spark.implicits._
    val d = Files.createTempDirectory("exsub").toString
    val a = (1 to 40).map(i => s"a$i").mkString(" ")
    // shares a 26-token run with a, starting mid-doc: the straddling
    // case q119's disjoint segments systematically miss
    val b = ((1 to 10).map(i => s"b$i") ++ (5 to 30).map(i => s"a$i") ++
      (11 to 20).map(i => s"b$i")).mkString(" ")
    val c = a // exact replica: full coverage
    val f = ((1 to 16).map(i => s"e$i") ++ Seq("gap") ++
      (1 to 16).map(i => s"e$i")).mkString(" ") // within-doc repeat
    val docs = Seq(
      (1L, a), (2L, b), (3L, c), (4L, f),
      (5L, (1 to 20).map(i => s"d$i").mkString(" ")), // unique, no dups
      (6L, "too short"), (7L, ""))
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val got = SparkEntry.queries("q156_exact_substr")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val want = exactSubstrRef(docs, 16)
    assert(got == want, s"got $got\nwant $want")
    // the designed cases actually exercised what they claim:
    assert(want(3L)._3 == 40L) // replica: every token covered
    assert(want(2L)._3 > 0L)   // straddling run detected
    assert(want(4L)._2 == 2L)  // within-doc repeat: two spans (gap > k apart is false here — one island would mean the gap merged; assert the ref itself)
    assert(want(5L)._3 == 0L)  // unique doc: zero coverage
  }

  test("q156 randomized sweep: seeded corpora with shared phrases at random offsets match the reference") {
    import spark.implicits._
    // docs alternate unique noise with randomly-chosen SHARED phrases
    // (>= window length), so duplicate runs appear at arbitrary
    // offsets and adjacencies — probing island-merge edges a crafted
    // corpus can miss
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val phrases = Vector.tabulate(3)(p => Seq.tabulate(16 + rnd.nextInt(8))(j => s"p${p}w$j"))
      var uid = 0
      val docs = (0 until 12).map { i =>
        val segs = (0 to rnd.nextInt(3)).map { _ =>
          val noise = Seq.fill(rnd.nextInt(12)) { uid += 1; s"u$uid" }
          noise ++ (if (rnd.nextBoolean()) phrases(rnd.nextInt(3)) else Seq.empty)
        }
        (i.toLong, segs.flatten.mkString(" ")) // may be empty or sub-window
      }
      val d = Files.createTempDirectory(s"exsub$seed").toString
      docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      val got = SparkEntry.queries("q156_exact_substr")(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val want = exactSubstrRef(docs, 16)
      assert(got == want, s"seed $seed:\ngot $got\nwant $want")
      // the sweep is only meaningful if collisions actually happened
      assert(want.values.exists(_._3 > 0), s"seed $seed produced no duplicate windows")
    }
  }

  test("q191 randomized sweep: seeded corpora with planted banners at random alignments match the by-value reference") {
    import spark.implicits._
    // banners land at random token offsets, so only the copies that
    // happen to fall block-ALIGNED are removable — the reference
    // applies the same aligned-block contract by value, catching any
    // drift in segmentation, df counting or token accounting
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      val banners = Vector.tabulate(3)(b => Seq.tabulate(10)(j => s"b${b}w$j"))
      var uid = 0
      val docs = (0 until 15).map { i =>
        // half the docs LEAD with a banner (block-aligned, the real
        // header shape); mid-doc copies land at random offsets and
        // are only removable when they happen to align
        val head = if (rnd.nextBoolean()) banners(rnd.nextInt(3)) else Seq.empty
        val segs = (0 to rnd.nextInt(3)).map { _ =>
          val noise = Seq.fill(rnd.nextInt(15)) { uid += 1; s"u$uid" }
          noise ++ (if (rnd.nextInt(3) > 0) banners(rnd.nextInt(3)) else Seq.empty)
        }
        (i.toLong, (head ++ segs.flatten).mkString(" "))
      }
      val d = Files.createTempDirectory(s"boiler$seed").toString
      docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      // by-value reference of the aligned-block contract
      val blocks = docs.map { case (id, t) =>
        id -> t.split("\\W+").toSeq.grouped(10).map(_.mkString(" ")).toSeq
      }
      val boiler = blocks.flatMap { case (id, bs) => bs.distinct.map(_ -> id) }
        .groupBy(_._1).collect { case (b, xs) if xs.map(_._2).distinct.size >= 3 => b }.toSet
      val want = blocks.map { case (id, bs) =>
        val rem = bs.filter(boiler)
        id -> ((bs.size.toLong, rem.size.toLong, rem.map(_.split(" ").length.toLong).sum))
      }.toMap
      val got = SparkEntry.queries("q191_boilerplate_lines")(spark, d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
        .toMap
      assert(got == want, s"seed $seed:\ngot $got\nwant $want")
      assert(want.values.exists(_._2 > 0), s"seed $seed removed nothing — sweep not meaningful")
    }
  }

  test("q191 boilerplate lines: >=3-distinct-doc blocks removed everywhere, within-doc repeats and 2-doc blocks kept, straddles survive") {
    import spark.implicits._
    val d = Files.createTempDirectory("boiler").toString
    val header = (1 to 10).map(i => s"h$i").mkString(" ") // the banner
    val pair = (1 to 10).map(i => s"p$i").mkString(" ")   // only 2 docs
    def noise(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      // header block-aligned at pos 0 in three docs (df=3 -> removed),
      // each at a different doc length/"quality tier"
      (1L, s"$header ${noise("a", 30)}"),
      (2L, s"$header ${noise("b", 10)}"),
      (3L, s"$header ${noise("c", 3)}"), // short doc: header + ragged 3-token tail
      // the SAME header content but shifted 5 tokens -> straddles two
      // blocks, so the aligned-block rule does NOT fire here
      (4L, s"${noise("d", 5)} $header ${noise("e", 5)}"),
      // a block repeated twice within ONE doc only: df counts DISTINCT
      // docs, so it stays
      (5L, s"$pair $pair"),
      // the pair block in a second doc: df=2 < 3, stays
      (6L, s"$pair ${noise("f", 10)}"),
      (7L, noise("g", 25)))
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    // in-memory by-value reference of the same contract
    val blocks = docs.map { case (id, t) =>
      id -> t.split("\\W+").toSeq.grouped(10).map(_.mkString(" ")).toSeq
    }
    val df = blocks.flatMap { case (id, bs) => bs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).distinct.size }
    val boiler = df.collect { case (b, n) if n >= 3 => b }.toSet
    val want = blocks.map { case (id, bs) =>
      val rem = bs.filter(boiler)
      id -> ((bs.size.toLong, rem.size.toLong,
        rem.map(_.split(" ").length.toLong).sum))
    }.toMap

    val got = SparkEntry.queries("q191_boilerplate_lines")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    assert(got == want, s"got $got\nwant $want")
    // the designed cases actually exercised what they claim:
    assert(want(1L)._2 == 1L && want(2L)._2 == 1L && want(3L)._2 == 1L,
      "the 3-doc header must be removed from every tier")
    assert(want(3L)._3 == 10L, "removal takes the full 10-token block")
    assert(want(4L)._2 == 0L, "a straddling (non-aligned) copy survives")
    assert(want(5L)._2 == 0L, "within-doc repetition is not boilerplate (distinct-doc df)")
    assert(want(6L)._2 == 0L, "a 2-doc block stays below the df=3 threshold")
  }

  test("q170 flow matrix: cross-source dup groups counted with copy mass, absent pairs published as zeros") {
    import spark.implicits._
    import java.nio.file.Files
    // s1 holds 2 copies of 'alpha' + 'beta'; s2 holds 1 'alpha' +
    // 'gamma'; s3 is disjoint. Expected: (s1,s2) shares ONE group with
    // docs_a=2 (both s1 copies count as mass), every other pair is a
    // published zero row (the grid contract).
    val docs = Seq(
      (0L, "alpha text body", "en", "s1", 15L),
      (1L, "alpha text body", "en", "s1", 15L),
      (2L, "beta text body", "en", "s1", 14L),
      (3L, "alpha text body", "en", "s2", 15L),
      (4L, "gamma text body", "en", "s2", 15L),
      (5L, "delta text body", "en", "s3", 15L))
    val d = Files.createTempDirectory("dupflow").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q170_dup_flow")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("s1", "s2", 1L, 2L, 1L),
      ("s1", "s3", 0L, 0L, 0L),
      ("s2", "s3", 0L, 0L, 0L)), got.toString)
  }

  test("q171 incremental ingest: corpus-dup beats batch position, batch-first wins within batch") {
    import spark.implicits._
    import java.nio.file.Files
    // 20 docs -> cut = 16: old = ids 0..15 (contains text 'A'),
    // new batch = 16..19: 16 re-sends 'A' (dup_corpus even though it
    // is also batch-first), 17 is novel, 18/19 duplicate each other
    // (18 = batch-first kept, 19 = dup_batch)
    val texts = (0 to 15).map(i => if (i == 3) "A" else s"old text $i") ++
      Seq("A", "Z novel", "Y pair", "Y pair")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s1", t.length.toLong) }
    val d = Files.createTempDirectory("ingest").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q171_incremental_ingest")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("s1", 4L, 1L, 1L, 2L)), got.toString)
  }

  test("q176 histogram equals an in-memory bucketing of q66's published components") {
    val real = "/root/testdata/sf0.001"
    val comp = SparkEntry.queries("q66_dup_components")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = spark.read.parquet(s"$real/documents.parquet").count()
    val sizes = comp.groupBy(_._2).map(_._2.size.toLong).toSeq
    def bucket(n: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(n) // floor(log2)
    val hist = sizes.groupBy(bucket).map { case (b, xs) =>
      (b, xs.size.toLong, xs.sum, xs.max)
    }
    val singles = nDocs - comp.length
    val expect = (hist.toSeq :+ ((0, singles, singles, if (singles > 0) 1L else 0L)))
      .map { case (b, nc, nd, mx) => (b, 1L << b, nc, nd, mx) }
      .sortBy(_._1)
    val got = SparkEntry.queries("q176_cluster_size_histogram")(spark, real).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // conservation: histogram masses partition the corpus
    assert(got.map(_._4).sum == nDocs)
  }

  test("q177 calibration conserves masses against q66 components and the quality frame") {
    import org.apache.spark.sql.functions._
    val real = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q177_quality_calibration")(spark, real).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // total docs = quality-eligible docs (non-empty text/tokens)
    val eligible = spark.read.parquet(s"$real/documents.parquet")
      .filter(length(col("text")) > 0 &&
        size(array_remove(split(lower(col("text")), "\\W+"), "")) > 0)
      .count()
    assert(got.map(_._2).sum == eligible, s"band masses ${got.map(_._2).sum} != eligible $eligible")
    // dup mass = q66's non-canonical members restricted to eligible docs
    val comp = SparkEntry.queries("q66_dup_components")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => p._1 != p._2).map(_._1).toSet
    val eligibleIds = spark.read.parquet(s"$real/documents.parquet")
      .filter(length(col("text")) > 0 &&
        size(array_remove(split(lower(col("text")), "\\W+"), "")) > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._3).sum == comp.count(eligibleIds), "dup mass != q66 non-canonical members")
    got.foreach { case (b, n, d, mt, en) =>
      assert(d <= n && en <= n && mt > 0.0, s"band $b inconsistent: $n/$d/$mt/$en")
    }
  }

  test("q184 preference pairs equal an election replay over q66 components + the quality frame; chosen never equals rejected") {
    val real = "/root/testdata/sf0.001"
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val comp = SparkEntry.queries("q66_dup_components")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val qual = SparkEntry.queries("q30_text_quality")(spark, real).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val expect = comp.groupBy(_._2).toSeq.flatMap { case (cl, ms) =>
      val withQ = ms.map(_._1).flatMap(id => qual.get(id).map(id -> _))
      if (withQ.size < 2) None
      else {
        val qmax = withQ.map(_._2).max
        val qmin = withQ.map(_._2).min
        val chosen = withQ.filter(_._2 == qmax).map(_._1).min
        val rejected = withQ.filter(_._2 == qmin).map(_._1).max
        Some((cl, withQ.size.toLong, chosen, r6(qmax), rejected, r6(qmin),
          r6(qmax - qmin)))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q184_preference_pairs")(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got.nonEmpty, "sf0.001 has near-dup clusters; q184 must emit pairs")
    assert(got == expect, s"\ngot    ${got.take(5)}\nexpect ${expect.take(5)}")
    // the tie contract guarantees a real pair even when all qualities tie
    got.foreach { case (cl, _, ch, qc, rjd, qr, m) =>
      assert(ch != rjd, s"cluster $cl elected doc $ch twice")
      assert(m >= 0.0 && qc >= qr)
    }
  }

  test("q208 threshold curve: non-increasing in tau, anchored to q27's pair frame, and genuinely discriminating") {
    val got = SparkEntry.queries("q208_dedup_threshold_curve")(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toVector
    assert(got.map(_._1) == Vector(0.5, 0.9, 0.95, 0.98, 1.0))
    // both curves are suffix counts over the same frame: non-increasing
    assert(got.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    // tau = 0.5 is exactly q27's published pair frame
    val q27 = SparkEntry.queries("q27_minhash_dup_pairs")(spark, dir).collect()
    assert(got.head._2 == q27.length.toLong,
      s"curve base ${got.head._2} != q27 pairs ${q27.length}")
    // each pair flags at most 2 docs; a flagged doc has >= 1 pair
    got.foreach { case (_, p, d) => assert(d <= 2 * p); assert((p > 0) == (d > 0)) }
    // fixture health (the q200 lesson): the dial must DISCRIMINATE —
    // at least two distinct pair counts across the grid
    assert(got.map(_._2).distinct.size >= 2, s"flat curve: $got")
  }

  test("q209 diversity survivorship: a rare source's only copy survives; lowest-id would have killed it") {
    import spark.implicits._
    // skewed fixture: 'rare' has ONE doc (id 10) whose text is cloned
    // by a 'big'-source doc with a LOWER id (1) — the adversarial case
    // the rule exists for. big has two more distinct docs.
    val clone = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = Seq(
      (1L, "big", clone, "en", clone.length.toLong),
      (2L, "big", "one two three four five six seven eight", "en", 40L),
      (3L, "big", "nine ten eleven twelve thirteen fourteen fifteen", "en", 48L),
      (10L, "rare", clone, "en", clone.length.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("divdedup").toString
    rows.toDF("doc_id", "source", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q209_diversity_dedup")(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toVector
    // (source, n_docs, n_clustered, dropped_diversity, dropped_lowid)
    assert(got == Vector(
      ("big", 3L, 1L, 1L, 0L),     // diversity drops big's clone; lowid keeps it
      ("rare", 1L, 1L, 0L, 1L)),   // lowid kills rare's ONLY document
      s"unexpected survivorship: $got")
  }
}
