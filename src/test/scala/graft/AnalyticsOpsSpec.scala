package graft

import org.apache.spark.sql.functions._

/** Invariant + dual-implementation checks for the continuation
  * operators (q95 and onward; one test per query below) — complements
  * the DuckDB oracle (cross-engine equality) with checks that the
  * SEMANTICS are the intended ones. */
class AnalyticsOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q95 gap-fill grid is complete and zero-filled cells exist") {
    import spark.implicits._
    val out = run("q95_gap_fill").collect()
    val types = out.map(_.getString(0)).distinct.length
    val days = out.map(_.getDate(1)).distinct.length
    assert(out.length == types * days, s"grid ${out.length} != $types x $days")
    // the whole point of densification: every absent (type, day) cell
    // exists as an explicit 0 (count is data-dependent; at sf0.001 the
    // grid may be fully occupied and the count is 0)
    val rawPairs = graft.operators.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts")).distinct().count()
    assert(out.count(_.getLong(2) == 0L).toLong == types.toLong * days - rawPairs)
    // totals preserved: sum over grid == raw event count
    val total = out.map(_.getLong(2)).sum
    val raw = graft.operators.Tables.events(spark, dir).count()
    assert(total == raw, s"grid total $total != raw $raw")
  }

  test("q96 draws exactly 5 per source with non-decreasing scores") {
    val out = run("q96_weighted_sample").collect()
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.length == 5, s"$src has ${rows.length} picks")
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to 5), s"$src ranks")
      val scores = byRank.map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a <= b },
        s"$src scores not sorted: ${scores.mkString(",")}")
    }
  }

  test("q96 equals an independent Scala ranking over the raw table") {
    val raw = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def u32(docId: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = raw.groupBy(_._2).flatMap { case (src, rows) =>
      rows.map { case (id, _, nc) =>
        val score = BigDecimal(u32(id).toDouble / (nc + 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (src, id, score)
      }.sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((s, id, sc), i) => (s, i + 1, id, sc) }.toSeq
    }.toSet
    val got = run("q96_weighted_sample").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("q97 diversity is in [0,1]; token-less docs get 0; uniform docs near max") {
    val out = run("q97_lexical_diversity").collect()
    out.foreach { r =>
      val (n, d) = (r.getLong(1), r.getDouble(3))
      assert(d >= 0.0 && d < 1.0, s"doc ${r.getLong(0)} diversity $d")
      if (n == 0) assert(d == 0.0)
      // all-distinct doc: 1 - n/n^2 = 1 - 1/n
      if (n == r.getLong(2) && n > 0)
        assert(math.abs(d - (1.0 - 1.0 / n)) < 1e-6)
    }
    // every doc gets a row
    val docs = graft.operators.Tables.documents(spark, dir).count()
    assert(out.length.toLong == docs)
  }

  test("q98 overlap matrix is complete and Jaccard bounded") {
    val out = run("q98_source_overlap").collect()
    val sources = graft.operators.Tables.documents(spark, dir)
      .select("source").distinct().count().toInt
    assert(out.length == sources * (sources - 1) / 2, s"${out.length} pairs")
    out.foreach { r =>
      val (na, nb, inter, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(inter <= math.min(na, nb), r.toString)
      assert(j >= 0.0 && j <= 1.0, r.toString)
      assert(r.getString(0) < r.getString(1), "pairs must be ordered")
    }
  }

  test("q99 bloom-reduced join equals the plain join") {
    import spark.implicits._
    val got = run("q99_bloom_join").collect()
    val cust = graft.operators.Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
    val plain = graft.operators.Tables.orders(spark, dir)
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Tables.dsum($"o_totalprice", 4).as("revenue"))
      .orderBy($"c_mktsegment").collect()
    assert(got.toSeq == plain.toSeq)
  }

  test("q100 flagged days satisfy the 2-sigma rule recomputed independently") {
    val out = run("q100_daily_anomalies").collect()
    import spark.implicits._
    val daily = graft.operators.Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    out.foreach { r =>
      val (t, day, n) = (r.getString(0), r.getDate(1), r.getLong(2))
      val ns = byType(t).map(_._3.toDouble)
      val mean = ns.sum / ns.length
      val sigma = math.sqrt(ns.map(x => x * x).sum / ns.length - mean * mean)
      assert(n > mean + 2 * sigma, s"$t $day n=$n mean=$mean sigma=$sigma")
      assert(r.getDouble(3) > 2.0, "zscore must exceed 2")
    }
    // and no flagged day is missing: recompute the flag set
    // (byType.toSeq: flatMap over a Map with pair elements would
    // rebuild a Map keyed by event_type and collapse multi-day flags)
    val expected = byType.toSeq.flatMap { case (t, rows) =>
      val ns = rows.map(_._3.toDouble)
      val mean = ns.sum / ns.length
      val sigma = math.sqrt(ns.map(x => x * x).sum / ns.length - mean * mean)
      rows.filter(_._3 > mean + 2 * sigma).map(r => (t, r._2.toString)).toSeq
    }.toSet
    assert(out.map(r => (r.getString(0), r.getDate(1).toString)).toSet == expected)
  }

  test("q101 chunks tile each doc: stride coverage and tail bounds") {
    val out = run("q101_doc_chunks").collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq, s"doc $doc ids")
      // every non-tail chunk is full-width; tail covers to exactly n
      sorted.dropRight(1).foreach(r => assert(r.getInt(2) == 32, s"doc $doc"))
      val tail = sorted.last.getInt(2)
      if (sorted.length > 1) assert(tail >= 9 && tail <= 32, s"doc $doc tail $tail")
      // chunk text token count matches chunk_ntok
      sorted.foreach { r =>
        val ntok = r.getString(3).split(" ", -1).count(_.nonEmpty)
        assert(ntok == r.getInt(2), s"doc $doc chunk ${r.getInt(1)}: $ntok vs ${r.getInt(2)}")
      }
    }
    // token-less docs excluded, all others present
    import spark.implicits._
    val withTok = graft.operators.Tables.documents(spark, dir)
      .select(size(filter(split(lower($"text"), "\\W+"), t => length(t) > 0)).as("n"))
      .filter($"n" >= 1).count()
    assert(byDoc.size.toLong == withTok)
  }

  test("q102 equi-depth buckets are balanced and ordered") {
    val out = run("q102_equidepth_hist").collect().sortBy(_.getInt(0))
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    val ns = out.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, s"bucket sizes ${ns.mkString(",")}")
    // ranges must be non-decreasing across buckets
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9,
        s"bucket ${a.getInt(0)} hi ${a.getDouble(3)} > bucket ${b.getInt(0)} lo ${b.getDouble(2)}")
    case _ => ()
    }
    // the range-partitioned rank must reproduce naive global ntile
    // EXACTLY (same buckets, counts, bounds, sums) — the scale-safe
    // plan is a pure re-planning, not an approximation
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val naive = graft.operators.Tables.lineitem(spark, dir)
      .withColumn("bucket",
        ntile(10).over(Window.orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"l_extendedprice").as("lo"),
        max($"l_extendedprice").as("hi"),
        sum($"l_extendedprice".cast("decimal(30,4)")).cast("double").as("price_sum"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val got = out.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == naive.toSeq)
  }

  test("ntile fill formula matches Spark's ntile for every n shape (rem > 0 included)") {
    // the driver tables all have row counts divisible by 10, so the
    // correctness gate never exercises the rem > 0 branch — pin the
    // extracted formula against Spark's own ntile across n < k, n = k,
    // prime n, and large-n-with-remainder
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1L, 2L, 7L, 9L, 10L, 11L, 13L, 19L, 20L, 23L, 97L, 100L, 101L, 997L)) {
      val df = spark.range(1, n + 1).toDF("r")
        .withColumn("bucket", expr(graft.operators.AnalyticsOps.ntileBucketSql(n, 10)))
        .withColumn("expected", ntile(10).over(Window.orderBy($"r")))
      val bad = df.filter($"bucket" =!= $"expected").count()
      assert(bad == 0L, s"n=$n: $bad ranks mis-bucketed")
    }
  }

  test("q103 correlations are bounded and match an independent computation") {
    val out = run("q103_corr_lang").collect()
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0, r.toString))
    import spark.implicits._
    val raw = graft.operators.Tables.documents(spark, dir)
      .select($"lang", $"n_chars",
        size(filter(split(lower($"text"), "\\W+"), t => length(t) > 0)).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble, r.getLong(2).toDouble))
    val expected = raw.groupBy(_._1).map { case (lang, rows) =>
      val n = rows.length.toDouble
      val (sx, sy) = (rows.map(_._2).sum, rows.map(_._3).sum)
      val sxx = rows.map(t => t._2 * t._2).sum
      val syy = rows.map(t => t._3 * t._3).sum
      val sxy = rows.map(t => t._2 * t._3).sum
      val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      lang -> (if (den == 0) 0.0 else (n * sxy - sx * sy) / den)
    }
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - expected(r.getString(0))) < 1e-5,
        s"${r.getString(0)}: ${r.getDouble(2)} vs ${expected(r.getString(0))}")
    }
  }

  test("q104 rebalance keeps everything from the smallest source, rate = sqrt(min/n)") {
    val out = run("q104_mixture_rebalance").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val minN = out.map(_._2).min
    out.foreach { case (src, n, kept, rate) =>
      assert(kept <= n, src)
      val expRate = BigDecimal(math.sqrt(minN.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == expRate, s"$src rate $rate != $expRate")
      if (n == minN) assert(kept == n, s"min source $src must keep all ($kept of $n)")
    }
  }

  test("q105 min-of-mins shard signatures equal from-scratch union signatures") {
    import spark.implicits._
    val got = run("q105_minhash_union").collect()
      .map(r => (r.getLong(0), (1 to 8).map(r.getString)))
      .toMap
    // from scratch: shingle every doc, key by shard, min per seed over
    // the UNION of shingles — a different evaluation strategy
    val docs = graft.operators.Tables.documents(spark, dir)
    val fresh = docs
      .select(($"doc_id" % 50).as("shard"),
        explode(expr(
          """CASE WHEN size(split(lower(text), '\\W+')) >= 3
               THEN transform(sequence(0, size(split(lower(text), '\\W+')) - 3),
                 i -> concat_ws(' ', slice(split(lower(text), '\\W+'), i + 1, 3)))
               ELSE CAST(array() AS ARRAY<STRING>) END""")).as("s"))
      .groupBy($"shard")
      .agg(min(substring(md5($"s"), 1, 4)).as("mh0"),
        (1 until 8).map(k => min(substring(md5($"s"), 4 * k + 1, 4)).as(s"mh$k")): _*)
      .collect()
      .map(r => (r.getLong(0), (1 to 8).map(r.getString)))
      .toMap
    assert(got == fresh)
  }

  test("q106 frame features equal an independent Scala fold") {
    val got = run("q106_frame_energy").collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val raw = graft.operators.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
    raw.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      (0 until 4).foreach { f =>
        val fr = v.slice(f * 16, f * 16 + 16)
        def r6(x: Double) =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val rms = r6(math.sqrt(fr.foldLeft(0.0)((a, x) => a + x * x) / 16.0))
        val peak = r6(fr.map(math.abs).max)
        assert(got((id, f)) == ((rms, peak)), s"vec $id frame $f")
      }
    }
    assert(got.size == raw.length * 4)
  }

  test("q107 moving average equals a Scala recompute over the gap-filled series") {
    val grid = run("q95_gap_fill").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val series = grid.groupBy(_._1).map { case (t, rows) =>
      t -> rows.sortBy(_._2).map(r => (r._2, r._3))
    }
    val out = run("q107_moving_avg").collect()
    assert(out.length == grid.length, "ma7 must cover the full dense grid")
    out.foreach { r =>
      val (t, day, ma) = (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getDouble(3))
      val s = series(t)
      val win = s.filter(x => x._1 <= day && x._1 > day - 7)
      val exp = BigDecimal(win.map(_._2).sum.toDouble / win.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ma == exp, s"$t $day: $ma vs $exp over ${win.length} days")
    }
  }

  test("q108 winsorized stats: clip counts bounded, mean inside [p10,p90]") {
    val out = run("q108_winsorized_stats").collect()
    out.foreach { r =>
      val (n, nLow, nHigh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (p10, p90, wm) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      // interpolated percentiles clip AT MOST ~10% strictly outside each side
      assert(nLow <= n / 10 + 1 && nHigh <= n / 10 + 1, r.toString)
      assert(p10 <= p90 && wm >= p10 - 1e-6 && wm <= p90 + 1e-6, r.toString)
      // winsorizing must pull the mean toward the median relative to raw
    }
    // the winsorized mean differs from the raw mean (outliers exist at
    // both ends of l_extendedprice, so clipping must move something)
    import spark.implicits._
    val raw = graft.operators.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg((sum($"l_extendedprice".cast("decimal(30,4)")).cast("double") /
        count(lit(1))).as("rawmean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.exists(r => math.abs(r.getDouble(6) - raw(r.getString(0))) > 1e-3))
  }

  test("q109 transition counts conserve events and shares sum to 1 per row") {
    val out = run("q109_transitions").collect()
    import spark.implicits._
    val ev = graft.operators.Tables.events(spark, dir)
    val nEvents = ev.count()
    val nUsers = ev.select($"user_id").distinct().count()
    // each user with k events contributes k-1 transitions
    assert(out.map(_.getLong(2)).sum == nEvents - nUsers)
    out.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$prev shares sum to $s")
    }
  }

  test("q110 collocation lift equals a full Scala recompute") {
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty).toSet))
    val nDocs = docs.length.toLong
    val df = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nab = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (_, toks) =>
      toks.foreach(t => df(t) += 1)
      val sorted = toks.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        nab((sorted(i), sorted(j))) += 1
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = nab.toSeq.collect { case ((a, b), n) if n >= 5 =>
      (a, b, df(a), df(b), n, r6(nDocs.toDouble * n / (df(a) * df(b))))
    }.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = run("q110_collocation_lift").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected)
  }

  test("q111 merge equals a full-outer coalesce merge (different construction)") {
    import spark.implicits._
    val o = graft.operators.Tables.orders(spark, dir)
    val base = o.filter($"o_orderkey" % 7 =!= 0)
    val delta = o.filter($"o_orderkey" % 3 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + lit(1.5))
    // alternative merge: full outer join, delta wins on conflict
    val alt = base.select($"o_orderkey", $"o_orderstatus".as("sa"), $"o_totalprice".as("pa"))
      .join(delta.select($"o_orderkey", $"o_orderstatus".as("sd"), $"o_totalprice".as("pd")),
        Seq("o_orderkey"), "full_outer")
      .select(coalesce($"sd", $"sa").as("o_orderstatus"),
        coalesce($"pd", $"pa").as("o_totalprice"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        graft.operators.Tables.dsum($"o_totalprice", 4).as("price_sum"))
      .orderBy($"o_orderstatus").collect()
    val got = run("q111_upsert_apply").collect()
    assert(got.toSeq == alt.toSeq)
  }

  test("q112 diff classes are all present and conserve keys") {
    val out = run("q112_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("inserted", "deleted", "updated", "unchanged"),
      s"classes: $out")
    import spark.implicits._
    val o = graft.operators.Tables.orders(spark, dir)
    val aKeys = o.filter($"o_orderkey" % 7 =!= 0).count()
    // total classified rows = |A ∪ B| = |A| + inserted
    assert(out.values.sum == aKeys + out("inserted"))
    // deleted = keys of the merged snapshot divisible by 11 that were in A
    val deletedExpected = o.filter($"o_orderkey" % 7 =!= 0)
      .filter($"o_orderkey" % 11 === 0).count()
    assert(out("deleted") == deletedExpected)
  }

  test("q113 split assignment is stable, stratified, and complete") {
    val out = run("q113_split_assign").collect()
    val total = out.map(_.getLong(3)).sum
    val docs = graft.operators.Tables.documents(spark, dir).count()
    assert(total == docs, "every doc gets exactly one split")
    // split of a given doc_id is reproducible from the md5 rule
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
      if ("0123456789ab".contains(h)) "train" else if ("cd".contains(h)) "val" else "test"
    }
    import spark.implicits._
    val sample = graft.operators.Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source").limit(50).collect()
    val bySplit = out.map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    sample.foreach { r =>
      val key = (r.getString(1), r.getString(2), split(r.getLong(0)))
      assert(bySplit.contains(key), s"doc ${r.getLong(0)} expected in stratum $key")
    }
  }

  test("q114 count-min never undercounts, for EVERY token, recomputed in Scala") {
    // rebuild the sketch and the truth table in plain Scala and check
    // the count-min guarantee (est >= true) across the whole
    // vocabulary, not just the published top-10
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\W+").filter(_.nonEmpty))
    def cellOf(tok: String, r: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tok#$r".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2)
      java.lang.Long.parseLong(hex, 16)
    }
    val truth = docs.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    docs.foreach(t => (0 until 4).foreach(r => cells((r, cellOf(t, r))) += 1))
    truth.foreach { case (t, n) =>
      val est = (0 until 4).map(r => cells((r, cellOf(t, r)))).min
      assert(est >= n, s"count-min undercounted $t: $est < $n")
    }
    // and the published top-10 agrees with this independent sketch
    val got = run("q114_countmin").collect()
    got.foreach { r =>
      val (tok, tr, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(truth(tok) == tr)
      assert((0 until 4).map(x => cells((x, cellOf(tok, x)))).min == est, tok)
      assert(r.getLong(3) == est - tr)
    }
    assert(got.length == 10)
  }

  test("q120 melt emits 3 rows per flag and preserves the wide totals") {
    def r(x: Double, scale: Int) =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    val raw = graft.operators.Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2), x.getDouble(3)))
    val expected = raw.groupBy(_._1).flatMap { case (flag, rows) =>
      Seq(
        (flag, "sum_disc", rows.map(t => r(t._4, 4)).sum.toDouble),
        (flag, "sum_price", rows.map(t => r(t._3, 4)).sum.toDouble),
        (flag, "sum_qty", rows.map(t => r(t._2, 2)).sum.toDouble))
    }.toSet
    val got = run("q120_unpivot").collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    val flags = raw.map(_._1).distinct.length
    assert(got.size == flags * 3)
  }

  test("q121 equals a Scala OLS over the zero-filled dense calendar") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = graft.operators.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day")).collect()
      .map(x => (x.getString(0), x.getDate(1).toLocalDate.toEpochDay))
    val (mn, mx) = (raw.map(_._2).min, raw.map(_._2).max)
    val counts = raw.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = raw.map(_._1).distinct.map { t =>
      val ys = (mn to mx).map(d => (d, counts.getOrElse((t, d), 0L)))
      val n = ys.size.toLong
      val sx = BigInt(ys.map(_._1).sum)
      val sy = BigInt(ys.map(_._2).sum)
      val sxx = ys.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = ys.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val slope = if (den == 0.0) 0.0 else r6(num / den)
      (t, n, slope, r6(sy.toDouble / n))
    }.toSet
    val got = run("q121_ols_trend").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q123 flags match a Scala median/MAD re-derivation (exact-integer gate)") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // interpolating median of sorted longs, scaled x2 so it's an exact Long
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.size
      s((n - 1) / 2) + s(n / 2)
    }
    val raw = graft.operators.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day")).collect()
      .map(x => (x.getString(0), x.getDate(1)))
    val daily = raw.groupBy(identity).map { case ((t, d), v) => (t, d, v.length.toLong) }.toSeq
    val expected = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val m2 = med2(rows.map(_._3))
      val devs = rows.map { case (_, d, n) => (d, n, math.abs(2 * n - m2)) }
      val mad4 = med2(devs.map(_._3))
      if (mad4 == 0) Seq.empty
      else devs.filter(_._3 * 10000 > mad4 * 22239).map { case (d, n, dev2) =>
        (t, d, n, r6(dev2 * 2.0 / (mad4 * 1.4826)))
      }
    }.toSet
    val got = run("q123_mad_outliers").collect()
      .map(x => (x.getString(0), x.getDate(1), x.getLong(2), x.getDouble(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the estimator's point: a median/MAD gate survives the spikes it
    // flags — every flagged count sits strictly off its type's median
    got.foreach { case (t, _, n, z) => assert(z > 0.0, s"$t/$n zero z") }
  }

  test("q126 change-point equals a BigInt CUSUM re-derivation") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = graft.operators.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day")).collect()
      .map(x => (x.getString(0), x.getDate(1).toLocalDate.toEpochDay))
    val expected = raw.map(_._1).distinct.sorted.map { t =>
      val counts = raw.filter(_._1 == t).groupBy(_._2)
        .map { case (d, v) => (d, v.size.toLong) }.toSeq.sortBy(_._1)
      val tt = counts.size.toLong
      val total = counts.map(_._2).sum
      var cum = 0L
      val cs = counts.zipWithIndex.map { case ((d, n), i) =>
        cum += n
        (d, (BigInt(tt) * BigInt(cum) - BigInt(i + 1) * BigInt(total)).abs)
      }
      // argmax |C'|, ties to the EARLIEST day
      val (cpd, cabs) = cs.maxBy { case (d, c) => (c, -d) }
      (t, cpd, r6(cabs.toDouble / (tt.toDouble * total.toDouble)), tt)
    }.toSeq
    val got = run("q126_cusum_changepoint").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"got=${got.take(3)} expected=${expected.take(3)}")
  }

  test("q133 LOCF fill equals a Scala carry-forward re-derivation") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val raw = graft.operators.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"), $"value").collect()
      .map(x => (x.getString(0), x.getDate(1).toLocalDate.toEpochDay, x.getDouble(2)))
    val daily = raw.groupBy(r => (r._1, r._2)).map { case ((t, d), v) =>
      (t, d) -> (v.map(x => d4(x._3)).sum.toDouble / v.length) }
    val (mn, mx) = (raw.map(_._2).min, raw.map(_._2).max)
    val expected = raw.map(_._1).distinct.sorted.toSeq.flatMap { t =>
      var carry: Option[Double] = None
      (mn to mx).map { d =>
        val obs = daily.get((t, d))
        if (obs.isDefined) carry = obs
        (t, d, carry.map(r6), obs.isDefined)
      }
    }
    val got = run("q133_locf_fill").collect().map { r =>
      (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))
    }.toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    // the fill's defining law: a carried cell equals the latest
    // observed cell before it (vacuous only if the grid is dense)
    got.filterNot(_._4).foreach { case (t, d, v, _) =>
      val prev = got.filter(x => x._1 == t && x._2 < d && x._4).maxByOption(_._2)
      assert(v == prev.flatMap(_._3), s"carry at ($t,$d)") }
  }

  test("q134 user growth: conservation laws against raw re-derivation") {
    import spark.implicits._
    val raw = graft.operators.Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day")).collect()
      .map(x => (x.getLong(0), x.getDate(1).toLocalDate.toEpochDay))
    val firstSeen = raw.groupBy(_._1).map { case (u, v) => (u, v.map(_._2).min) }
    val expected = raw.map(_._2).distinct.sorted.toSeq.map { d =>
      (d, raw.filter(_._2 == d).map(_._1).distinct.length.toLong,
        firstSeen.count(_._2 == d).toLong,
        firstSeen.count(_._2 <= d).toLong)
    }
    val got = run("q134_user_growth").collect().map { r =>
      (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1), r.getLong(2), r.getLong(3))
    }.toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    // conservation: the final cumulative equals total distinct users,
    // and new_users sums to the same — no user counted twice or lost
    assert(got.last._4 == firstSeen.size.toLong)
    assert(got.map(_._3).sum == firstSeen.size.toLong)
    got.foreach { case (d, dau, nu, _) => assert(nu <= dau, s"day $d") }
  }

  test("q135 histogram drift equals a BigInt L1 re-derivation") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = graft.operators.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"), $"value").collect()
      .map(x => (x.getString(0), x.getDate(1).toLocalDate.toEpochDay, x.getDouble(2)))
    val (dmn, dmx) = (raw.map(_._2).min, raw.map(_._2).max)
    val expected = raw.map(_._1).distinct.sorted.toSeq.map { t =>
      val vs = raw.filter(_._1 == t)
      val (vmn, vmx) = (vs.map(_._3).min, vs.map(_._3).max)
      def bin(v: Double) =
        if (vmx == vmn) 0 else math.min(9, math.floor((v - vmn) * 10.0 / (vmx - vmn)).toInt)
      val (f, sHalf) = vs.partition(r => r._2 * 2 <= dmn + dmx)
      val h1 = f.groupBy(r => bin(r._3)).view.mapValues(_.length.toLong).toMap
      val h2 = sHalf.groupBy(r => bin(r._3)).view.mapValues(_.length.toLong).toMap
      val (n1, n2) = (f.length.toLong, sHalf.length.toLong)
      val drift =
        if (n1 == 0 || n2 == 0) None
        else {
          val l1 = (0 to 9).map(b => (BigInt(h1.getOrElse(b, 0L)) * n2
            - BigInt(h2.getOrElse(b, 0L)) * n1).abs).sum
          Some(r6(l1.toDouble / (2.0 * n1 * n2)))
        }
      (t, n1, n2, drift)
    }
    val got = run("q135_histogram_drift").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    // laws: drift is a total-variation distance — in [0,1]; halves
    // partition each type's events
    got.foreach { case (t, n1, n2, dr) =>
      dr.foreach(d => assert(d >= 0.0 && d <= 1.0, s"$t drift $d"))
      assert(n1 + n2 == raw.count(_._1 == t).toLong, s"$t halves lost rows") }
  }

  test("q130 rollup levels equal a raw re-derivation; sketch stays in band") {
    val raw = graft.operators.Tables.documents(spark, dir)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def grp(rows: Array[(String, String, String)]) =
      (rows.length.toLong, rows.map(_._3).distinct.length.toLong)
    val leaves = raw.groupBy(r => (r._1, r._2)).map { case ((s, l), v) =>
      (Option(s), Option(l)) -> grp(v) }
    val subs = raw.groupBy(_._1).map { case (s, v) =>
      (Option(s), Option.empty[String]) -> grp(v) }
    val expected = leaves ++ subs +
      ((Option.empty[String], Option.empty[String]) -> grp(raw))
    val got = run("q130_hll_rollup").collect().map { r =>
      ((Option(r.getString(0)), Option(r.getString(1))),
        (r.getLong(2), r.getLong(3)), r.getBoolean(4))
    }
    assert(got.map(x => x._1 -> x._2).toMap == expected,
      "rollup level counts diverge from raw re-derivation")
    assert(got.length == expected.size, "duplicate or missing rollup rows")
    // the epsilon-band gate itself: every sketch estimate within 5%
    got.foreach { case (k, _, ok) => assert(ok, s"$k sketch out of band") }
  }

  test("q160 peel census equals a brute-force k-core reference, with a genuinely multi-round cascade") {
    import spark.implicits._
    import java.nio.file.Files
    // stable core + a DOMINO CHAIN that peels exactly one node per
    // round: K(40,40) core (deg >= 40, never peels), then customers
    // D0..D2 (ids 100..102) and suppliers T0..T1 (ids 100..101) where
    // D0 has deg 29 (< k, dies round 1) and each later domino has deg
    // exactly 30 INCLUDING one edge to the previous domino — so every
    // peel pushes the next node below k, one round at a time
    val core = for (c <- 0 until 40; s <- 0 until 40) yield (c.toLong, s.toLong)
    // chain links (each counts for BOTH endpoints):
    //   D0 -l1- T0 -l2- D1 -l3- T1 -l4- D2
    // degrees: D0 = l1+28core = 29 (< k); middles = 2 links + 28 core
    // = 30; D2 = l4 + 29 core = 30
    val dominoes =
      ((100L, 100L) +: (0 until 28).map(s => (100L, s.toLong))) ++   // D0 (+l1)
        (0 until 28).map(c => (c.toLong, 100L)) ++                   // T0 core (l1+l2 elsewhere)
        ((101L, 100L) +: (0 until 28).map(s => (101L, s.toLong))) ++ // l2 + D1 core
        ((101L, 101L) +: (0 until 28).map(c => (c.toLong, 101L))) ++ // l3 + T1 core
        ((102L, 101L) +: (0 until 29).map(s => (102L, s.toLong)))    // l4 + D2 core
    val edges = core ++ dominoes
    val d = Files.createTempDirectory("kcore").toString
    edges.zipWithIndex.map { case ((c, _), k) => (k.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    edges.zipWithIndex.map { case ((_, sp), k) => (k.toLong, sp) }
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")

    // brute-force reference: the same fixed 6-round, k = 30 peel
    def census(es: Seq[(String, String)]): (Long, Long) = {
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      (nodes.size.toLong, es.size.toLong)
    }
    var cur = edges.map { case (c, s) => (s"c$c", s"s$s") }
    val expected = (0 until 6).map { _ =>
      val row = census(cur)
      val deg = (cur.map(_._1) ++ cur.map(_._2)).groupBy(identity).view.mapValues(_.size)
      val keep = deg.filter(_._2 >= 30).keySet
      cur = cur.filter(e => keep(e._1) && keep(e._2))
      row
    }
    val got = SparkEntry.queries("q160_kcore")(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    // the domino chain bit: every round's census is DIFFERENT (one
    // node peels per round — the multi-round cascade k-core exists for)
    assert(expected.distinct.size == 6, s"cascade too shallow: $expected")
  }

  test("q169 equals an in-memory Heaps recount (deciles, firsts, cumulative TTR)") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty)))
    val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
    def dec(id: Long): Int = (((id - mn) * 10) / (mx - mn + 1)).toInt
    val perDec = rows.groupBy(r => dec(r._1))
      .map { case (d, rs) => d -> ((rs.size.toLong, rs.map(_._2.size.toLong).sum)) }
    val firsts = rows.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).min }
    val newT = firsts.values.toSeq.groupBy(dec)
      .map { case (d, xs) => d -> xs.size.toLong }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = perDec.keys.toSeq.sorted.map { d =>
      val (nd, ntok) = perDec(d)
      val cumT = (0 to d).map(newT.getOrElse(_, 0L)).sum
      val cumTok = (0 to d).flatMap(perDec.get(_).map(_._2)).sum
      (d, nd, ntok, newT.getOrElse(d, 0L), cumT, cumTok, r6(cumT.toDouble / cumTok))
    }
    val got = run("q169_vocab_growth").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("q172 split leakage equals an in-memory recount with the q113 split rule") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.head match {
        case c if c <= '9' || c == 'a' || c == 'b' => "train"
        case 'c' | 'd' => "val"
        case _ => "test"
      }
    }
    val bySplit = docs.groupBy(d => split(d._1))
    val spanning = docs.groupBy(_._2)
      .filter(_._2.map(d => split(d._1)).distinct.size > 1)
      .values.flatten.toSet
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = bySplit.toSeq.map { case (sp, ds) =>
      val leaked = ds.count(spanning)
      (sp, ds.size.toLong, leaked.toLong, r6(leaked.toDouble / ds.size))
    }.sortBy(_._1)
    val got = run("q172_split_leakage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // plus a fixture where leakage is KNOWN nonzero: same text under
    // ids landing in different splits
    import spark.implicits._
    import java.nio.file.Files
    val ids = (0L to 200L)
    val trainId = ids.find(i => split(i) == "train").get
    val testId = ids.find(i => split(i) == "test").get
    val valId = ids.find(i => split(i) == "val").get
    val fix = Seq(
      (trainId, "leaky shared body", "en", "s1", 17L),
      (testId, "leaky shared body", "en", "s1", 17L),
      (valId, "clean body", "en", "s1", 10L))
    val d2 = Files.createTempDirectory("leak").toString
    fix.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val got2 = SparkEntry.queries("q172_split_leakage")(spark, d2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == Set(("train", 1L, 1L), ("test", 1L, 1L), ("val", 1L, 0L)), got2.toString)
  }

  test("q173 OOV rates equal an in-memory recount over the same split rule") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty)))
    def split(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.head match {
        case c if c <= '9' || c == 'a' || c == 'b' => "train"
        case 'c' | 'd' => "val"
        case _ => "test"
      }
    }
    def grams(ts: Seq[String], n: Int): Seq[String] =
      if (ts.size < n) Seq.empty else ts.sliding(n).map(_.mkString(" ")).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (for (n <- Seq(1, 2); sp <- Seq("test", "val")) yield {
      val by: Map[String, Seq[String]] = docs.groupBy(d => split(d._1))
        .map { case (k, ds) => k -> ds.toSeq.flatMap(d => grams(d._2, n)) }
        .withDefaultValue(Seq.empty[String])
      val train = by("train").toSet
      val inst = by(sp)
      if (inst.isEmpty) None else {
        val types = inst.distinct
        val oovT = types.count(!train(_))
        val oovI = inst.count(!train(_))
        Some((n, sp, types.size.toLong, oovT.toLong, r6(oovT.toDouble / types.size),
          inst.size.toLong, oovI.toLong, r6(oovI.toDouble / inst.size)))
      }
    }).flatten.sortBy(t => (t._1, t._2))
    val got = run("q173_oov_rate").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }
}
