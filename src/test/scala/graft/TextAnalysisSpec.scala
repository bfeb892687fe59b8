package graft

import java.nio.file.Files

/** Fixture tests for the text-analysis family's newest operator —
  * the oracle gate covers the registered corpus; these pin designed
  * edge semantics on constructed documents. */
class TextAnalysisSpec extends SparkSuite {

  test("q193 code-switching: per-line votes, abstention without signal, dominant-language priority") {
    import spark.implicits._
    val d = Files.createTempDirectory("codeswitch").toString
    val en = "the cat sat of the mat and it is to" // 10 toks, en signal
    val de = "der hund ist nicht die katze und der das und"  // 10 toks, de signal
    val noise = (1 to 10).map(i => s"x$i").mkString(" ")     // no stopword signal
    val docs = Seq(
      // doc 1: labeled en, 2 en lines + 1 de line -> switch_frac 1/3
      (1L, s"$en $en $de", "en"),
      // doc 2: labeled de, en-dominant lines -> dominant en, switch 2/2
      (2L, s"$en $en", "de"),
      // doc 3: all noise -> 0 scored lines, dominant 'none', switch 0
      (3L, s"$noise $noise", "en"),
      // doc 4: one de line + one noise line (abstains) -> scored 1,
      // matching 1, dominant de
      (4L, s"$de $noise", "de"))
    docs.map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val got = SparkEntry.queries("q193_code_switching")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), r.getDouble(6)))).toMap

    assert(got(1L) == ((3L, 3L, 2L, "en", 0.333333)), got(1L).toString)
    assert(got(2L) == ((2L, 2L, 0L, "en", 1.0)), got(2L).toString)
    assert(got(3L) == ((2L, 0L, 0L, "none", 0.0)), got(3L).toString)
    assert(got(4L) == ((2L, 1L, 1L, "de", 0.0)), got(4L).toString)
  }

  test("q221 NB quality filter equals an independent in-memory train/score/threshold/confusion") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val stopEn = Set("the", "a", "of", "and", "to", "in", "is", "it")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def bucket(tok: String): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes)
        .take(1).map("%02x".format(_)).mkString, 16)
    // independent pipeline: tokenize -> label -> split -> train counts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.nonEmpty)
      .map { case (id, text) =>
        (id, text.toLowerCase.split("\\W+").filter(_.nonEmpty)) }
      .filter(_._2.nonEmpty)
      .map { case (id, toks) =>
        val good = r6(toks.count(stopEn).toDouble / toks.length) >= 0.10
        (id, toks, good, id % 5 != 0) }
    val train = docs.filter(_._4)
    val cg = new scala.collection.mutable.HashMap[Int, Long].withDefaultValue(0L)
    val cb = new scala.collection.mutable.HashMap[Int, Long].withDefaultValue(0L)
    train.foreach { case (_, toks, good, _) =>
      toks.foreach(t => if (good) cg(bucket(t)) += 1 else cb(bucket(t)) += 1) }
    val (ng, nb) = (cg.values.sum, cb.values.sum)
    val out = SparkEntry.queries("q221_nb_quality_filter")(spark, dir)
      .orderBy("alpha").collect()
    assert(out.length == 3)
    for ((alpha, row) <- Seq(1, 5, 25).zip(out)) {
      def w(b: Int): Double = {
        val rg = (cg(b) + alpha).toDouble / (ng + 256L * alpha)
        val rb = (cb(b) + alpha).toDouble / (nb + 256L * alpha)
        r6((rg - rb) / (rg + rb))
      }
      def score(toks: Array[String]): Double = {
        val tf = toks.groupBy(bucket).view.mapValues(_.length.toLong)
        val s = tf.map { case (b, n) => d6(w(b) * n) }.reduce(_ + _)
        r6(s.toDouble / toks.length)
      }
      val trainScores = train.map { case (_, toks, good, _) => (good, score(toks)) }
      def classMean(g: Boolean) = {
        val xs = trainScores.filter(_._1 == g).map(x => d6(x._2))
        xs.reduce(_ + _).toDouble / xs.length
      }
      val cut = r6((classMean(true) + classMean(false)) / 2)
      assert(row.getAs[Double]("threshold") == cut,
        s"alpha $alpha: threshold ${row.getAs[Double]("threshold")} != $cut")
      val test = docs.filterNot(_._4)
      val tp = test.count { case (_, t, g, _) => score(t) > cut && g }
      val fp = test.count { case (_, t, g, _) => score(t) > cut && !g }
      val fn = test.count { case (_, t, g, _) => score(t) <= cut && g }
      val tn = test.count { case (_, t, g, _) => score(t) <= cut && !g }
      assert((row.getAs[Long]("tp"), row.getAs[Long]("fp"),
        row.getAs[Long]("fn"), row.getAs[Long]("tn")) ==
        ((tp.toLong, fp.toLong, fn.toLong, tn.toLong)),
        s"alpha $alpha confusion mismatch")
      assert(row.getAs[Long]("n_test") == test.length)
      assert(row.getAs[Double]("accuracy") == r6((tp + tn).toDouble / test.length))
    }
  }
}
