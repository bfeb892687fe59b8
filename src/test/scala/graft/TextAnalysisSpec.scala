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
}
