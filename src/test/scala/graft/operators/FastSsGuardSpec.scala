package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The FastSS deletion-neighborhood length guard (round-6): the
  * D<=2 fan-out is 1 + L + C(L,2), quadratic in string length, so
  * [[RetrievalOps.deletionVariantsSql]] caps the expanded prefix at
  * [[RetrievalOps.FastSsMaxLen]] chars. These cases pin the three
  * contract points: bounded fan-out for pathological input, identity
  * behavior for normal-length strings, and recall for long-string
  * pairs whose edits lie beyond the capped prefix (they share the
  * exact prefix key). */
class FastSsGuardSpec extends SparkSuite {
  import spark.implicits._

  private val maxLen = RetrievalOps.FastSsMaxLen
  private val bound = 1 + maxLen + maxLen * (maxLen - 1) / 2 // 2081 at 64

  private def variantCount(s: String): Long =
    Seq(s).toDF("nm")
      .select(size(expr(RetrievalOps.deletionVariantsSql("nm"))).as("n"))
      .head().getInt(0).toLong

  test("a 1 KB string fans out to at most 1 + L + C(L,2) variants at L = maxLen") {
    val pathological = "x" * 1000
    val n = variantCount(pathological)
    // without the cap this would be 1 + 1000 + C(1000,2) ~ 500k
    assert(n <= bound, s"fan-out $n exceeds the constructed bound $bound")
    assert(n > 1, "guard must still emit a non-trivial neighborhood")
  }

  test("strings at or below maxLen expand the FULL exact neighborhood (cap is identity)") {
    // all-distinct chars => no variant collisions: count is exactly 1 + L + C(L,2)
    val s = ('a' to 'l').mkString // L = 12, the q146 name regime
    assert(variantCount(s) == 1 + 12 + 12 * 11 / 2)
  }

  test("long-string pairs with edits beyond the prefix are still found by the variant join") {
    // two 1000-char names differing only at position 900: ed = 1,
    // identical first-64 prefix => they share the exact prefix key
    val base = ("ab" * 500)
    val mutated = base.updated(900, 'z')
    val names = Seq(base, mutated).toDF("nm")
    val variants = names.select($"nm", explode(expr(RetrievalOps.deletionVariantsSql("nm"))).as("v"))
    val pairs = variants.as("a")
      .join(variants.as("b"), $"a.v" === $"b.v" && $"a.nm" < $"b.nm")
      .select($"a.nm".as("na"), $"b.nm".as("nb")).distinct()
      .withColumn("dist", levenshtein($"na", $"nb"))
      .where($"dist" <= 2)
      .collect()
    assert(pairs.length == 1 && pairs.head.getInt(2) == 1,
      s"expected the ed=1 long pair to survive the capped block join, got ${pairs.length} rows")
  }

  test("the SQL deletion neighborhood equals FastSsProperties' pure-Scala reference (the theorem bridge)") {
    // FastSsProperties proves the lossless-blocking theorem over the
    // pure-Scala `variants`; this test ties that reference to the
    // SHIPPED Spark expression on 100 seeded-random words, so the
    // ScalaCheck law is about the actual code path
    val rnd = new scala.util.Random(46)
    val words = Seq.fill(100)(
      (0 until rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val got = words.toDF("nm")
      .select($"nm", expr(RetrievalOps.deletionVariantsSql("nm")).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    words.foreach { w =>
      assert(got(w) == graft.FastSsProperties.variants(w),
        s"SQL neighborhood of '$w' diverges from the reference")
    }
  }

  test("oracle-gate precondition: every gate corpus keeps part names at or below maxLen") {
    // the q146/q166/q167 DuckDB oracles run an UNCAPPED quadratic
    // levenshtein join; the Spark side blocks on the capped-prefix
    // FastSS neighborhood. The two are the same algorithm exactly when
    // every name is <= maxLen (the cap is identity there). This pins
    // that precondition on all three gate corpora, so a future
    // testdata change with >64-char names fails HERE with a message,
    // not in the driver gate as an unexplained hash mismatch (the
    // round-6 ADVICE divergence scenario: >=2 indels inside the
    // prefix of a >64-char name).
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val mx = spark.read.parquet(s"/root/testdata/$sf/part.parquet")
        .select(max(length($"p_name"))).head().getInt(0)
      assert(mx <= maxLen,
        s"$sf part names reach $mx chars > cap $maxLen: the uncapped oracle and " +
          "the capped engine would no longer compute the same pair set")
    }
  }
}
