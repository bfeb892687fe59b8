package graft

/** Dual-implementation checks for the similarity family's round-4
  * addition — the DuckDB oracle proves cross-engine equality; this
  * proves the SEMANTICS (exact-decimal centroids, IEEE cosine chain)
  * are the intended ones. */
class SimilaritySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q118 equals an independent Scala centroid cosine computation") {
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    // mirror davg(x, 15): each double rounds to decimal(30,15) via its
    // shortest-decimal form HALF_UP (Spark's Decimal(double) path),
    // the decimal sum is exact, then ONE IEEE division by the count
    def d15(x: Double) = BigDecimal(x).setScale(15, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = raw.groupBy(_._1).map { case (l, vs) =>
      val n = vs.length
      val cv = vs.head._2.indices.map { j =>
        vs.map(v => d15(v._2(j))).sum.toDouble / n
      }.toArray
      l -> ((cv, n.toLong))
    }
    val expected = (for {
      (la, (cva, na)) <- cents
      (lb, (cvb, nb)) <- cents if la < lb
    } yield (la, lb, na, nb,
      r6(dot(cva, cvb) / (math.sqrt(dot(cva, cva)) * math.sqrt(dot(cvb, cvb)))))).toSet
    val got = run("q118_label_centroid_overlap").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got.size == expected.size && got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the matrix is complete: C(|labels|, 2) pairs
    val nLabels = cents.size
    assert(got.size == nLabels * (nLabels - 1) / 2)
  }

  test("q124 semdedup equals a Scala no-earlier-neighbor filter") {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val byLabel = raw.groupBy(_._2)
    // the one-pass dominance rule: drop v iff ANY same-label u with
    // u.id < v.id has rounded cosine >= tau (kept or not)
    val dropped = byLabel.values.flatMap { vs =>
      vs.collect { case (idb, _, vb) if vs.exists { case (ida, _, va) =>
        ida < idb && r6(dot(va, vb) /
          (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))) >= 0.35
      } => idb }
    }.toSet
    val expected = raw.filter(v => !dropped(v._1)).map(v => (v._1, v._2)).toSet
    val got = run("q124_semdedup").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // keep-first law: every label's minimum vec_id always survives
    byLabel.foreach { case (l, vs) =>
      assert(got.contains((vs.map(_._1).min, l)), s"label $l lost its head") }
  }

  test("q136 per-dimension stats equal a decimal-quantized re-derivation") {
    def d10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val nDims = raw.head.length
    val expected = (0 until nDims).map { d =>
      val xs = raw.map(_(d))
      val n = xs.length.toLong
      val mean = xs.map(d10).sum.toDouble / n
      val ex2 = xs.map(x => d10(x * x)).sum.toDouble / n
      (d, n, r6(mean), r6(ex2 - mean * mean),
        r6(xs.min), r6(xs.max), r6(xs.count(_ == 0.0).toDouble / n))
    }
    val got = run("q136_embedding_stats").collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
    }.toSeq
    assert(got == expected, s"got=${got.take(2)} expected=${expected.take(2)}")
    // health-check laws: variance is non-negative post-rounding slack
    got.foreach { case (d, _, _, v, mn, mx, zf) =>
      assert(v >= -1e-6 && mn <= mx && zf >= 0.0 && zf <= 1.0, s"dim $d") }
  }
}
