package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.QSketchState

/** ScalaCheck laws for the deterministic KLL/MRL-style quantile
  * sketch: the SELF-CERTIFIED rank-error budget (`errBound` plus one
  * max-level weight of quantile-walk slop) must contain the true rank
  * of every estimate, for arbitrary data, buffer sizes, chunkings and
  * merge-tree shapes — the property Spark's nondeterministic
  * shuffle-merge order relies on (q141 publishes only facts these
  * laws protect), mirroring MisraGriesProperties for the counter
  * sketch. */
object QuantileSketchProperties extends Properties("QuantileSketch") {

  // mixed-shape streams: heavy ties (discrete), smooth values, outliers
  private val streamGen: Gen[List[Double]] = for {
    n <- Gen.choose(0, 2000)
    xs <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.choose(1, 50).map(_.toDouble),
      4 -> Gen.choose(0.0, 1e6),
      1 -> Gen.choose(-1e9, 1e9)))
  } yield xs

  private val kGen: Gen[Int] = Gen.choose(8, 48)
  private val pGen: Gen[Double] = Gen.oneOf(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def build(k: Int, xs: List[Double]): QSketchState = {
    val s = new QSketchState(k)
    xs.foreach(s.add)
    s
  }

  /** True-rank interval of the estimate must overlap the target rank
    * within budget B = errBound + maxLevelWeight (the walk can stop
    * anywhere inside the returned item's weight). */
  private def holds(xs: List[Double], s: QSketchState, p: Double): Boolean = {
    if (xs.isEmpty) return s.n == 0
    val est = s.quantile(p)
    val target = math.max(1L, math.ceil(p * xs.length).toLong)
    val below = xs.count(_ < est).toLong
    val atOrBelow = xs.count(_ <= est).toLong
    val b = s.errBound + (1L << (s.levels.length - 1))
    below - b <= target && target <= atOrBelow + b
  }

  property("single-pass: every estimate's true rank is inside the certified budget") =
    forAll(streamGen, kGen, pGen) { (xs, k, p) =>
      holds(xs, build(k, xs), p)
    }

  property("state stays bounded: <= k items per level, n preserved") =
    forAll(streamGen, kGen) { (xs, k) =>
      val s = build(k, xs)
      s.n == xs.length && s.levels.forall(_.length <= k)
    }

  property("budget survives ANY chunking + left-fold merge") =
    forAll(streamGen, kGen, pGen, Gen.choose(1, 7)) { (xs, k, p, chunks) =>
      val size = math.max(1, xs.length / chunks)
      val parts = xs.grouped(size).map(c => build(k, c)).toList
      val merged = parts.reduceLeftOption(_.merge(_)).getOrElse(new QSketchState(k))
      holds(xs, merged, p)
    }

  property("budget survives a RANDOM binary merge tree") =
    forAll(streamGen, kGen, pGen, Gen.long) { (xs, k, p, seed) =>
      val rnd = new scala.util.Random(seed)
      val size = math.max(1, xs.length / 5)
      var parts = xs.grouped(size).map(c => build(k, c)).toBuffer
      while (parts.size > 1) {
        val a = parts.remove(rnd.nextInt(parts.size))
        val b = parts.remove(rnd.nextInt(parts.size))
        parts += a.merge(b)
      }
      holds(xs, parts.headOption.getOrElse(new QSketchState(k)), p)
    }

  property("production shape: k=512 keeps rank error under 2% at 100k values") =
    forAll(Gen.long) { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(100000)(rnd.nextDouble() * 1e6)
      val s = build(512, xs)
      val budgetOk = s.errBound + (1L << (s.levels.length - 1)) <= 2000
      budgetOk && List(0.5, 0.9).forall { p =>
        val est = s.quantile(p)
        val target = math.ceil(p * xs.length).toLong
        math.abs(xs.count(_ <= est) - target) <= 2000
      }
    }
}
