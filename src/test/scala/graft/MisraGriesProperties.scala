package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MisraGries

/** ScalaCheck laws for the Misra–Gries mergeable summary: the error
  * bound and the heavy-item retention guarantee must hold for EVERY
  * item over arbitrary streams, capacities, chunkings and merge-tree
  * shapes — the property Spark's nondeterministic shuffle-merge order
  * relies on (q131 publishes only facts these laws protect). */
object MisraGriesProperties extends Properties("MisraGries") {

  // Zipf-flavored streams: small alphabet with skewed weights plus a
  // singleton tail, the realistic shape for token frequency
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    xs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(0, 4).map(i => s"h$i"),
      3 -> Gen.choose(0, 20).map(i => s"m$i"),
      2 -> Gen.choose(0, 10000).map(i => s"t$i")))
  } yield xs

  private val capGen: Gen[Int] = Gen.choose(1, 12)

  private def truthOf(xs: List[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def holds(m: Int, xs: List[String], est: Map[String, Long]): Boolean = {
    val n = xs.length.toLong
    est.size <= m && truthOf(xs).forall { case (k, t) =>
      val e = est.getOrElse(k, 0L)
      e <= t && (t - e) * (m + 1) <= n
    }
  }

  property("single-pass bound: true - N/(m+1) <= est <= true, <= m counters") =
    forAll(streamGen, capGen) { (xs, m) =>
      val mg = new MisraGries(m)
      holds(m, xs, mg.finish(xs.foldLeft(mg.zero)(mg.reduce)))
    }

  property("bound survives ANY chunking + left-fold merge") =
    forAll(streamGen, capGen, Gen.choose(1, 7)) { (xs, m, chunks) =>
      val mg = new MisraGries(m)
      val size = math.max(1, xs.length / chunks)
      val parts = xs.grouped(size).map(_.foldLeft(mg.zero)(mg.reduce)).toList
      val merged = parts.reduceLeftOption(mg.merge).getOrElse(mg.zero)
      holds(m, xs, mg.finish(merged))
    }

  property("bound survives a RANDOM binary merge tree") =
    forAll(streamGen, capGen, Gen.long) { (xs, m, seed) =>
      val mg = new MisraGries(m)
      val rnd = new scala.util.Random(seed)
      val size = math.max(1, xs.length / 5)
      var parts = xs.grouped(size).map(_.foldLeft(mg.zero)(mg.reduce)).toBuffer
      while (parts.size > 1) {
        val i = rnd.nextInt(parts.size)
        val a = parts.remove(i)
        val j = rnd.nextInt(parts.size)
        val b = parts.remove(j)
        parts += mg.merge(a, b)
      }
      holds(m, xs, mg.finish(parts.headOption.getOrElse(mg.zero)))
    }

  property("retention: every item with true > N/(m+1) is in the summary") =
    forAll(streamGen, capGen) { (xs, m) =>
      val mg = new MisraGries(m)
      val est = mg.finish(xs.foldLeft(mg.zero)(mg.reduce))
      val line = xs.length.toLong / (m + 1)
      truthOf(xs).forall { case (k, t) => t <= line || est.contains(k) }
    }
}
