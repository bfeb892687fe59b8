package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck law for the q146/q166/q167 blocking theorem (Bocek et
  * al. 2007, stated in RetrievalOps.deletionVariantsSql's scaladoc):
  * any two strings within levenshtein distance 2 share a member of
  * their <= 2-deletion neighborhoods — each substitution deletes one
  * char from BOTH sides, each insert/delete deletes from ONE. The
  * operator relies on this for LOSSLESS candidate generation; the
  * sf0.001 brute-force spec checks it on one fixture, this property
  * quantifies it over random strings and random edit scripts.
  *
  * The companion bridge test (FastSsGuardSpec: "the SQL deletion
  * neighborhood equals this reference") ties [[variants]] to the
  * actual Spark expression, so the theorem proved here is about the
  * shipped code, not a lookalike.
  */
object FastSsProperties extends Properties("FastSS") {

  /** The <= 2-deletion neighborhood — pure-Scala reference of
    * deletionVariantsSql (without the length cap: words here are
    * <= 40 chars, where the cap is identity). */
  private[graft] def variants(s: String): Set[String] = {
    val d1 = (0 until s.length).map(i => s.take(i) + s.drop(i + 1))
    val d2 = for {
      i <- 0 until s.length
      t = s.take(i) + s.drop(i + 1)
      j <- 0 until t.length
    } yield t.take(j) + t.drop(j + 1)
    (Set(s) ++ d1 ++ d2)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val alphabet = Gen.oneOf('a', 'b', 'c')

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, alphabet)
  } yield cs.mkString

  /** One random edit: insert, delete, or substitute at a random spot. */
  private def editGen(s: String): Gen[String] = {
    val ins = for {
      i <- Gen.choose(0, s.length); c <- alphabet
    } yield s.take(i) + c + s.drop(i)
    val del =
      if (s.isEmpty) ins
      else Gen.choose(0, s.length - 1).map(i => s.take(i) + s.drop(i + 1))
    val sub =
      if (s.isEmpty) ins
      else for { i <- Gen.choose(0, s.length - 1); c <- alphabet }
        yield s.take(i) + c + s.drop(i + 1)
    Gen.oneOf(ins, del, sub)
  }

  private val pairGen: Gen[(String, String)] = for {
    a <- wordGen
    k <- Gen.choose(0, 2)
    b <- (0 until k).foldLeft(Gen.const(a))((g, _) => g.flatMap(editGen))
  } yield (a, b)

  property("strings within 2 edits share a <=2-deletion variant (lossless blocking)") =
    forAll(pairGen) { case (a, b) =>
      lev(a, b) > 2 || (variants(a) & variants(b)).nonEmpty
    }

  property("the neighborhood is complete: every string at deletion-distance <=2 is a member") =
    forAll(wordGen) { a =>
      // delete any one or two chars by index — must all be present
      val oneDel = (0 until a.length).forall(i => variants(a)(a.take(i) + a.drop(i + 1)))
      val sizeOk = variants(a).size <= 1 + a.length + a.length * (a.length - 1) / 2
      oneDel && sizeOk
    }
}
