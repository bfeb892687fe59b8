package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck law for q159's central claim: for a WELL-FORMED merge
  * table (every composite operand produced by an earlier merge — the
  * property BPE training guarantees), one ascending
  * leftmost-non-overlapping `replace` pass per merge over the
  * self-delimited symbol string equals the CANONICAL greedy encode
  * (repeatedly apply the lowest-rank applicable merge, leftmost
  * first). The operator's scaladoc states this as a theorem; this
  * property pins it across random well-formed tables and random
  * words, not just the fixed table the registered query ships.
  *
  * Both implementations here are pure Scala: `chainEncode` mirrors
  * the SQL semantics exactly (String.replace is leftmost
  * non-overlapping in both engines), `canonical` is the textbook
  * one-pair-at-a-time greedy. A counterexample would falsify the
  * documented proof, not just a test vector.
  */
object BpeChainProperties extends Properties("BpeChain") {

  private val alphabet = "abcd"

  /** Random well-formed table: each merge joins two symbols drawn
    * from {single chars} ∪ {outputs of earlier merges}. */
  private val tableGen: Gen[List[(String, String)]] = {
    def step(acc: List[(String, String)], avail: List[String], k: Int): Gen[List[(String, String)]] =
      if (k == 0) Gen.const(acc.reverse)
      else for {
        x <- Gen.oneOf(avail)
        y <- Gen.oneOf(avail)
        if !acc.contains((x, y)) // duplicate merges are never produced by training
        r <- step((x, y) :: acc, (x + y) :: avail, k - 1)
      } yield r
    for {
      k <- Gen.choose(1, 6)
      t <- step(Nil, alphabet.map(_.toString).toList, k)
    } yield t
  }

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(0, 14)
    cs <- Gen.listOfN(n, Gen.oneOf(alphabet.toSeq))
  } yield cs.mkString

  /** The SQL replace-chain semantics: self-delimited symbols, one
    * leftmost-non-overlapping global replace per merge, ascending. */
  private def chainEncode(word: String, merges: List[(String, String)]): List[String] = {
    var s = word.map(c => s" $c ").mkString("")
    for ((x, y) <- merges) s = s.replace(s" $x  $y ", s" $x$y ")
    s.trim.split("  ").toList.filter(_.nonEmpty)
  }

  /** Canonical greedy: repeatedly apply the lowest-rank applicable
    * merge at its leftmost occurrence, one pair at a time. */
  private def canonical(word: String, merges: List[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var go = syms.nonEmpty
    while (go) {
      val cands = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) go = false
      else {
        val (_, i) = cands.min
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms.toList
  }

  property("ascending replace chain == canonical greedy for well-formed tables") =
    forAll(tableGen, wordGen) { (merges, word) =>
      chainEncode(word, merges) == canonical(word, merges)
    }

  property("encode is a partition of the word (concatenation restores it)") =
    forAll(tableGen, wordGen) { (merges, word) =>
      chainEncode(word, merges).mkString == word
    }

  // ---- the q148 ORACLE's per-round claim (round 7) -------------------
  // q148's DuckDB oracle applies each trained merge by ONE delimited-
  // string replace, while the Spark side is a greedy left fold
  // (`aggregate`: merge when acc.last == l && x == r, the just-merged
  // symbol never re-splitting). The equivalence needs NO
  // well-formedness at the single-round level: symbols are space-free,
  // and a just-created 'lr' can never match the round's own l (that
  // would need l = l+r, impossible for non-empty r) — so it holds for
  // ARBITRARY symbol sequences and rules, which is what this property
  // quantifies over (strictly stronger than the trained-table case the
  // query hits).

  private val symGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
  } yield cs.mkString

  private val symsGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 10)
    ss <- Gen.listOfN(n, symGen)
  } yield ss

  /** The Spark `aggregate` fold of q148, verbatim in Scala. */
  private def greedyFold(syms: List[String], l: String, r: String): List[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }.toList

  /** The oracle's one-round delimited replace, verbatim in Scala. */
  private def replaceRound(syms: List[String], l: String, r: String): List[String] = {
    val s = syms.map(x => s" $x ").mkString("")
    s.replace(s" $l  $r ", s" $l$r ").trim.split("  ").toList.filter(_.nonEmpty)
  }

  property("ONE delimited replace == the greedy left fold, for arbitrary symbols and rules") =
    forAll(symsGen, symGen, symGen) { (syms, l, r) =>
      replaceRound(syms, l, r) == greedyFold(syms, l, r)
    }
}
