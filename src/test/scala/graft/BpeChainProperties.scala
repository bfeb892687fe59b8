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
}
