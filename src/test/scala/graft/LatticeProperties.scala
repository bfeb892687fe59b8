package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.types.{AType, Scalar, TypeLattice}
import AType._

/** ScalaCheck property tests (SURVEY.md §5.3): algebraic laws of the
  * unification lattice and total-function guarantees of the string
  * auto-cast over arbitrary input. */
object LatticeProperties extends Properties("TypeLattice") {

  private val scalarTypes: Gen[AType] = Gen.oneOf(
    AInt8, AInt16, AInt32, AInt64, AUInt8, AUInt16, AUInt32, AUInt64,
    AFloat16, AFloat32, AFloat64, ADate32, ADate64, ATimestampS,
    ABool, AString, ABinary)

  private val anyType: Gen[AType] = Gen.frequency(
    8 -> scalarTypes,
    1 -> scalarTypes.map(AList(_)),
    1 -> Gen.zip(Gen.alphaStr.suchThat(_.nonEmpty), scalarTypes)
      .map { case (n, t) => AStruct(Vector(n -> t)) })

  property("unify is idempotent") = forAll(anyType) { t =>
    AType.unify(t, t) == t
  }

  property("unify is commutative") = forAll(scalarTypes, scalarTypes) { (a, b) =>
    AType.unify(a, b) == AType.unify(b, a)
  }

  property("unify absorbs (a ⊔ (a ⊔ b) == a ⊔ b)") =
    forAll(anyType, anyType) { (a, b) =>
      val ab = AType.unify(a, b)
      AType.unify(a, ab) == ab
    }

  // The reference's unify_types is NOT associative (SURVEY.md §7.4.6):
  // (int32 ⊔ timestamp[s]) ⊔ date32 = int32 ⊔ date32 = int32, but
  // int32 ⊔ (timestamp[s] ⊔ date32) = int32 ⊔ string = string —
  // mixed-temporal pairs fall to the string top while numeric⊔temporal
  // keeps the numeric (schema.py:293-303). We reproduce that faithfully
  // and pin the counterexample instead of asserting a false law.
  property("unify non-associativity witness (reference-faithful)") = Prop {
    val leftAssoc = AType.unify(AType.unify(AInt32, ATimestampS), ADate32)
    val rightAssoc = AType.unify(AInt32, AType.unify(ATimestampS, ADate32))
    leftAssoc == AInt32 && rightAssoc == AString
  }

  property("unify is associative over same-category scalars") = {
    val numeric = Gen.oneOf[AType](AInt8, AInt16, AInt32, AInt64, AFloat16, AFloat32, AFloat64)
    forAll(numeric, numeric, numeric) { (a, b, c) =>
      AType.unify(AType.unify(a, b), c) == AType.unify(a, AType.unify(b, c))
    }
  }

  property("castFromString is total (never throws)") = forAll { (s: String) =>
    TypeLattice.castFromString(s) != null
  }

  property("parseIsoDateTime is total (the per-row cast path never throws)") =
    forAll { (s: String) =>
      TypeLattice.parseIsoDateTime(s) // Option, no exception
      true
    }

  property("parseIsoDateTime is total on datetime-looking noise") = {
    // targeted generator: digits plus the structural chars of the iso
    // grammar (separators, fraction marks, signs, week/time/zulu
    // markers) — shapes that reach every branch of the prefix parser
    val noisy = Gen.listOf(Gen.oneOf(
      Gen.numChar, Gen.oneOf('-', ':', '.', ',', '+', 'W', 'T', 'Z', ' ', '<', '>')
    )).map(_.mkString)
    forAll(noisy) { s =>
      TypeLattice.parseIsoDateTime(s)
      true
    }
  }

  property("castFromString round-trips decimal integers") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { n =>
      TypeLattice.castFromString(n.toString) == Scalar.SLong(BigInt(n))
    }

  property("inference then unify never leaves the lattice") =
    forAll(Gen.oneOf(
      Gen.alphaNumStr, Gen.chooseNum(-1e12, 1e12).map(_.toString),
      Gen.oneOf("true", "no", "2024-01-01", "2024-01-01T10:00:00", "inf", ""))) { s =>
      val t = TypeLattice.inferScalar(TypeLattice.castFromString(s), 1767225600.0)
      // unifying with the lattice top always yields a defined type
      AType.unify(t, AString) == AString || AType.unify(t, AString) == ABinary
    }

  property("rename collision suffixes are injective") = {
    import graft.config.RenameRule
    forAll(Gen.chooseNum(2, 20)) { n =>
      val fields = (1 to n).map(i => s"dup$i" -> (AInt32: AType)).toVector
      val schema = graft.schema.InferredSchema("t", fields :+ ("x" -> (AString: AType)))
      val out = schema.useConfig(Vector(RenameRule(nm => if (nm.startsWith("dup")) "x" else nm)))
      val names = out.fields.map(_._1)
      Prop(names.distinct.size == names.size)
    }
  }
}
