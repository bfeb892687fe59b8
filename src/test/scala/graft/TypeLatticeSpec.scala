package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.types.{AType, Scalar, TypeLattice}
import AType._
import Scalar._

/** Unit tests for the unification lattice and value inference, with
  * exact expectations derived from the cited reference lines
  * (mongo2pq/schema.py:249-389) — SURVEY.md §5.2. The algebraic laws
  * (idempotence, commutativity, absorption) are checked exhaustively
  * over every pair of scalar lattice types — stronger than sampling. */
class TypeLatticeSpec extends AnyFunSuite {

  // a fixed "now" for the epoch heuristic: 2026-01-01T00:00:00Z
  private val now = 1767225600.0

  // ---- unify_types branches (schema.py:249-303) ----------------------

  test("same-category widest wins: ints (schema.py:260-265)") {
    assert(AType.unify(AInt8, AInt32) == AInt32)
    assert(AType.unify(AInt64, AInt16) == AInt64)
    assert(AType.unify(AInt32, AInt32) == AInt32)
  }

  test("mixed signed/unsigned: is_integer spans both, width probes are signed (schema.py:256-263)") {
    // pa_types.is_integer is true for unsigned ints too, so a mixed pair
    // enters the int category; the width tests are the SIGNED probes, so
    // the signed member wins regardless of width or argument order.
    assert(AType.unify(AInt32, AUInt32) == AInt32)
    assert(AType.unify(AUInt32, AInt32) == AInt32)
    assert(AType.unify(AInt8, AUInt64) == AInt8)
    assert(AType.unify(AUInt64, AInt8) == AInt8)
  }

  test("unsigned x float / temporal behaves like signed (pa_types.is_integer)") {
    assert(AType.unify(AUInt8, AFloat32) == AFloat32)
    assert(AType.unify(AFloat64, AUInt32) == AFloat64)
    assert(AType.unify(AUInt32, ATimestampS) == AUInt32)
    assert(AType.unify(ADate32, AUInt16) == AUInt16)
  }

  test("same-category widest wins: uints (schema.py:267-272)") {
    assert(AType.unify(AUInt8, AUInt64) == AUInt64)
    assert(AType.unify(AUInt16, AUInt8) == AUInt16)
  }

  test("same-category widest wins: floats (schema.py:274-279)") {
    assert(AType.unify(AFloat32, AFloat64) == AFloat64)
    assert(AType.unify(AFloat16, AFloat32) == AFloat32)
  }

  test("same-category widest wins: dates (schema.py:281-286)") {
    assert(AType.unify(ADate32, ADate64) == ADate64)
    assert(AType.unify(ADate64, ADate32) == ADate64)
  }

  test("int x float -> the float (schema.py:288-291)") {
    assert(AType.unify(AInt64, AFloat32) == AFloat32)
    assert(AType.unify(AFloat64, AInt8) == AFloat64)
  }

  test("numeric x temporal -> the numeric (schema.py:293-298)") {
    assert(AType.unify(AInt32, ATimestampS) == AInt32)
    assert(AType.unify(ATimestampS, AFloat64) == AFloat64)
    assert(AType.unify(ADate32, AInt64) == AInt64)
    assert(AType.unify(AFloat32, ADate64) == AFloat32)
  }

  test("binary is contagious (schema.py:300-301)") {
    assert(AType.unify(ABinary, AString) == ABinary)
    assert(AType.unify(ABool, ABinary) == ABinary)
    assert(AType.unify(ABinary, ABinary) == ABinary)
  }

  test("string is the lattice top (schema.py:303)") {
    assert(AType.unify(AString, AInt32) == AString)
    assert(AType.unify(ABool, AString) == AString)
    assert(AType.unify(ABool, ATimestampS) == AString)
    assert(AType.unify(ABool, AInt8) == AString)
  }

  test("[EXT] nested unify (reference rejects nested, SURVEY §7.4.4)") {
    assert(AType.unify(AList(AInt32), AList(AInt64)) == AList(AInt64))
    assert(AType.unify(AList(AInt32), AInt32) == AString)
    val s1 = AStruct(Vector("a" -> AInt32))
    val s2 = AStruct(Vector("a" -> AInt64, "b" -> AString))
    assert(AType.unify(s1, s2) == AStruct(Vector("a" -> AInt64, "b" -> AString)))
  }

  // ---- property tests (SURVEY.md §5.3) -------------------------------

  private val scalarTypes: Vector[AType] = Vector(
    AInt8, AInt16, AInt32, AInt64, AUInt8, AUInt16, AUInt32, AUInt64,
    AFloat16, AFloat32, AFloat64, ADate32, ADate64, ATimestampS,
    ABool, AString, ABinary)

  test("unify is idempotent (all scalar types)") {
    for (t <- scalarTypes) assert(AType.unify(t, t) == t)
  }

  test("unify is commutative and absorbing (all scalar pairs)") {
    for (a <- scalarTypes; b <- scalarTypes) {
      val ab = AType.unify(a, b)
      // absorption: unify(a, unify(a,b)) == unify(a,b)
      assert(AType.unify(a, ab) == ab, s"absorption failed for $a x $b")
      // commutativity (the reference prefers type1 on exact ties, but
      // all primitive pairs are width-symmetric)
      assert(AType.unify(b, a) == ab, s"commutativity failed for $a x $b")
    }
  }

  // ---- cast_from_string (schema.py:306-322) --------------------------

  test("castFromString: booleans") {
    assert(TypeLattice.castFromString("true") == SBool(true))
    assert(TypeLattice.castFromString("YES") == SBool(true))
    assert(TypeLattice.castFromString("False") == SBool(false))
    assert(TypeLattice.castFromString("no") == SBool(false))
  }

  test("castFromString: int then float then datetime then string") {
    assert(TypeLattice.castFromString("42") == SLong(BigInt(42)))
    assert(TypeLattice.castFromString("-7") == SLong(BigInt(-7)))
    assert(TypeLattice.castFromString("245345098321") == SLong(BigInt("245345098321")))
    assert(TypeLattice.castFromString("3.5") == SDouble(3.5))
    assert(TypeLattice.castFromString("1e3") == SDouble(1000.0))
    assert(TypeLattice.castFromString("2024-03-01T12:30:45") ==
      SDateTime(LocalDateTime.of(2024, 3, 1, 12, 30, 45)))
    assert(TypeLattice.castFromString("2024-03-01") ==
      SDateTime(LocalDateTime.of(2024, 3, 1, 0, 0)))
    assert(TypeLattice.castFromString("hello") == SString("hello"))
    assert(TypeLattice.castFromString("12abc") == SString("12abc"))
  }

  test("fromisoformat parity: every form verified against CPython 3.11") {
    import TypeLattice.parseIsoDateTime
    def dt(y: Int, m: Int, d: Int, hh: Int = 0, mm: Int = 0, ss: Int = 0, micros: Int = 0) =
      Some(LocalDateTime.of(y, m, d, hh, mm, ss, micros * 1000))
    // basic / week dates (int() claims pure-digit forms in castFromString,
    // but the $date wrapper path parses them directly)
    assert(parseIsoDateTime("20240101") == dt(2024, 1, 1))
    assert(parseIsoDateTime("2024-W01-1") == dt(2024, 1, 1))
    assert(parseIsoDateTime("2024W011") == dt(2024, 1, 1))
    assert(parseIsoDateTime("2024-W01") == dt(2024, 1, 1))
    assert(parseIsoDateTime("2024W01") == dt(2024, 1, 1))
    assert(parseIsoDateTime("2024-W01T12:00") == dt(2024, 1, 1, 12))
    assert(parseIsoDateTime("2023-W52-7") == dt(2023, 12, 31)) // 2023 has 52 weeks
    assert(parseIsoDateTime("2020-W53-1") == dt(2020, 12, 28)) // 2020 has 53
    assert(parseIsoDateTime("2023-W53-1").isEmpty)             // ...2023 does not
    assert(parseIsoDateTime("2024-001").isEmpty)               // ordinal NOT accepted
    assert(parseIsoDateTime("2024-W011").isEmpty)
    assert(parseIsoDateTime("0000-01-01").isEmpty)             // year must be >= 1
    assert(parseIsoDateTime("2024-02-30").isEmpty)
    assert(parseIsoDateTime("20241301").isEmpty)
    // any single separator char; empty time invalid
    assert(parseIsoDateTime("2024-01-01X12:00") == dt(2024, 1, 1, 12))
    assert(parseIsoDateTime("2024-01-01+05:00") == dt(2024, 1, 1, 5))
    assert(parseIsoDateTime("20240101T120000") == dt(2024, 1, 1, 12))
    assert(parseIsoDateTime("2024-01-01T").isEmpty)
    assert(parseIsoDateTime("2024-01-01Z").isEmpty)
    // times: consistent colons, hour-only, fraction lands in micros
    assert(parseIsoDateTime("2024-01-01T12") == dt(2024, 1, 1, 12))
    assert(parseIsoDateTime("2024-01-01T1230") == dt(2024, 1, 1, 12, 30))
    assert(parseIsoDateTime("2024-01-01T12:3045").isEmpty)
    assert(parseIsoDateTime("2024-01-01T1230:45").isEmpty)
    assert(parseIsoDateTime("2024-01-01T12.5") == dt(2024, 1, 1, 12, 0, 0, 500000))
    assert(parseIsoDateTime("2024-01-01T12:30,5") == dt(2024, 1, 1, 12, 30, 0, 500000))
    assert(parseIsoDateTime("2024-01-01T12:00:00.1234567") ==
      dt(2024, 1, 1, 12, 0, 0, 123456)) // truncate past micros
    assert(parseIsoDateTime("2024-01-01T12:00:00.").isEmpty)
    assert(parseIsoDateTime("2024-01-01T24:00").isEmpty)
    assert(parseIsoDateTime("2024-01-01T12:00:60").isEmpty)
    assert(parseIsoDateTime("2024-01-01T12:0").isEmpty)
    // offsets: Z upper-case only (3.11), strict bounds, aware -> UTC
    assert(parseIsoDateTime("2024-01-01T12:00:00Z") == dt(2024, 1, 1, 12))
    assert(parseIsoDateTime("2024-01-01T12:00z").isEmpty)
    assert(parseIsoDateTime("2024-01-01T12:00+05") == dt(2024, 1, 1, 7))
    assert(parseIsoDateTime("2024-01-01T12:00+0530") == dt(2024, 1, 1, 6, 30))
    assert(parseIsoDateTime("2024-01-01T12:00:00+05:30:15") ==
      dt(2024, 1, 1, 6, 29, 45))
    assert(parseIsoDateTime("2024-01-01T12:00-01:00") == dt(2024, 1, 1, 13))
    assert(parseIsoDateTime("2024-01-01T12:00+25:00").isEmpty)
    assert(parseIsoDateTime("2024-01-01T12:00-24:00").isEmpty)
    // NO whitespace stripping, unlike int()/float()
    assert(parseIsoDateTime(" 2024-01-01").isEmpty)
    assert(parseIsoDateTime("2024-01-01 ").isEmpty)
  }

  test("int()/float() strip the Python Unicode whitespace set; datetime does not") {
    // NBSP (u00a0), NEL (u0085) and IDEOGRAPHIC SPACE (u3000) are all
    // str.isspace() in Python; Java trim() strips none of them
    assert(TypeLattice.castFromString("\u00a042\t") == SLong(BigInt(42)))
    assert(TypeLattice.castFromString("1.5\u0085") == SDouble(1.5))
    assert(TypeLattice.castFromString(" \u30007\u3000") == SLong(BigInt(7)))
    // ZWSP (u200b) is NOT isspace: int raises in Python -> string here
    assert(TypeLattice.castFromString("\u200b1") == SString("\u200b1"))
  }

  test("underscores parse only singly between digits, like Python int()/float()") {
    assert(TypeLattice.castFromString("1_000") == SLong(BigInt(1000)))
    assert(TypeLattice.castFromString("1_0.5_5") == SDouble(10.55))
    assert(TypeLattice.castFromString("1e1_0") == SDouble(1e10))
    // all of these raise ValueError in Python -> string in the reference
    assert(TypeLattice.castFromString("1_") == SString("1_"))
    assert(TypeLattice.castFromString("_1") == SString("_1"))
    assert(TypeLattice.castFromString("+_1") == SString("+_1"))
    assert(TypeLattice.castFromString("1__2") == SString("1__2"))
    assert(TypeLattice.castFromString("1_.5") == SString("1_.5"))
    assert(TypeLattice.castFromString("1e_5") == SString("1e_5"))
  }

  test("unicode decimal digits parse like Python int()/float()") {
    assert(TypeLattice.castFromString("٥٤٣") == SLong(BigInt(543))) // Arabic-Indic
    assert(TypeLattice.castFromString("१२") == SLong(BigInt(12)))       // Devanagari
    assert(TypeLattice.castFromString("٥.٥") == SDouble(5.5))
    // non-decimal number glyphs (e.g. Roman numeral) are NOT Nd -> string
    assert(TypeLattice.castFromString("Ⅳ") == SString("Ⅳ"))
  }

  // ---- infer_type branches (schema.py:331-389) -----------------------

  test("datetime at midnight -> date32, else date64 (schema.py:352-356)") {
    assert(TypeLattice.inferDateTime(LocalDateTime.of(2024, 1, 1, 0, 0)) == ADate32)
    assert(TypeLattice.inferDateTime(LocalDateTime.of(2024, 1, 1, 0, 0, 1)) == ADate64)
  }

  test("epoch heuristic: numbers within ±5y of now -> timestamp[s] (schema.py:325-328, 358-360)") {
    assert(TypeLattice.inferScalar(SLong(BigInt(1767225600L)), now) == ATimestampS)
    assert(TypeLattice.inferScalar(SDouble(1767225600.5), now) == ATimestampS)
    // outside the window
    assert(TypeLattice.inferScalar(SLong(BigInt(42)), now) == AInt32)
    assert(TypeLattice.inferScalar(SDouble(42.5), now) == AFloat32)
  }

  test("int width probing: int32 -> int64 -> string (schema.py:362-371)") {
    assert(TypeLattice.inferScalar(SLong(BigInt(1)), now) == AInt32)
    assert(TypeLattice.inferScalar(SLong(BigInt(Int.MaxValue)), now) == AInt32)
    assert(TypeLattice.inferScalar(SLong(BigInt(Int.MaxValue) + 1), now) == AInt64)
    assert(TypeLattice.inferScalar(SLong(BigInt(Long.MaxValue)), now) == AInt64)
    assert(TypeLattice.inferScalar(SLong(BigInt(Long.MaxValue) * 2), now) == AString)
  }

  test("float width probing: float32 range else float64 (schema.py:374-384)") {
    assert(TypeLattice.inferScalar(SDouble(1.5), now) == AFloat32)
    assert(TypeLattice.inferScalar(SDouble(3.5e38), now) == AFloat64)
    assert(TypeLattice.inferScalar(SDouble(-4.7e120), now) == AFloat64)
  }

  // ---- extended-JSON wrappers (schema.py:343-350, 386-387) -----------

  private def node(json: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)

  test("BSON wrappers infer like their runtime types") {
    assert(TypeLattice.inferJson(node("""{"$oid": "65a1b2c3d4e5f60718293a4b"}"""), now) == AString)
    assert(TypeLattice.inferJson(node("""{"$numberLong": "8589934592"}"""), now) == AInt64)
    assert(TypeLattice.inferJson(node("""{"$binary": {"base64": "aGVsbG8=", "subType": "00"}}"""), now) == ABinary)
    assert(TypeLattice.inferJson(node("""{"$date": "2024-03-01T00:00:00Z"}"""), now) == ADate32)
    assert(TypeLattice.inferJson(node("""{"$date": "2024-03-01T08:30:00Z"}"""), now) == ADate64)
  }

  test("plain JSON scalars") {
    assert(TypeLattice.inferJson(node("true"), now) == ABool)
    assert(TypeLattice.inferJson(node("\"yes\""), now) == ABool) // via castFromString
    assert(TypeLattice.inferJson(node("\"free text\""), now) == AString)
    assert(TypeLattice.inferJson(node("12"), now) == AInt32)
    assert(TypeLattice.inferJson(node("13.5"), now) == AFloat32)
  }

  test("[EXT] nested JSON infers array/struct; compat mode raises") {
    assert(TypeLattice.inferJson(node("[1, 2.5]"), now) == AList(AFloat32))
    assert(TypeLattice.inferJson(node("""{"a": 1}"""), now) == AStruct(Vector("a" -> AInt32)))
    intercept[UnsupportedOperationException] {
      TypeLattice.inferJson(node("[1]"), now, nestedAsError = true)
    }
  }
}
