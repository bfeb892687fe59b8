package graft.types

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeType

/** Scalar value produced by `castFromString` — the reference returns a
  * Python primitive (mongo2pq/schema.py:306-322); we model the same
  * closed set. */
sealed trait Scalar extends Serializable
object Scalar {
  final case class SBool(v: Boolean)        extends Scalar
  final case class SLong(v: BigInt)         extends Scalar
  final case class SDouble(v: Double)       extends Scalar
  final case class SDateTime(v: LocalDateTime) extends Scalar
  final case class SString(v: String)       extends Scalar
}

/** The semantic heart of the engine: value -> type inference and the
  * string auto-cast, mirroring mongo2pq/schema.py:306-389.
  *
  * All functions are pure; the "now" used by the epoch-timestamp
  * heuristic (schema.py:325-328 compares against `datetime.now()`) is an
  * injected parameter so inference is deterministic and testable
  * (SURVEY.md §7.4.1).
  */
object TypeLattice {
  import AType._
  import Scalar._

  /** Epoch-seconds heuristic: numeric value within +-`rangeYears` *365d*
    * of `nowEpochSec` is treated as a timestamp (schema.py:325-328). */
  def isTimestamp(value: Double, nowEpochSec: Double, rangeYears: Int = 5): Boolean = {
    val yearInS = 31536000.0
    nowEpochSec - rangeYears * yearInS <= value && value <= nowEpochSec + rangeYears * yearInS
  }

  /** Reproduces `cast_from_string` (schema.py:306-322):
    * "true"/"yes" -> true, "false"/"no" -> false (case-insensitive),
    * then int, then float, then ISO datetime, else the string itself. */
  def castFromString(value: String): Scalar = {
    val lower = value.toLowerCase
    if (lower == "true" || lower == "yes") SBool(true)
    else if (lower == "false" || lower == "no") SBool(false)
    else parsePythonInt(value).map(SLong)
      .orElse(parsePythonFloat(value).map(SDouble))
      .orElse(parseIsoDateTime(value).map(SDateTime))
      .getOrElse(SString(value))
  }

  /** A Python digit run: underscores allowed only SINGLY and BETWEEN
    * digits — `1_`, `_1`, `1__2` all raise ValueError in `int()`/
    * `float()`, so they must fall through to string here too. */
  private val pyDigits = """\d(?:_?\d)*"""

  /** Python numerics accept any Unicode DECIMAL digit (category Nd),
    * e.g. int("٥٤٣") == 543; fold those to ASCII so the ASCII-digit
    * grammar below (and BigInt/Double parsing) sees them. Folds by
    * CODE POINT, not UTF-16 char, so supplementary-plane Nd digits
    * (surrogate pairs, e.g. Osmanya U+104A9) convert too. */
  private def asciiDigits(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val d = Character.digit(cp, 10)
      if (d >= 0 && Character.isDigit(cp)) sb.append(('0' + d).toChar)
      else sb.appendAll(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Python `int(str)`: optional sign, decimal digits (any Unicode Nd),
    * surrounding whitespace allowed, single underscores between digits
    * allowed. Arbitrary precision (the overflow-to-string probe happens
    * later, schema.py:362-371). */
  private[graft] def parsePythonInt(s: String): Option[BigInt] = {
    val t = asciiDigits(s.trim)
    if (t.matches(s"""[+-]?$pyDigits""")) Some(BigInt(t.replace("_", ""))) else None
  }

  /** Python `float(str)`: decimal/scientific notation plus inf/nan
    * forms; underscore placement validated like `int()`; Unicode
    * decimal digits folded to ASCII like `float()` accepts. */
  private[graft] def parsePythonFloat(s: String): Option[Double] = {
    val t = asciiDigits(s.trim.toLowerCase)
    t match {
      case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
      case "-inf" | "-infinity"                      => Some(Double.NegativeInfinity)
      case "nan" | "+nan" | "-nan"                   => Some(Double.NaN)
      case _ =>
        if (!t.matches(s"""[+-]?(?:$pyDigits(?:\\.(?:$pyDigits)?)?|\\.$pyDigits)(?:e[+-]?$pyDigits)?"""))
          None
        else try Some(java.lang.Double.parseDouble(t.replace("_", "")))
        catch { case _: NumberFormatException => None }
    }
  }

  private val isoLocal = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  /** Python 3.11 `datetime.fromisoformat`: date-only, date'T'time,
    * date' 'time, optional fraction and offset. Offset-aware values are
    * normalized to UTC wall-clock (the engine runs with session tz UTC). */
  private[graft] def parseIsoDateTime(s: String): Option[LocalDateTime] = {
    val t = s.trim
    def tryParse[A](f: => A): Option[A] = try Some(f) catch { case _: Exception => None }
    tryParse(LocalDate.parse(t).atStartOfDay())
      .orElse(tryParse(LocalDateTime.parse(t.replaceFirst(" ", "T"), isoLocal)))
      .orElse(tryParse(OffsetDateTime.parse(t.replaceFirst(" ", "T"))
        .withOffsetSameInstant(ZoneOffset.UTC).toLocalDateTime))
  }

  /** datetime at exactly midnight -> date32, else date64
    * (schema.py:352-356). */
  def inferDateTime(dt: LocalDateTime): AType =
    if (dt.toLocalTime == LocalTime.MIDNIGHT) ADate32 else ADate64

  /** Scalar (post string-cast) -> lattice type, mirroring
    * infer_type's non-string branches (schema.py:343-389). */
  def inferScalar(v: Scalar, nowEpochSec: Double): AType = v match {
    case SString(_) => AString
    case SBool(_)   => ABool
    case SDateTime(dt) => inferDateTime(dt)
    case SLong(i) =>
      if (i.isValidDouble && isTimestamp(i.toDouble, nowEpochSec)) ATimestampS
      else if (i.isValidInt) AInt32
      else if (i.isValidLong) AInt64
      else AString // too big to be int (schema.py:369-371)
    case SDouble(d) =>
      if (isTimestamp(d, nowEpochSec)) ATimestampS
      else if (d.isNaN || d.isInfinite || math.abs(d) <= Float.MaxValue.toDouble) AFloat32
      else AFloat64
  }

  /** JSON value (MongoDB extended-JSON document field) -> lattice type.
    * Mirrors infer_type (schema.py:331-389) with the extended-JSON scalar
    * wrappers the dump format uses standing in for BSON runtime types:
    *   {"$oid": ...}        -> string   (ObjectId, schema.py:343-344)
    *   {"$numberLong": ...} -> int64    (bson.Int64, schema.py:346-347)
    *   {"$date": ...}       -> date32/date64 per midnight (schema.py:352-356)
    *   {"$binary": ...}     -> binary   (bytes, schema.py:386-387)
    * Nested arrays/objects are [EXT]: the reference rejects them
    * (schema.py:332-335); this engine infers ArrayType/StructType
    * (SURVEY.md §7.4.4). Set `nestedAsError=true` for bug-compat mode.
    */
  def inferJson(node: JsonNode, nowEpochSec: Double, nestedAsError: Boolean = false): AType = {
    node.getNodeType match {
      case JsonNodeType.STRING  => inferScalar(castFromString(node.asText), nowEpochSec)
      case JsonNodeType.BOOLEAN => ABool
      case JsonNodeType.NUMBER =>
        val s = if (node.isIntegralNumber) SLong(BigInt(node.bigIntegerValue()))
                else SDouble(node.doubleValue())
        inferScalar(s, nowEpochSec)
      case JsonNodeType.BINARY  => ABinary
      case JsonNodeType.OBJECT =>
        bsonWrapper(node) match {
          case Some(t) => t
          case None =>
            if (nestedAsError)
              throw new UnsupportedOperationException(
                "Inferring types for list or dict fields is not implemented")
            val it = node.properties().iterator()
            val b = Vector.newBuilder[(String, AType)]
            while (it.hasNext) { val e = it.next(); b += e.getKey -> inferJson(e.getValue, nowEpochSec) }
            AStruct(b.result())
        }
      case JsonNodeType.ARRAY =>
        if (nestedAsError)
          throw new UnsupportedOperationException(
            "Inferring types for list or dict fields is not implemented")
        var elem: Option[AType] = None
        val it = node.elements()
        while (it.hasNext) {
          val t = inferJson(it.next(), nowEpochSec)
          elem = Some(elem.fold(t)(AType.unify(_, t)))
        }
        AList(elem.getOrElse(AString))
      case _ => AString // NULL / MISSING / POJO fall to lattice top
    }
  }

  /** Recognize MongoDB extended-JSON scalar wrappers. */
  private def bsonWrapper(node: JsonNode): Option[AType] = {
    if (node.size() != 1 && !(node.size() == 2 && node.has("$binary"))) None
    else if (node.has("$oid")) Some(AString)
    else if (node.has("$numberLong")) Some(AInt64)
    else if (node.has("$numberInt")) Some(AInt32)
    else if (node.has("$numberDouble")) Some(AFloat64)
    else if (node.has("$binary")) Some(ABinary)
    else if (node.has("$date")) {
      val d = node.get("$date")
      val dt: Option[LocalDateTime] =
        if (d.isNumber) Some(LocalDateTime.ofInstant(Instant.ofEpochMilli(d.asLong), ZoneOffset.UTC))
        else if (d.isTextual) parseIsoDateTime(d.asText)
        else if (d.isObject && d.has("$numberLong"))
          Some(LocalDateTime.ofInstant(Instant.ofEpochMilli(d.get("$numberLong").asText.toLong), ZoneOffset.UTC))
        else None
      dt.map(inferDateTime).orElse(Some(ADate64))
    }
    else None
  }
}
