package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{RenameRule, RetypeRule, SchemaConfig}
import graft.schema.InferredSchema
import graft.types.AType._

/** Config-DSL parsing and application semantics
  * (mongo2pq/config.py:39-198, schema.py:55-84) — SURVEY.md §5.2. */
class SchemaConfigSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  private lazy val parsed = SchemaConfig.parse(fixture("telemetry_config.yaml"))

  test("valid nodes parse; malformed nodes warn and are skipped (config.py:201-211)") {
    val rules = parsed.forCollection("telemetry")
    // 5 valid rules; the 4 malformed ones (unknown retype type, bad
    // fieldtype, missing newname, missing type key) are skipped
    assert(rules.size == 5)
    assert(parsed.forCollection("other_collection").size == 1)
    assert(parsed.warnings.size == 4, parsed.warnings.mkString("; "))
  }

  test("entirely malformed config yields empty rules, never aborts (config.py:17-22)") {
    val p = SchemaConfig.parse("- just\n- a list\n")
    assert(p.rules.isEmpty)
    assert(p.warnings.nonEmpty)
    val p2 = SchemaConfig.parse("schema: 42\nunknown_key: 1\n")
    assert(p2.rules.isEmpty)
    assert(p2.warnings.exists(_.contains("unknown")))
  }

  test("retype_equals / retype_regex / retype_contains match like the reference (config.py:94-100)") {
    val rules = parsed.forCollection("telemetry")
    val equalsRule = rules.collect { case r: RetypeRule => r }.head
    assert(equalsRule.fieldTest("telemetry_snapshot_time"))
    assert(!equalsRule.fieldTest("telemetry_snapshot_time2"))
    assert(equalsRule.fieldType == ATimestampS)

    // regex with negative lookbehind (sample_config.yaml:17-24 pattern)
    val regexRule = rules.collect { case r: RetypeRule => r }(1)
    assert(regexRule.fieldTest("_id"))
    assert(regexRule.fieldTest("flake_id"))
    assert(!regexRule.fieldTest("numeric_id"))

    val containsRule = rules.collect { case r: RetypeRule => r }(2)
    assert(containsRule.fieldTest("flap_orientation"))
    assert(containsRule.fieldTest("rear_flap"))
    assert(!containsRule.fieldTest("wing"))
  }

  test("rename_regex substitutes group refs; rename_regex_upper uppercases chosen groups (config.py:153-186)") {
    val renames = parsed.forCollection("telemetry").collect { case r: RenameRule => r }
    assert(renames.size == 2)
    assert(renames(0).rename("datapoint_source") == "source_source")
    assert(renames(0).rename("unrelated") == "unrelated")
    assert(renames(1).rename("small_int") == "small_INT")
  }

  test("Python-only regex syntax compiles: (?P<name>), (?P=name), \\g<N>, \\g<name>") {
    val cfg = SchemaConfig.parse(
      """schema:
        |  t:
        |    - type: rename_regex
        |      oldname: ^(?P<col_prefix>[a-z]+)_(?P=col_prefix)$
        |      newname: doubled_\g<col_prefix>
        |    - type: rename_regex
        |      oldname: ^x_(\d+)$
        |      newname: n\g<1>
        |    - type: retype_regex
        |      fieldname: (?P<tail>_ts)$
        |      fieldtype: timestamp[s]
        |""".stripMargin)
    assert(cfg.warnings.isEmpty, cfg.warnings)
    val renames = cfg.forCollection("t").collect { case r: RenameRule => r }
    // snake_case group names (the Python norm; Java group names can't
    // hold '_' so they are aliased at compile time)
    assert(renames(0).rename("abc_abc") == "doubled_abc")
    assert(renames(0).rename("abc_def") == "abc_def")
    assert(renames(1).rename("x_42") == "n42")
    val retypes = cfg.forCollection("t").collect { case r: RetypeRule => r }
    assert(retypes(0).fieldTest("event_ts") && !retypes(0).fieldTest("event_id"))
  }

  test("rename_regex follows re.sub template rules; rename_regex_upper keeps the reference's quirks") {
    val cfg = SchemaConfig.parse(
      """schema:
        |  t:
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: \2-\1
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: whole=\g<0>
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: bad\3
        |    - type: rename_regex_upper
        |      oldname: ^(ab)_(cd)$
        |      newname: \2-\1
        |      upper: [2]
        |    - type: rename_regex_upper
        |      oldname: ^(ab)_(cd)$
        |      newname: x\2
        |      upper: []
        |""".stripMargin)
    val renames = cfg.forCollection("t").collect { case r: RenameRule => r }
    // re.sub: \2 before \1 substitutes single-pass; \g<0> = whole match
    assert(renames(0).rename("ab_cd") == "cd-ab")
    assert(renames(1).rename("ab_cd") == "whole=ab_cd")
    // re.sub raises 'invalid group reference' at APPLY time (parse_config
    // succeeds — the reference crashes when the rename runs)
    intercept[IllegalArgumentException] { renames(2).rename("ab_cd") }
    // the upper variant is the reference's own ascending loop: \2-\1
    // still substitutes fully (the \1 check starts the loop), but a
    // template with NO \1 at all never enters the loop — x\2 stays
    // literal, unlike re.sub
    assert(renames(3).rename("ab_cd") == "CD-ab")
    assert(renames(4).rename("ab_cd") == "x\\2")
    assert(renames(3).rename("nomatch") == "nomatch")
  }

  test("re.sub templates accept CPython character/octal escapes; unknown non-letter escapes keep the backslash") {
    // newname values are double-quoted YAML so the backslashes reach the
    // template parser literally (snakeyaml "\\t" -> \t two-char sequence)
    val cfg = SchemaConfig.parse(
      """schema:
        |  t:
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: "\\1\\t\\2"
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: "a\\nb\\rc\\fd\\ve\\af"
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: "o\\060k\\0z"
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: "\\$\\1"
        |    - type: rename_regex
        |      oldname: ^(ab)_(cd)$
        |      newname: "\\x41"
        |""".stripMargin)
    val renames = cfg.forCollection("t").collect { case r: RenameRule => r }
    // \t etc. are literal character escapes, as in CPython's template
    // ESCAPES table (the reference's re.sub path, config.py:154)
    assert(renames(0).rename("ab_cd") == "ab\tcd")
    assert(renames(1).rename("ab_cd") == "a\nb\rc\fd\u000Be\u0007f")
    // \060 = three-digit octal '0'; \0 = NUL (not a group reference)
    assert(renames(2).rename("ab_cd") == "o0k\u0000z")
    // unknown NON-letter escape keeps its backslash: re.sub('a', r'\$', 'a') == '\\$'
    assert(renames(3).rename("ab_cd") == "\\$ab")
    // \x IS a bad escape in templates (raised at apply time, like re.sub)
    intercept[IllegalArgumentException] { renames(4).rename("ab_cd") }
  }

  test("useConfig: first-match-wins, one retype + one rename per field (schema.py:60-84)") {
    val schema = InferredSchema("telemetry", Vector(
      "telemetry_snapshot_time" -> AString,
      "numeric_id" -> AInt64,
      "flake_id" -> AInt64,
      "flap_orientation" -> AInt32,
      "datapoint_source" -> AString,
      "small_int" -> AInt32))
    val out = schema.useConfig(parsed.forCollection("telemetry"))
    assert(out.fieldMap("telemetry_snapshot_time") == ATimestampS)
    assert(out.fieldMap("numeric_id") == AInt64)   // lookbehind excludes it
    assert(out.fieldMap("flake_id") == AString)    // regex retype hits
    assert(out.fieldMap("flap_orientation") == AFloat32)
    assert(out.fields.map(_._1) ==
      Vector("telemetry_snapshot_time", "numeric_id", "flake_id",
        "flap_orientation", "source_source", "small_INT"))
    assert(out.renameMap == Map(
      "datapoint_source" -> "source_source", "small_int" -> "small_INT"))
  }

  test("rename collisions get _N suffixes probed against current names (schema.py:76-79)") {
    val rule = Vector(RenameRule(n => if (n.startsWith("dup")) "x" else n))
    val schema = InferredSchema("t", Vector(
      "dup1" -> AInt32, "dup2" -> AInt32, "x" -> AString, "dup3" -> AInt32))
    val out = schema.useConfig(rule)
    // dup1 -> x collides with existing x -> x_1; dup2 -> x_2; dup3 -> x_3
    assert(out.fields.map(_._1) == Vector("x_1", "x_2", "x", "x_3"))
  }
}
