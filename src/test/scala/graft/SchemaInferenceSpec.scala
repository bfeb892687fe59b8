package graft

import graft.schema.{InferredSchema, SchemaInference}
import graft.types.AType._

/** Distributed inference over the telemetry torture fixture
  * (FIXTURES.md B1) — exercises every infer/unify branch end-to-end
  * through the treeAggregate path (mongo2pq/schema.py:205-246). */
class SchemaInferenceSpec extends SparkSuite {

  private val now = 1767225600.0 // 2026-01-01T00:00:00Z

  private lazy val inferred: InferredSchema = {
    val path = getClass.getResource("/telemetry.jsonl").getPath
    SchemaInference.infer(spark.read.textFile(path), "telemetry",
      samples = 0, nowEpochSec = now)
  }

  test("field types unify across documents like the reference") {
    val m = inferred.fieldMap
    // $oid -> string, then {$numberLong} -> int64; string x int64 -> string
    assert(m("_id") == AString)
    // ISO strings -> date64, epoch ints near now -> timestamp[s];
    // numeric x temporal -> hmm: date64 x timestamp[s] both temporal ->
    // fall-through to string top? No: epoch 1709294400 is within ±5y of
    // 2026 -> timestamp[s]; date64 x timestamp[s] -> string (lattice top)
    assert(m("telemetry_snapshot_time") == AString)
    // int-looking strings -> int64 (castFromString then width probe)
    assert(m("numeric_id") == AInt64)
    // int x float -> float32
    assert(m("flap_orientation") == AFloat32)
    assert(m("datapoint_source") == AString)
    // bool + "yes"/"no"/"true" strings -> bool everywhere
    assert(m("active") == ABool)
    assert(m("small_int") == AInt32)
    // > int64 max -> string (schema.py:369-371)
    assert(m("big_int") == AString)
    // binary x string -> binary contagion (schema.py:300-301)
    assert(m("payload") == ABinary)
    // midnight dates and a timed datetime -> date64 wins (widest date)
    assert(m("created_date") == ADate64)
    // int x datetime x string -> string top
    assert(m("mixed") == AString)
    // sparse field present in one doc still lands
    assert(m("sparse_note") == AString)
  }

  test("field order is first-seen document order") {
    assert(inferred.fields.map(_._1).take(5) ==
      Vector("_id", "telemetry_snapshot_time", "numeric_id",
        "flap_orientation", "datapoint_source"))
  }

  test("merge monoid: commutative-width, associative for the fixture types") {
    val a = Vector[(String, graft.types.AType)]("x" -> AInt32, "y" -> AString)
    val b = Vector[(String, graft.types.AType)]("x" -> AFloat64, "z" -> ABool)
    val ab = SchemaInference.combine(a, b)
    assert(ab == Vector("x" -> AFloat64, "y" -> AString, "z" -> ABool))
    val ba = SchemaInference.combine(b, a)
    assert(ba.toMap == ab.toMap) // same types, order differs by side
  }

  test("sampling caps the scan (samples parameter)") {
    import spark.implicits._
    val docs = (1 to 1000).map(i => s"""{"a": $i}""").toDS()
    val s = SchemaInference.infer(docs, "caps", samples = 100, nowEpochSec = now)
    assert(s.fieldMap("a") == AInt32)
  }
}
