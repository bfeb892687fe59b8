package graft.schema

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.types.AType

/** Schema inference as a first-class Spark aggregate function
  * (SURVEY.md §2B "schema-union agg (A10 as an aggregate)") — the same
  * monoid as [[SchemaInference]]'s treeAggregate, packaged as an
  * `Aggregator[String, _, String]` so it composes with `groupBy`:
  * e.g. one inferred schema *per collection/tenant/day* in a single
  * pass, something the reference's driver loop (mongo2pq/main.py:55-74)
  * can only do collection-at-a-time.
  *
  * Buffer is the ordered field->alias vector; merge is
  * `Schema.merge` (mongo2pq/schema.py:34-53). Output is the `!schema`
  * YAML document, so `collect()`ing the result round-trips through
  * [[SchemaYaml]].
  */
class SchemaAggregator(name: String, nowEpochSec: Double)
    extends Aggregator[String, Vector[(String, String)], String] {

  private def toTyped(buf: Vector[(String, String)]): Vector[(String, AType)] =
    buf.map { case (n, a) => n -> AType.forAlias(a).getOrElse(AType.AString) }

  private def fromTyped(fields: Vector[(String, AType)]): Vector[(String, String)] =
    fields.map { case (n, t) => n -> t.alias }

  override def zero: Vector[(String, String)] = Vector.empty

  override def reduce(buf: Vector[(String, String)], json: String): Vector[(String, String)] = {
    val one = SchemaInference.inferOne(json, nowEpochSec)
    fromTyped(SchemaInference.combine(toTyped(buf), one))
  }

  override def merge(a: Vector[(String, String)], b: Vector[(String, String)]): Vector[(String, String)] =
    fromTyped(SchemaInference.combine(toTyped(a), toTyped(b)))

  override def finish(buf: Vector[(String, String)]): String =
    SchemaYaml.dump(InferredSchema(name, toTyped(buf)))

  override def bufferEncoder: Encoder[Vector[(String, String)]] =
    Encoders.kryo[Vector[(String, String)]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object SchemaAggregator {
  /** Column-level API: `docs.groupBy($"tenant").agg(inferSchemaAgg(...))`. */
  def inferSchemaAgg(jsonCol: Column, name: String, nowEpochSec: Double): Column =
    udaf(new SchemaAggregator(name, nowEpochSec)).apply(jsonCol)

  /** SQL registration: `SELECT infer_schema_agg(doc) FROM ...`. */
  def register(spark: SparkSession, name: String = "collection",
      nowEpochSec: Double = System.currentTimeMillis() / 1000.0): Unit =
    spark.udf.register("infer_schema_agg", udaf(new SchemaAggregator(name, nowEpochSec)))
}
