package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.InferredSchema
import graft.types.AType

/** The row-normalization step (reference: mongo2pq/schema.py:110-164) as
  * a single generated Spark projection — no per-row interpretation, the
  * whole step compiles into one WholeStageCodegen span:
  *
  *  - schema-drop: input columns absent from the schema are discarded
  *    (schema.py:116, README.md:83-84) — here simply not selected, which
  *    also lets Catalyst prune the scan down to the selected columns;
  *  - rename: old name -> new name via the config rename map
  *    (schema.py:113-114) becomes `col(old).alias(new)`;
  *  - falsy-drop: in `Compat` mode `0`, `0.0`, `false` and `''` become
  *    null, faithfully reproducing the reference's `if field` filter
  *    (schema.py:115-116); `Strict` mode drops only null / empty string
  *    (the comment's stated intent) — SURVEY.md §7.4.2;
  *  - cast: lenient per-type cast equivalent to the memoized cast table
  *    (schema.py:123-158). The reference's `cast_boolean` is broken
  *    (both branches test `isinstance(value, str)` and the first
  *    compares a str to 1, schema.py:128-135); `Strict` implements the
  *    evident intent ("true"/"yes" -> true), `Compat` reproduces
  *    non-bool -> false — SURVEY.md §7.4.3.
  */
object Normalizer {

  sealed trait Mode
  /** Bug-for-bug reproduction of the reference. */
  case object Compat extends Mode
  /** The reference's documented intent. */
  case object Strict extends Mode

  /** Build the normalize projection for `input` against the
    * (post-config) schema. `schema.renameMap` maps *input* column names
    * to schema names. */
  def columns(schema: InferredSchema, input: DataFrame, mode: Mode = Strict): Seq[Column] = {
    val inputCols = input.schema.fields.map(f => f.name -> f.dataType).toMap
    val inverse: Map[String, String] = schema.renameMap.map(_.swap) // new -> old
    schema.fields.flatMap { case (name, atype) =>
      val sourceName = inverse.getOrElse(name, name)
      inputCols.get(sourceName).map { srcType =>
        normalizeColumn(sourceName, srcType, atype, mode).alias(name)
      }
      // schema fields with no input column are omitted (they'd be all-null)
    }
  }

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"

  /** `try_cast` is SQL-only syntax (no Column API in Spark 4), so the
    * lenient paths are built from the quoted source column name. */
  private def tryCast(srcName: String, sqlType: String): Column =
    expr(s"try_cast(${quoted(srcName)} AS $sqlType)")

  def apply(schema: InferredSchema, input: DataFrame, mode: Mode = Strict): DataFrame =
    input.select(columns(schema, input, mode): _*)

  /** when(falsy, null) . cast — one expression per column. */
  def normalizeColumn(srcName: String, srcType: DataType, target: AType, mode: Mode): Column = {
    val c = col(quoted(srcName))
    val falsy: Column = mode match {
      case Compat =>
        // Python truthiness: None, '', 0, 0.0, False are all falsy
        srcType match {
          case StringType               => c.isNull || c === lit("")
          case BooleanType              => c.isNull || !c
          case _: NumericType           => c.isNull || c === lit(0)
          case _                        => c.isNull
        }
      case Strict =>
        srcType match {
          case StringType => c.isNull || c === lit("")
          case _          => c.isNull
        }
    }
    when(falsy, lit(null).cast(target.sparkType)).otherwise(castTo(srcName, c, srcType, target, mode))
  }

  /** Lenient cast mirroring the reference cast table
    * (schema.py:123-158). Spark's `cast` already covers most pairs; the
    * special cases are spelled out. */
  private def castTo(srcName: String, c: Column, srcType: DataType, target: AType, mode: Mode): Column = {
    import AType._
    (target, mode) match {
      case (ABool, Compat) =>
        // cast_boolean bug: any non-bool input -> false (schema.py:128-135)
        srcType match {
          case BooleanType => c
          case _           => lit(false)
        }
      case (ABool, Strict) =>
        // cast_boolean's EVIDENT intent (schema.py:128-135 — the first
        // isinstance(value, str) branch is a typo shadowing the real
        // string test): int == 1 -> true, str in {true, yes} -> true,
        // everything else false. "1"-as-string and nonzero-ints-other-
        // than-1 are NOT truthy.
        srcType match {
          case BooleanType => c
          case StringType  => lower(c).isin("true", "yes")
          case _: NumericType => c === lit(1)
          case _           => c.cast(BooleanType)
        }
      case (ATimestampS, _) =>
        // cast_timestamp_compat: int else float epoch seconds
        // (schema.py:143-150). A string input tries numeric-epoch first
        // (the reference's int-else-float), then falls back to ISO
        // parsing — Spark's ANSI cast raises on anything unparseable,
        // matching the reference's ValueError.
        srcType match {
          case StringType =>
            val asNum = tryCast(srcName, "DOUBLE")
            when(asNum.isNotNull, asNum.cast(TimestampType))
              .otherwise(c.cast(TimestampType))
          case _ => c.cast(TimestampType)
        }
      case (ADate32, _) =>
        // reference casts via datetime.fromisoformat (schema.py:140-141)
        c.cast(DateType)
      case (ADate64, _) => c.cast(TimestampType)
      case (t, _)       => c.cast(t.sparkType)
    }
  }
}
