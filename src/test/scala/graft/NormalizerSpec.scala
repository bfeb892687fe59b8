package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.normalize.Normalizer
import graft.schema.InferredSchema
import graft.types.AType
import graft.types.AType._

/** Row-normalization semantics (mongo2pq/schema.py:110-164):
  * falsy-drop, schema-drop, rename application, per-type casts —
  * SURVEY.md §5.2 / §7.4.2-3. */
class NormalizerSpec extends SparkSuite {

  import org.apache.spark.sql.functions._

  private lazy val input = {
    import spark.implicits._
    Seq(
      (1L, "a", 0.0, 0L, false, ""),
      (2L, "b", 2.5, 7L, true, "x"),
      (0L, "", 3.5, 0L, true, "y")
    ).toDF("id", "name", "score", "n", "flag", "note")
      .withColumn("extra_key", lit("dropme"))
  }

  private val schema = InferredSchema("t",
    Vector("id" -> AInt64, "name" -> AString, "score" -> AFloat64,
      "n" -> AInt32, "flag" -> ABool, "note" -> AString))

  test("compat mode nulls out every Python-falsy value (schema.py:115-116)") {
    val out = Normalizer(schema, input, Normalizer.Compat).orderBy(col("id").asc_nulls_first)
    val rows = out.collect()
    // row id=0: id itself is falsy -> null
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(0).getDouble(2) == 3.5)
    // row id=1: 0.0, 0, false, '' all null
    assert(rows(1).getLong(0) == 1L)
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3) && rows(1).isNullAt(4) && rows(1).isNullAt(5))
    // row id=2 keeps everything
    assert(rows(2) == Row(2L, "b", 2.5, 7, true, "x"))
  }

  test("strict mode drops only null/empty-string (the comment's intent)") {
    val out = Normalizer(schema, input, Normalizer.Strict).orderBy(col("id"))
    val rows = out.collect()
    assert(rows(0) == Row(0L, null, 3.5, 0, true, "y"))
    assert(rows(1) == Row(1L, "a", 0.0, 0, false, null))
  }

  test("schema-drop: input columns not in schema are discarded (schema.py:116)") {
    val out = Normalizer(schema, input, Normalizer.Strict)
    assert(!out.columns.contains("extra_key"))
    assert(out.columns.toVector == schema.fields.map(_._1))
  }

  test("rename is applied via the rename map (schema.py:113-114)") {
    val renamed = InferredSchema("t",
      Vector("ident" -> AInt64, "label" -> AString),
      renameMap = Map("id" -> "ident", "name" -> "label"))
    val out = Normalizer(renamed, input, Normalizer.Strict).orderBy(col("ident"))
    assert(out.columns.toVector == Vector("ident", "label"))
    assert(out.collect()(2) == Row(2L, "b"))
  }

  test("casts: numeric widening/narrowing, bool strict vs compat (schema.py:123-158)") {
    import spark.implicits._
    val df = Seq(("42", "yes", "1.5"), ("7", "false", "2.0"))
      .toDF("num", "b", "f")
    val sch = InferredSchema("t",
      Vector("num" -> AInt32, "b" -> ABool, "f" -> AFloat32))
    val strict = Normalizer(sch, df, Normalizer.Strict).orderBy("num")
    assert(strict.schema.map(_.dataType) == Seq(IntegerType, BooleanType, FloatType))
    assert(strict.collect().toSeq == Seq(Row(7, false, 2.0f), Row(42, true, 1.5f)))
    // evident-intent bool: "1" and nonzero ints are NOT truthy
    // (schema.py:128-135's dead branch compares a str to int 1)
    val df2 = Seq(("1", "1"), ("2", "true")).toDF("num", "b")
    val sch2 = InferredSchema("t", Vector("num" -> AInt32, "b" -> ABool))
    val strict2 = Normalizer(sch2, df2, Normalizer.Strict).orderBy("num")
    assert(strict2.collect().toSeq == Seq(Row(1, false), Row(2, true)))
    // compat bool cast bug: any non-bool input -> false (schema.py:128-135)
    val compat = Normalizer(sch, df, Normalizer.Compat).orderBy("num")
    assert(compat.collect().toSeq == Seq(Row(7, false, 2.0f), Row(42, false, 1.5f)))
  }

  test("string casts use Python literal grammars (schema.py:123-158)") {
    import spark.implicits._
    // int(): underscores + Unicode digits; float(): inf; fromisoformat
    val df = Seq(("1_000", "٤٢", "inf", "20240101")).toDF("a", "b", "f", "d")
    val sch = InferredSchema("t", Vector(
      "a" -> AInt32, "b" -> AInt64, "f" -> AFloat64, "d" -> ADate32))
    val row = Normalizer(sch, df, Normalizer.Strict).collect()(0)
    assert(row == Row(1000, 42L, Double.PositiveInfinity, java.sql.Date.valueOf("2024-01-01")))
  }

  test("strings Python raises ValueError for crash the extract, like the reference") {
    import spark.implicits._
    def fails(value: String, t: AType, mode: Normalizer.Mode = Normalizer.Strict): Unit = {
      val df = Seq(Tuple1(value)).toDF("x")
      val e = intercept[Exception] {
        Normalizer(InferredSchema("t", Vector("x" -> t)), df, mode).collect()
      }
      def msgs(ex: Throwable): Seq[String] =
        if (ex == null) Nil else Option(ex.getMessage).toSeq ++ msgs(ex.getCause)
      assert(msgs(e).exists(_.contains("ValueError")), s"$value -> $t: $e")
    }
    fails("1.5", AInt32)      // int('1.5') raises: no float fallback
    fails("abc", AFloat64)
    fails("2024-1-1", ADate32) // fromisoformat needs zero-padded fields
    // reference timestamp cast is int-else-float, NOT iso: Compat crashes;
    // Strict keeps the documented [EXT] iso fallback
    fails("2024-01-01", ATimestampS, Normalizer.Compat)
    val lenient = Normalizer(InferredSchema("t", Vector("x" -> ATimestampS)),
      Seq(Tuple1("2024-01-01T00:00:10")).toDF("x"), Normalizer.Strict).collect()(0)
    assert(lenient.getTimestamp(0).toInstant.getEpochSecond == 1704067210L)
  }

  test("timestamp[s] cast accepts epoch numerics (schema.py:143-150)") {
    import spark.implicits._
    val df = Seq((1709294400L, "1709294400.5")).toDF("t1", "t2")
    val sch = InferredSchema("t", Vector("t1" -> ATimestampS, "t2" -> ATimestampS))
    val row = Normalizer(sch, df, Normalizer.Strict).collect()(0)
    assert(row.getTimestamp(0).toInstant.getEpochSecond == 1709294400L)
    assert(row.getTimestamp(1).toInstant.toEpochMilli == 1709294400500L)
  }
}
