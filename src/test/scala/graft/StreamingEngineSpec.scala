package graft

import java.nio.file.{Files, Paths}

import graft.schema.SchemaInference

/** End-to-end streaming EL: files arriving in a directory are
  * continuously normalized into parquet with exactly-once
  * checkpointing (Engine.runStreaming). */
class StreamingEngineSpec extends SparkSuite {

  test("stream of arriving jsonl files lands normalized in parquet") {
    val in = Files.createTempDirectory("streamin")
    val out = Files.createTempDirectory("streamout").toString
    val ckpt = Files.createTempDirectory("ckpt").toString

    // seed schema from the fixture via the batch path
    val fixture = Paths.get(getClass.getResource("/telemetry.jsonl").toURI)
    val schema = SchemaInference.inferFile(spark, fixture.toString, "telemetry",
      samples = 0, nowEpochSec = 1767225600.0)

    // first batch of files arrives
    Files.copy(fixture, in.resolve("batch1.jsonl"))
    val q = Engine.runStreaming(spark, in.toString, schema, out, ckpt)
    q.processAllAvailable()
    val afterOne = spark.read.parquet(out).count()
    assert(afterOne == 5)

    // a second file arrives: incremental pickup, no reprocessing
    Files.copy(fixture, in.resolve("batch2.jsonl"))
    q.processAllAvailable()
    q.stop()
    val df = spark.read.parquet(out)
    assert(df.count() == 10)
    // normalized types survived: flap_orientation inferred float32
    assert(df.schema("flap_orientation").dataType ==
      org.apache.spark.sql.types.FloatType)
  }

  test("textUnwrap numeric parity: fractional text truncates, wrappers parse, empty nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.ExtendedJsonSource
    import graft.types.AType
    graft.functions.GraftFunctions.register(spark) // textUnwrap uses py_norm
    val df = Seq("42", "1.5", "-2.75", "", """{"$numberLong": "8589934592"}""").toDF("n")
    val out = df.select(ExtendedJsonSource.textUnwrap(col("n"), AType.AInt64).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // "1.5" truncates like the batch path (json infers double; ANSI
    // double->long truncates) instead of crashing the stream; ""
    // is falsy -> null; wrappers unwrap
    assert(out.toSeq == Seq(Some(42L), Some(1L), Some(-2L), None, Some(8589934592L)))
    // genuinely non-numeric text still raises (reference ValueError parity)
    val err = intercept[Throwable] {
      Seq("abc").toDF("n")
        .select(ExtendedJsonSource.textUnwrap(col("n"), AType.AInt64).as("v")).collect()
    }
    assert(err.isInstanceOf[org.apache.spark.SparkThrowable], err.getClass.getName)
  }

  test("textUnwrap accepts Python literal grammar numerics like the batch py_norm path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.ExtendedJsonSource
    import graft.types.AType
    graft.functions.GraftFunctions.register(spark)
    // underscored, Unicode-digit, and Unicode-whitespace-padded ints —
    // all valid Python int() literals the batch path accepts via
    // py_norm/parsePythonInt (ADVICE r2: these threw on the stream path)
    val ints = Seq("1_0", "٤٢", "  42  ").toDF("n")
      .select(ExtendedJsonSource.textUnwrap(col("n"), AType.AInt64).as("v"))
      .collect().map(_.getLong(0))
    assert(ints.toSeq == Seq(10L, 42L, 42L))
    val floats = Seq("1_0.5", "inf", "-Infinity", "nan", "1e3").toDF("n")
      .select(ExtendedJsonSource.textUnwrap(col("n"), AType.AFloat64).as("v"))
      .collect().map(_.getDouble(0))
    assert(floats(0) == 10.5 && floats(1).isPosInfinity &&
      floats(2).isNegInfinity && floats(3).isNaN && floats(4) == 1000.0)
  }

  test("streaming unwraps BSON wrappers identically to the batch path") {
    val in = Files.createTempDirectory("streamwrap")
    val out = Files.createTempDirectory("streamwrapout").toString
    val ckpt = Files.createTempDirectory("wrapckpt").toString

    // wrapper-heavy documents: $oid, $numberLong, $date-as-millis,
    // $date-as-ISO, $binary, plus plain scalars. Each column keeps ONE
    // shape across rows — a column mixing wrapper and plain shapes
    // degrades to stringified JSON at json-schema-union time on the
    // batch path too (both paths share that limitation).
    val docs = Seq(
      """{"_id": {"$oid": "65a1b2c3d4e5f60718293a4b"}, "n": {"$numberLong": "8589934592"}, "ts": {"$date": 1709287200000}, "iso": {"$date": "2024-03-01T12:00:00Z"}, "blob": {"$binary": {"base64": "aGVsbG8=", "subType": "00"}}, "label": "alpha", "score": 1.5, "ok": true}""",
      """{"_id": {"$oid": "65a1b2c3d4e5f60718293a4c"}, "n": {"$numberLong": "8589934593"}, "ts": {"$date": 1709290800000}, "iso": {"$date": "2024-03-02T08:30:00Z"}, "blob": {"$binary": {"base64": "d29ybGQ=", "subType": "00"}}, "label": "beta", "score": 2.25, "ok": false}""",
      """{"_id": {"$oid": "65a1b2c3d4e5f60718293a4d"}, "n": {"$numberLong": "8589934594"}, "ts": {"$date": 1709294400000}, "iso": {"$date": "2024-03-03T23:59:59Z"}, "blob": {"$binary": {"base64": "YWJj", "subType": "00"}}, "label": "gamma", "score": -0.5, "ok": true}""")
    val src = Files.createTempDirectory("wrapsrc").resolve("docs.jsonl")
    Files.writeString(src, docs.mkString("", "\n", "\n"))

    val schema = SchemaInference.inferFile(spark, src.toString, "wrapped",
      samples = 0, nowEpochSec = 1767225600.0)

    // batch pipeline = ground truth
    val batchOut = Files.createTempDirectory("wrapbatch").toString
    val batch = Engine.run(spark, Engine.JobConfig(
      input = src.toString, collection = "wrapped", outDir = batchOut, samples = 0))

    Files.copy(src, in.resolve("batch1.jsonl"))
    val q = Engine.runStreaming(spark, in.toString, schema, out, ckpt)
    q.processAllAvailable()
    q.stop()

    val batchRows = spark.read.parquet(batch.outPath)
      .orderBy("_id").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case v => v
      })
    val streamRows = spark.read.parquet(out)
      .selectExpr(spark.read.parquet(batch.outPath).columns.map(c => s"`$c`"): _*)
      .orderBy("_id").collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case v => v
      })
    assert(streamRows.toSeq == batchRows.toSeq)
  }

  test("streaming unwraps wrappers NESTED in struct/array columns like the batch path") {
    // the r3 documented limitation, now closed: wrapper scalars inside
    // arrays and sub-documents unwrap on the stream path via recursed
    // parse types + element-wise textUnwrap
    val in = Files.createTempDirectory("nestwrap")
    val out = Files.createTempDirectory("nestwrapout").toString
    val ckpt = Files.createTempDirectory("nestwrapckpt").toString
    val docs = Seq(
      """{"_id": "a", "tags": [{"$numberLong": "1"}, {"$numberLong": "2"}], "meta": {"uid": {"$oid": "65a1b2c3d4e5f60718293a4b"}, "hits": {"$numberLong": "10"}}}""",
      """{"_id": "b", "tags": [{"$numberLong": "3"}], "meta": {"uid": {"$oid": "65a1b2c3d4e5f60718293a4c"}, "hits": {"$numberLong": "20"}}}""",
      """{"_id": "c", "tags": [], "meta": {"uid": {"$oid": "65a1b2c3d4e5f60718293a4d"}, "hits": {"$numberLong": "30"}}}""")
    val src = Files.createTempDirectory("nestsrc").resolve("docs.jsonl")
    Files.writeString(src, docs.mkString("", "\n", "\n"))
    val schema = SchemaInference.inferFile(spark, src.toString, "nested",
      samples = 0, nowEpochSec = 1767225600.0)
    val batchOut = Files.createTempDirectory("nestbatch").toString
    val batch = Engine.run(spark, Engine.JobConfig(
      input = src.toString, collection = "nested", outDir = batchOut, samples = 0))
    Files.copy(src, in.resolve("batch1.jsonl"))
    val q = Engine.runStreaming(spark, in.toString, schema, out, ckpt)
    q.processAllAvailable()
    q.stop()
    val cols = spark.read.parquet(batch.outPath).columns
    val batchRows = spark.read.parquet(batch.outPath)
      .orderBy("_id").collect().map(_.toSeq)
    val streamRows = spark.read.parquet(out)
      .selectExpr(cols.map(c => s"`$c`"): _*)
      .orderBy("_id").collect().map(_.toSeq)
    assert(streamRows.toSeq == batchRows.toSeq)
    // and the unwrap really landed values, not wrapper JSON text: the
    // empty array in doc c widens tags to AList(AString), so elements
    // are the unwrapped digits as strings — same as batch
    val row = spark.read.parquet(out).orderBy("_id").collect().head
    val tags = row.getSeq[String](row.fieldIndex("tags")).toList
    assert(tags == List("1", "2"), tags.toString)
    // the struct landed in inferred field order with typed leaves
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getString(0) == "65a1b2c3d4e5f60718293a4b" && meta.getLong(1) == 10L)
  }
}
