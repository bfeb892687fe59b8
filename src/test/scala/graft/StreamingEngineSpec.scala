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
}
