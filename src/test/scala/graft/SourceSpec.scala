package graft

import java.nio.file.{Files, Paths}

import graft.sources.{DumpSource, MongoSource, Source}

/** Source abstraction (A1/A2) tests: dump catalog + guarded live path. */
class SourceSpec extends SparkSuite {

  private lazy val root: String = {
    val r = Files.createTempDirectory("dumps")
    val db = Files.createDirectory(r.resolve("appdb"))
    val fixture = Paths.get(getClass.getResource("/telemetry.jsonl").toURI)
    Files.copy(fixture, db.resolve("telemetry.jsonl"))
    r.toString
  }

  test("dump source catalogs databases and collections (A2)") {
    val src = Source(spark, root)
    assert(src.listDatabases() == Seq("appdb"))
    assert(src.listCollections("appdb") == Seq("telemetry"))
  }

  test("dump source serves raw documents and parsed frames") {
    val src = new DumpSource(spark, root)
    assert(src.rawDocuments("appdb", "telemetry").count() == 5)
    val df = src.read("appdb", "telemetry")
    assert(df.count() == 5)
    // BSON wrappers unwrapped by the reader
    assert(df.schema("telemetry_snapshot_time") != null)
  }

  test("Engine.runCollection runs the same pipeline from a Source") {
    val out = java.nio.file.Files.createTempDirectory("srcengine").toString
    val result = Engine.runCollection(spark, Source(spark, root), "appdb",
      Engine.JobConfig(input = "", collection = "telemetry", outDir = out, samples = 0))
    assert(result.rowsWritten == 5)
    assert(spark.read.parquet(result.outPath).count() == 5)
  }

  test("mongodb:// uris dispatch to the connector path with a clear guard") {
    val src = Source(spark, "mongodb://localhost:27017")
    assert(src.isInstanceOf[MongoSource])
    val err = intercept[IllegalStateException] {
      src.read("appdb", "telemetry")
    }
    assert(err.getMessage.contains("mongo-spark-connector"))
  }
}
