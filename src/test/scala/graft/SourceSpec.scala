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

  test("mongodb:// uris fail fast at connect, like connect_mongo's 1s probe (mongo.py:15-18)") {
    // with no connector jar the probe's classpath precondition fires at
    // CONSTRUCTION — not at first action — mirroring the reference's
    // check_connection=True failing inside connect_mongo
    val err = intercept[IllegalStateException] {
      Source(spark, "mongodb://localhost:27017")
    }
    assert(err.getMessage.contains("mongo-spark-connector"))
  }

  test("checkConnection=false defers the guard to first use (check_connection=False parity)") {
    val src = new MongoSource(spark, "mongodb://localhost:27017", checkConnection = false)
    val err = intercept[IllegalStateException] {
      src.read("appdb", "telemetry")
    }
    assert(err.getMessage.contains("mongo-spark-connector"))
  }

  test("LIVE MongoDB path: probe + catalog (auto-canceled where no connector jar ships)") {
    // ENVIRONMENT VERDICT (A1, carried since r1, closed r4): this image
    // has no mongo-spark-connector jar, no mongod, and zero network
    // egress, so the live path can never execute here — this test
    // CANCELS on the jar precondition and runs anywhere the jar and a
    // server exist (set GRAFT_MONGO_URI). The offline guards above pin
    // the failure mode this environment can observe; README records the
    // same verdict.
    val connectorPresent =
      try { Class.forName("com.mongodb.spark.sql.connector.MongoTableProvider"); true }
      catch { case _: ClassNotFoundException => false }
    assume(connectorPresent,
      "mongo-spark-connector absent (image ships without it; no egress to fetch it)")
    val uri = sys.env.getOrElse("GRAFT_MONGO_URI", "mongodb://localhost:27017")
    val src = new MongoSource(spark, uri, checkConnection = false)
    val reachable = try { src.probe(); true } catch { case _: IllegalStateException => false }
    assume(reachable, s"no mongod reachable at $uri")
    // the reference surface: list catalogs, then read one collection
    val dbs = src.listDatabases()
    assert(dbs.nonEmpty)
    val colls = src.listCollections(dbs.head)
    colls.headOption.foreach { c =>
      assert(src.read(dbs.head, c).columns.nonEmpty)
    }
  }
}
