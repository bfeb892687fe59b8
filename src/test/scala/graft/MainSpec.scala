package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** CLI surface tests (A23, mongo2pq/main.py:100-182). */
class MainSpec extends AnyFunSuite {

  test("argparse surface mirrors the reference (-u -o -s -d -c -p -S -C -D)") {
    val parsed = Main.parseArgs(List(
      "-u", "/dumps", "--outdir", "/out", "-s", "500", "-d", "mydb",
      "-c", "a", "b", "-p", "key", "-C", "/cfg.yaml", "-D")).toOption.get
    assert(parsed.uri.contains("/dumps"))
    assert(parsed.outdir == "/out")
    assert(parsed.samples == 500)
    assert(parsed.db.contains("mydb"))
    assert(parsed.collections == Seq("a", "b"))
    assert(parsed.partition.contains("key"))
    assert(parsed.config.contains("/cfg.yaml"))
    assert(parsed.debugConfig)
  }

  test("missing uri is an error (main.py:153-157)") {
    val r = Main.parseArgs(List("-o", "/out"), Main.Args(uri = None))
    assert(r.isLeft)
  }

  test("end-to-end: dump directory -> per-collection parquet") {
    // layout: <root>/<db>/<collection>.jsonl
    val root = Files.createTempDirectory("dumps")
    val db = Files.createDirectory(root.resolve("appdb"))
    val fixture = Paths.get(getClass.getResource("/telemetry.jsonl").toURI)
    Files.copy(fixture, db.resolve("telemetry.jsonl"))
    val out = Files.createTempDirectory("mainout").toString

    val code = Main.run(Main.Args(
      uri = Some(root.toString), outdir = out, samples = 0))
    assert(code == 0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val back = spark.read.parquet(s"$out/telemetry")
    assert(back.count() == 5)
    // inferred schema YAML persisted next to the output (main.py:74)
    assert(Files.exists(Paths.get(out, "telemetry.yaml")))
  }
}
