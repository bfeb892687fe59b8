package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent query execution on one shared session — a cluster
  * gateway runs many queries at once; the registry must not rely on
  * mutable session state that races (the temp-view-based queries use
  * distinct view names for this reason). */
class ConcurrencySpec extends SparkSuite {

  test("queries run concurrently on a shared session") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val dir = "/root/testdata/sf0.001"
    val names = Seq("q01_pricing_summary", "q08_window_topk", "q19_json_extract",
      "q39_grouping_sets", "q46_correlated_subquery", "q25_dedup_exact",
      "q13_distinct", "q17_orders_per_month")
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, dir).count())
    }
    val counts = Await.result(Future.sequence(futures), 180.seconds).toMap
    assert(counts.values.forall(_ > 0), counts)
    // and a second concurrent wave gives identical counts
    val again = Await.result(Future.sequence(names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, dir).count())
    }), 180.seconds).toMap
    assert(again == counts)
  }

  test("concurrent Engine.run jobs on a shared session don't collide") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fixture = java.nio.file.Paths.get(
      getClass.getResource("/telemetry.jsonl").toURI).toString
    // each run observes its own rows-written metric; names must not
    // collide across simultaneously-executing writes
    val futures = (1 to 4).map { i =>
      Future {
        val out = java.nio.file.Files.createTempDirectory(s"conc$i").toString
        Engine.run(spark, Engine.JobConfig(
          input = fixture, collection = s"telemetry_$i", outDir = out, samples = 0))
      }
    }
    val results = Await.result(Future.sequence(futures), 180.seconds)
    assert(results.forall(_.rowsWritten == 5), results.map(_.rowsWritten))
  }
}
