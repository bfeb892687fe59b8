package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamOps

/** Streaming-serve micro-bench (r14, VERDICT item 8): the three
  * streaming serve operators (bm25ServeStream, ivfMmrServeStream,
  * nswServeStream) have plan-discipline review and batch-parity specs
  * but had no measured lane — performance claims about them were not
  * falsifiable. This main drives each through a MemoryStream against
  * FROZEN sf-corpus artifacts (the production shape: index loaded
  * once, queries arrive as a stream) and prints one JSON line with
  * queries/second per operator: one warmup trigger, then `triggers`
  * timed triggers of the probe query set each.
  *
  * Deliberately NOT part of graft.Bench: the driver bench's contract
  * (query set, JSON schema) is frozen; this is a separate diagnostic
  * lane like PlanDump. No results are cached across triggers — every
  * trigger re-serves its queries against the frozen artifacts. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val triggers = sys.env.getOrElse("SPARK_GRAFT_STREAM_TRIGGERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ---- frozen artifacts (built once — the offline index build) ----
    val docs = graft.operators.Tables.documents(spark, sfDir)
    val (postings, nDocs, tot) = StreamOps.buildBm25Postings(docs)
    val frozenPostings = postings.localCheckpoint(true)
    val (e, c1, edges, anchors) =
      graft.operators.Similarity.nswArtifacts(spark, sfDir)
    val corpusVec = e.select($"vec_id", $"v").localCheckpoint(true)
    val corpusCell = StreamOps
      .withFrozenCell(corpusVec, c1).localCheckpoint(true)
    val probes: Seq[(Long, Seq[Double])] = e.filter($"vec_id" < 50)
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect().toSeq
    val bmTerms = Seq("window", "spark", "merge", "data", "join")
    val bmProbes = (0 until 50).map(i =>
      StreamOps.BmQuery(i.toLong, bmTerms.drop(i % 3)))

    /** One warmup trigger + `triggers` timed triggers of `n` queries;
      * returns (queries/s, total timed queries, timed seconds). */
    def drive[T](name: String)(mk: () => (MemoryStream[T], org.apache.spark.sql.streaming.StreamingQuery, Seq[T])): (Double, Int, Double) = {
      spark.sparkContext.setJobDescription(s"streambench: $name")
      val (input, q, batch) = mk()
      input.addData(batch); q.processAllAvailable() // warmup trigger
      val t0 = System.nanoTime()
      var served = 0
      for (_ <- 1 to triggers) {
        input.addData(batch)
        q.processAllAvailable()
        served += batch.size
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      (served / secs, served, secs)
    }

    def noopSink(df: org.apache.spark.sql.DataFrame, name: String) = df
      .writeStream.format("noop").queryName(name)
      .option("checkpointLocation",
        s"${sys.props("java.io.tmpdir")}/graft-streambench-$name-" +
          java.lang.ProcessHandle.current().pid())
      .outputMode("append").start()

    val bm = drive("bm25") { () =>
      val in = MemoryStream[StreamOps.BmQuery]
      val q = noopSink(StreamOps.bm25ServeStream(
        in.toDS(), frozenPostings, nDocs, tot).toDF(), "bm25")
      (in, q, bmProbes)
    }
    val mmr = drive("ivf-mmr") { () =>
      val in = MemoryStream[(Long, Seq[Double])]
      val q = noopSink(StreamOps.ivfMmrServeStream(
        in.toDF().toDF("qid", "v"), c1, corpusCell).toDF(), "mmr")
      (in, q, probes)
    }
    val nsw = drive("nsw") { () =>
      val in = MemoryStream[(Long, Seq[Double])]
      val q = noopSink(StreamOps.nswServeStream(
        in.toDF().toDF("qid", "v"), corpusVec, c1, edges, anchors).toDF(), "nsw")
      (in, q, probes)
    }

    def block(t: (Double, Int, Double)): String =
      s"""{"queries_per_sec":${math.round(t._1 * 10) / 10.0},"queries":${t._2},"sec":${math.round(t._3 * 1000) / 1000.0}}"""
    println(s"""{"metric":"stream_serve","sf":"$sfDir","triggers":$triggers,"bm25":${block(bm)},"ivf_mmr":${block(mmr)},"nsw":${block(nsw)}}""")
    spark.stop()
  }
}
