package graft

import java.nio.file.Files

/** The TRUE same-checkpoint streaming restart (round-12): a stateful
  * query is stopped and RESUMED on the same checkpoint from a second
  * JVM — the recovery path StreamingSpec cannot exercise in-process
  * (Spark 4's checkpoint concurrency guard caches commit-log entries
  * per path JVM-wide; an in-suite restart trips STREAM_FAILED
  * "concurrently using"). Each run is a child JVM executing
  * [[graft.streaming.StreamRestartDrive]]: drain all available input,
  * stop, exit. Asserted across the boundary:
  *   - STATE continuity: a key seen only before the restart survives
  *     the merge after it;
  *   - OFFSET continuity: batch ids continue (commits 0 then 0,1 —
  *     a lost checkpoint would restart numbering at 0), and run 2
  *     commits exactly ONE new state version (pre-restart input is
  *     not re-read). */
class StreamRestartSpec extends SparkSuite {

  // the JDK-17 module opens Spark needs outside spark-submit — same
  // list as build.sbt's jdk17AddOpens (duplicated: a forked test JVM
  // can't read sbt's setting; drift fails loudly as a child-JVM crash)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runDrive(src: String, ckpt: String, state: String): (Int, String) = {
    val java = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.streaming.StreamRestartDrive", src, ckpt, state)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private def commits(ckpt: String): Seq[Long] =
    Option(new java.io.File(s"$ckpt/commits").list()).getOrElse(Array.empty[String])
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).sorted.toSeq

  test("streamingUpsert resumes a real checkpoint in a second JVM with state and offset continuity") {
    val base = Files.createTempDirectory("graft-restart")
    val src = Files.createDirectory(base.resolve("src"))
    val ckpt = base.resolve("ckpt").toString
    val state = base.resolve("state").toString

    Files.write(src.resolve("part1.json"),
      "{\"key\":\"a\",\"ord\":1,\"value\":\"a1\"}\n{\"key\":\"b\",\"ord\":1,\"value\":\"b1\"}\n".getBytes)
    val (c1, out1) = runDrive(src.toString, ckpt, state)
    assert(c1 == 0, s"run 1 failed:\n${out1.takeRight(4000)}")
    val st1 = graft.streaming.StreamOps.upsertState(spark, state).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("ord"), r.getAs[String]("value"))).toSet
    assert(st1 == Set(("a", 1L, "a1"), ("b", 1L, "b1")), st1.toString)
    assert(commits(ckpt) == Seq(0L), s"run 1 commits: ${commits(ckpt)}")

    // new input lands while the pipeline is DOWN; 'b' never reappears
    Files.write(src.resolve("part2.json"),
      "{\"key\":\"a\",\"ord\":2,\"value\":\"a2\"}\n{\"key\":\"c\",\"ord\":1,\"value\":\"c1\"}\n".getBytes)
    val (c2, out2) = runDrive(src.toString, ckpt, state)
    assert(c2 == 0, s"run 2 failed:\n${out2.takeRight(4000)}")
    val st2 = graft.streaming.StreamOps.upsertState(spark, state).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("ord"), r.getAs[String]("value"))).toSet
    assert(st2 == Set(("a", 2L, "a2"), ("b", 1L, "b1"), ("c", 1L, "c1")),
      s"state after restart: $st2")
    assert(commits(ckpt) == Seq(0L, 1L),
      s"batch ids must CONTINUE across the restart, got ${commits(ckpt)}")
    // exactly one committed state version survives, and it is v2:
    // run 2 ran exactly one new batch (no re-read of part1) and the
    // upsert's post-commit cleanup removed v1
    val vdirs = Option(new java.io.File(state).list()).getOrElse(Array.empty[String])
      .filter(_.matches("v\\d+")).toSeq
    assert(vdirs == Seq("v2"), s"state versions after restart: $vdirs")
  }
}
