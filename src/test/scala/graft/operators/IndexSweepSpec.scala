package graft.operators

import java.nio.file.{Files, Paths, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The q204 orphan-sweep safety contract (round-12): deletion in the
  * world-writable java.io.tmpdir must never follow a planted symlink
  * into someone else's tree, must only touch trees this framework
  * stamped with its marker, and must require BOTH a dead pid suffix
  * and a stale mtime before reclaiming (shared-tmp containers can
  * misreport a live peer's pid as absent; pids get reused). */
class IndexSweepSpec extends AnyFunSuite {

  private val prefix = "graft-sweep-spec-"

  private def freshRoot(): Path = Files.createTempDirectory("graft-sweep-root")

  private def deadPid: Long =
    (999000L to 999999L).find(p => java.lang.ProcessHandle.of(p).isEmpty)
      .getOrElse(fail("no dead pid found in probe range"))

  private def mkTree(root: Path, name: String, marker: Boolean, ageMs: Long): Path = {
    val t = root.resolve(name)
    Files.createDirectories(t)
    Files.write(t.resolve("payload.parquet"), Array[Byte](1, 2, 3))
    if (marker) Similarity.markIndexTree(t.toString)
    val ts = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - ageMs)
    Files.setLastModifiedTime(t, ts)
    t
  }

  test("sweep never follows a top-level symlink named like an orphan") {
    val root = freshRoot()
    val victim = Files.createTempDirectory("graft-sweep-victim")
    Files.write(victim.resolve("precious.txt"), "keep".getBytes)
    // a marker planted INSIDE the victim must not make the link eligible
    Similarity.markIndexTree(victim.toString)
    val link = root.resolve(s"$prefix${Integer.toHexString(7)}-$deadPid")
    Files.createSymbolicLink(link, victim)
    Similarity.sweepDeadIndexTrees(root.toFile, prefix, minAgeMs = 0L)
    assert(Files.exists(victim.resolve("precious.txt")),
      "symlink target's contents were deleted")
    Similarity.deleteRecursively(root.toFile)
    Similarity.deleteRecursively(victim.toFile)
  }

  test("deleteRecursively unlinks nested symlinks without descending") {
    val outside = Files.createTempDirectory("graft-sweep-outside")
    Files.write(outside.resolve("precious.txt"), "keep".getBytes)
    val tree = Files.createTempDirectory("graft-sweep-tree")
    Files.write(tree.resolve("own.txt"), "mine".getBytes)
    Files.createSymbolicLink(tree.resolve("sneaky"), outside)
    Similarity.deleteRecursively(tree.toFile)
    assert(!Files.exists(tree), "tree itself should be gone")
    assert(Files.exists(outside.resolve("precious.txt")),
      "nested symlink was followed into the outside directory")
    Similarity.deleteRecursively(outside.toFile)
  }

  test("dead-pid + marker + stale mtime is reclaimed; each guard alone is not") {
    val root = freshRoot()
    val dp = deadPid
    val hourMs = 3600L * 1000
    val reclaimed = mkTree(root, s"${prefix}aa-$dp", marker = true, ageMs = hourMs)
    val unmarked = mkTree(root, s"${prefix}bb-$dp", marker = false, ageMs = hourMs)
    val fresh = mkTree(root, s"${prefix}cc-$dp", marker = true, ageMs = 0L)
    val live = mkTree(root,
      s"${prefix}dd-${java.lang.ProcessHandle.current().pid()}",
      marker = true, ageMs = hourMs)
    Similarity.sweepDeadIndexTrees(root.toFile, prefix) // default 15-min window
    assert(!Files.exists(reclaimed), "true orphan should be reclaimed")
    assert(Files.exists(unmarked.resolve("payload.parquet")),
      "tree without the framework marker must be left alone")
    assert(Files.exists(fresh.resolve("payload.parquet")),
      "recently-modified tree must be left alone even with a dead pid")
    assert(Files.exists(live.resolve("payload.parquet")),
      "live-pid tree must never be touched")
    Similarity.deleteRecursively(root.toFile)
  }

  test("unparsable pid suffix is treated as alive (left alone)") {
    val root = freshRoot()
    val t = mkTree(root, s"${prefix}not-a-pid", marker = true, ageMs = 3600L * 1000)
    Similarity.sweepDeadIndexTrees(root.toFile, prefix, minAgeMs = 0L)
    assert(Files.exists(t.resolve("payload.parquet")))
    Similarity.deleteRecursively(root.toFile)
  }
}
