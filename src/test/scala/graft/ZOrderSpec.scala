package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Pins the Z-order write's data-skipping property: with a Z-ordered
  * layout, a narrow predicate on EITHER dimension is contained in a
  * small subset of files; with a linear (single-column sort) layout
  * the second dimension's predicate spreads over every file.
  * "Files containing matching rows" (via input_file_name) is exactly
  * the set a footer-stats pruner must read. */
class ZOrderSpec extends SparkSuite {

  test("morton interleaves bits of both inputs") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (255L, 0L))
      .toDF("a", "b")
      .select(Scale.morton(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    // a's bit j -> 2j+1, b's bit j -> 2j
    assert(out.toSeq == Seq(0L, 2L, 1L, 15L, 0xAAAAL))
  }

  test("z-ordered files prune on both dimensions; linear layout only on one") {
    import spark.implicits._
    val nFiles = 16
    // 64x64 uniform grid: every (x, y) cell once
    val grid = spark.range(64L * 64)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))

    val zdir = s"/tmp/zorder_spec_${System.nanoTime()}/z"
    val ldir = s"/tmp/zorder_spec_${System.nanoTime()}/linear"
    Scale.writeZOrdered(grid, zdir, "x", "y", nFiles, bits = 6)
    grid.repartitionByRange(nFiles, $"x").sortWithinPartitions("x")
      .write.parquet(ldir)

    def filesTouched(dir: String, cond: String): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()

    val zFilesTotal = spark.read.parquet(zdir)
      .select(input_file_name()).distinct().count()
    assert(zFilesTotal == nFiles.toLong)

    // a 16-wide band in each dimension = 1/4 of the plane
    val zx = filesTouched(zdir, "x >= 0 AND x < 16")
    val zy = filesTouched(zdir, "y >= 0 AND y < 16")
    val lx = filesTouched(ldir, "x >= 0 AND x < 16")
    val ly = filesTouched(ldir, "y >= 0 AND y < 16")

    // linear layout: great on its sort column, useless on the other
    assert(lx <= nFiles / 2, s"linear x-files $lx")
    assert(ly == nFiles.toLong, s"linear y-files $ly (should spread everywhere)")
    // z-order: BOTH dimensions contained in a strict subset of files
    assert(zx <= nFiles / 2, s"z-order x-files $zx")
    assert(zy <= nFiles / 2, s"z-order y-files $zy")
  }

  test("z-order keeps resolution for sub-1.0 value ranges") {
    import spark.implicits._
    val nFiles = 16
    // normalized-score-like columns in [0, 0.63] — a naive
    // greatest(span, 1.0) guard would collapse the curve to 1 bit
    val grid = spark.range(64L * 64)
      .select((($"id" % 64) / 100.0).as("x"), (($"id" / 64).cast("long") / 100.0).as("y"))
    val dir = s"/tmp/zorder_spec_${System.nanoTime()}/small"
    Scale.writeZOrdered(grid, dir, "x", "y", nFiles, bits = 6)
    def filesTouched(cond: String): Long =
      spark.read.parquet(dir).filter(cond)
        .select(input_file_name()).distinct().count()
    assert(filesTouched("x < 0.16") <= nFiles / 2, "x pruning lost on small range")
    assert(filesTouched("y < 0.16") <= nFiles / 2, "y pruning lost on small range")
  }
}
