package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

/** Skew-mitigation utilities for hot-key aggregation at cluster scale.
  *
  * A plain `groupBy(key)` shuffles every row of a hot key to one
  * reducer; at 100 TB a single skewed key (one `event_type`, one
  * tenant) stalls the stage. Salting splits each key into
  * `saltBuckets` sub-keys for a partial aggregate, then combines the
  * partials — the hot key's work spreads over `saltBuckets` reducers
  * and the second shuffle only moves pre-aggregated rows (one per
  * key × salt). Results are identical to the unsalted aggregate for
  * any commutative-associative measure.
  */
object Scale {

  /** Two-phase salted count+sum: exactly `groupBy(key).agg(count, sum)`
    * but skew-proof. `sumCol` must already be exact-typed (decimal /
    * integral) so the two-level combine cannot reorder float error. */
  def saltedAgg(df: DataFrame, key: Column, sumCol: Column, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(sumCol).as("ps"))
    partial.groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
  }

  /** Write `df` as a bucketed, bucket-sorted parquet table: rows are
    * hash-distributed into `buckets` files per partition by `key` and
    * sorted by `key` within each bucket.
    *
    * This is the shuffle-ELIMINATION primitive for repeated big-big
    * joins at cluster scale: two tables bucketed by their join key
    * with the same bucket count satisfy the join's distribution
    * requirement straight off the scan, so the exchange (and at 100 TB
    * that exchange IS the job) never happens — pay one shuffle at
    * write time, join shuffle-free forever after. The same property
    * serves repeated `groupBy(key)` aggregations. BucketedJoinSpec
    * pins the no-exchange plan.
    *
    * Bucketing requires the table catalog (`saveAsTable`): bucket
    * metadata lives in the catalog, not the parquet footer. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Morton (Z-order) interleave of two non-negative `bits`-bit ints:
    * bit j of `a` lands at position 2j+1, bit j of `b` at 2j. Pure
    * bitwise Column arithmetic — stays inside whole-stage codegen. */
  def morton(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 2 * j + 1)
        .bitwiseOR(shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 2 * j))
    }.reduce(_ bitwiseOR _)

  /** Write `df` clustered on the Z-order curve of two numeric columns —
    * the data-SKIPPING primitive for multi-dimensional predicates at
    * cluster scale. A layout sorted on one column gives narrow per-file
    * min/max stats on THAT column only: a predicate on the other
    * column reads every file. Z-ordering range-partitions + sorts on
    * the interleaved bits, so each output file covers a small tile of
    * the (a, b) plane and parquet footer stats are narrow in BOTH
    * dimensions — either predicate prunes most files at planning time.
    *
    * Columns are rank-scaled to `bits`-bit ints by min/max (one extra
    * pass over the input at write time; at 100 TB swap in sampled
    * quantile bounds — the curve only needs approximate uniformity).
    * ZOrderSpec pins the skipping property against a linear layout. */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 8): Unit = {
    val bounds = df.agg(
      min(col(colA)).cast("double").as("amn"), max(col(colA)).cast("double").as("amx"),
      min(col(colB)).cast("double").as("bmn"), max(col(colB)).cast("double").as("bmx"))
    val m = (1L << bits) - 1
    // span guard must only catch the degenerate mx == mn case: a
    // floor like greatest(span, 1.0) would silently collapse the
    // curve's resolution for any column with a sub-1.0 value range
    // (e.g. normalized scores) — exactly the columns worth z-ordering
    def scaled(c: String, mn: Column, mx: Column): Column =
      ((col(c).cast("double") - mn) * m /
        when(mx === mn, lit(1.0)).otherwise(mx - mn)).cast("long")
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", morton(
        scaled(colA, col("amn"), col("amx")),
        scaled(colB, col("bmn"), col("bmx")), bits))
      .drop("amn", "amx", "bmn", "bmx")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** A V1 bloom filter over a LongType column, at the CLASSIC optimal
    * size for `fpp`, built by a distributed treeAggregate — the
    * engine's only sanctioned bloom construction (SCALE_DESIGN
    * rule 6). Two measured Spark 4.1 pitfalls make the built-in
    * `df.stat.bloomFilter` unsuitable (round-6 q142 post-mortem,
    * docs/SCALING.md): the fpp overload rounds the optimal bit count
    * DOWN to a power of two, and the default `BloomFilterImplV2` has
    * ~48× V1's false-positive rate at identical (bits, hashes)
    * (measured 0.222 vs 0.0046 at 11.2 bits/item).
    *
    * Callers must ship the result as a BROADCAST variable, never in a
    * UDF closure — closures deserialize once per task and a 268 MB
    * filter × 32 concurrent tasks is a measured heap OOM. */
  def v1Bloom(keys: DataFrame, colName: String, nItems: Long,
              fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val n = math.max(nItems, 1000L)
    val optBits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val numBits = {
      val floor = java.lang.Long.highestOneBit(math.max(optBits, 1L << 20))
      if (floor < optBits) floor << 1 else floor
    }
    val kHashes = math.max(1, math.round(numBits.toDouble / n * math.log(2)).toInt)
    val spark = keys.sparkSession
    import spark.implicits._
    // repartition(32), not coalesce(32): treeAggregate ships
    // last-level partials (numBits/8 bytes each) to the driver, so at
    // high partition counts unbounded partials trip
    // spark.driver.maxResultSize — but coalesce MERGES partitions
    // without a shuffle, which for a non-checkpointed keys frame
    // throttles the ENTIRE upstream key-producing pipeline to 32
    // tasks, not just the aggregate's final level. A shuffle of bare
    // longs is cheap (8 bytes/key) and keeps scan parallelism intact.
    //
    // ADJUDICATED (round 8) against the third shape, eager
    // localCheckpoint + coalesce(32) — no shuffle, no throttle: it
    // wins at toy scale (sf0.1 mins q142 5.26 -> 4.85 s, q99 0.70 ->
    // 0.57 s, same session) but DIES at 100x with a 48g-heap executor
    // OOM: the checkpoint pins the |E|-scale key column as row blocks
    // in the same unified-memory region the treeAggregate needs for
    // its 32 concurrent ~numBits/8-byte bloom buffers, while the
    // shuffle streams keys through compressed spill files and holds
    // ~nothing. The repartition shape completed the identical run in
    // 486 s (docs/SCALING.md, docs/PLANS_r8.md) — memory-envelope
    // safety beats a sub-second toy-scale win.
    keys.select(col(colName)).as[Long].rdd
      .repartition(32)
      .treeAggregate(org.apache.spark.util.sketch.BloomFilter.create(
        org.apache.spark.util.sketch.BloomFilter.Version.V1, n, numBits, kHashes))(
        (b, k) => { b.putLong(k); b },
        (a, b) => { a.mergeInPlace(b); a })
  }
}
