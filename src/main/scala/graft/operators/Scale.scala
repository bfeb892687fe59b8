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
}
