package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
