package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the shuffle-elimination path for
  * repeated fact-fact joins at cluster scale (SURVEY.md §2B join rows:
  * "bucketing for co-located joins"). Writing both fact tables
  * bucketed by the join key means every subsequent join on that key is
  * exchange-free: at 100 TB this converts the dominant shuffle into a
  * local merge per bucket. */
class BucketingSpec extends SparkSuite {

  test("joins between tables bucketed on the key run without Exchange") {
    val wh = Files.createTempDirectory("warehouse").toString
    // session with a writable warehouse for saveAsTable
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dir = "/root/testdata/sf0.001"
      s.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      s.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = s.table("orders_b")
        .join(s.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the key: the join needs no shuffle
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)

      // and it computes the right thing
      val viaBuckets = joined.agg(sum("n")).first().getLong(0)
      val expected = s.read.parquet(s"$dir/lineitem.parquet")
        .join(s.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(viaBuckets == expected)
    } finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
