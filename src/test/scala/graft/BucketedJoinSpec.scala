package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Scale, Tables}

/** Bucketed tables co-locate joins and aggregations: the scan itself
  * satisfies the hash-distribution requirement, so the plan carries NO
  * exchange — the 100 TB design property Scale.writeBucketed exists
  * for (pay one shuffle at write time, join shuffle-free after). */
class BucketedJoinSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("same-bucket-count tables join with no exchange; results match the unbucketed join") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bspec LOCATION '/tmp/graft_bspec_wh'")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
      Scale.writeBucketed(li, "bspec.li_b", "l_orderkey", 8)
      Scale.writeBucketed(ord, "bspec.ord_b", "o_orderkey", 8)

      // disable broadcast so the test exercises the big-big join path
      // (at 100 TB neither side broadcasts — that IS the scenario)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bspec.li_b")
        .join(spark.table("bspec.ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      assert(!plan.contains("Exchange"),
        "bucketed join should carry no exchange:\n" + plan.take(1200))
      // the bucket metadata must actually be honored by the scan
      assert(plan.contains("SelectedBucketsCount"), plan.take(1200))

      // and the shuffle-free plan computes the same join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)

      // repeated aggregation on the bucket key is exchange-free too
      val agg = spark.table("bspec.li_b").groupBy(col("l_orderkey")).count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        "bucketed groupBy should carry no exchange:\n" + aggPlan.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP DATABASE IF EXISTS bspec CASCADE")
    }
  }
}
