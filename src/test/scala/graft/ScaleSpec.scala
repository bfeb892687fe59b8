package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

/** Skew-mitigation + session-extension specs. */
class ScaleSpec extends SparkSuite {

  test("salted two-phase agg equals the plain aggregate") {
    import spark.implicits._
    // a deliberately skewed key: 9000 of 10000 rows share key 'hot'
    val df = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 7}", i.toDouble))).toDF("k", "v")
    val salted = Scale.saltedAgg(df, $"k", $"v".cast(DecimalType(30, 4)), saltBuckets = 8)
      .select($"k", $"n", $"s".cast("double").as("s")).orderBy($"k")
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v".cast(DecimalType(30, 4))).cast("double").as("s"))
      .orderBy($"k")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("GraftExtensions injects dot_product/rolling_hash at session build") {
    // getOrCreate would silently return the active session and ignore
    // withExtensions — stop it first so the extension path really runs
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "rolling_hash(array('a', 'b'), 31L) AS h").first()
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) != 0L)
    } finally {
      s2.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
