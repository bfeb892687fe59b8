package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2B is registered here as a named
  * query; each query with ANSI-SQL-expressible semantics carries a
  * DuckDB oracle in [[oracleSql]] (same table names, same column
  * aliases — the driver hash-compares after sorting columns by name).
  */
object SparkEntry {

  /** The full operator registry. */
  val registry: Vector[Q] =
    Relational.queries ++ EventOps.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Pipeline.queries ++
      Extras.queries ++ TrainingOps.queries ++ CurationOps.queries ++
      AnalyticsOps.queries ++ RetrievalOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Snowflake join + broadcast dims + exact-decimal aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (schema inference), which get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
