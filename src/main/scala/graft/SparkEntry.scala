package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per operator pack; each pack pairs the Spark plan
  * with the DuckDB oracle SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Every registered query, in registration order. */
  def registry: Seq[Q] =
    ops.Relational.all ++ ops.Text.all ++ ops.Dedup.all ++ ops.Similarity.all ++
      ops.Ocds.all ++ ops.Events.all ++ ops.Xml.all ++ ops.Multimodal.all ++
      ops.Custom.all ++ ops.Scrape.all ++ ops.Analytics.all ++ ops.Scale.all ++
      ops.Enrich.all ++ ops.Clean.all ++ ops.Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q03RegionRevenue.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
