package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs on the same parquet tables.
  * The driver hash-compares the two with columns sorted by name, so both
  * sides must produce identical column names, types, and values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle.stripMargin.trim))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Stage barrier before a global sort: a global `orderBy` samples its
    * child to compute range bounds, so without a shuffle boundary the
    * whole child plan executes TWICE (sample pass + real pass). For a
    * cheap child that's fine; after an expensive construct/parse subtree
    * it doubles the query. A round-robin repartition persists the child's
    * output as shuffle files, which the sampling pass then re-reads
    * instead of recomputing (~40% off q42 at sf0.1). */
  def stageBarrier(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
}
