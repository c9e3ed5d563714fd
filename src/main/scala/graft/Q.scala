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
}
