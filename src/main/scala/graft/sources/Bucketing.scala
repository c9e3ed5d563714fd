package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support: pay a table's join/aggregation shuffle ONCE
  * at write time instead of on every query. `writeBucketed` hash-
  * clusters rows into `buckets` files per partition by the key columns
  * (and sorts within each bucket); reads of two tables bucketed the
  * same way then sort-merge join with NO Exchange on either side —
  * the co-located join strategy for fact-to-fact joins too big to
  * broadcast. At 100 TB this is the difference between re-shuffling
  * the whole fact table per query and reading pre-clustered buckets.
  *
  * The bucket count is a layout contract: both sides of a co-located
  * join must use the same count (or a multiple, with
  * spark.sql.sources.bucketing.autoBucketedScan). Pick it from the
  * table's steady-state size (`bytes / ~256 MB`), not the cluster
  * size — buckets are per-table-static while clusters scale.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Re-registering with the same name overwrites. */
  def writeBucketed(df: DataFrame, table: String,
      keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }
}
