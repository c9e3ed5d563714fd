package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale-technique pack: the shuffle-engineering patterns a 100 TB
  * deployment leans on, demonstrated small and correctness-gated —
  * the point of the oracle here is that the *technique* (salting) is
  * semantically invisible: the salted plan must hash-match the plain
  * relational answer. */
object Scale {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** q51 — salted skew join: a synthetic 80%-hot key joined against a
    * small dim, salted 8 ways so the hot key spreads over 8 reducers
    * instead of one straggler. The dim side is exploded 8x (still tiny)
    * and the join key becomes (key, salt). AQE's skew-join handles
    * sort-merge skew automatically; explicit salting is the portable
    * version that also works for hash aggregation and pre-AQE engines.
    * The oracle computes the unsalted equivalent. */
  val q51SaltedSkewJoin: Q = Q(
    "q51_salted_skew_join",
    """WITH fact AS (
      |  SELECT CASE WHEN o_orderkey % 10 < 8 THEN 0 ELSE o_custkey % 100 END AS k,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders
      |), dim AS (
      |  SELECT unnest(range(0, 100)) AS k
      |)
      |SELECT d.k AS k, 'dim-' || CAST(d.k AS VARCHAR) AS dim_name, COUNT(f.k) AS n,
      |  CAST(SUM(f.price) AS DOUBLE) AS revenue
      |FROM dim d LEFT JOIN fact f ON f.k = d.k
      |GROUP BY d.k ORDER BY d.k""") { (s, d) =>
    val Salts = 8
    val fact = Tables.orders(s, d)
      .select(
        when(col("o_orderkey") % 10 < 8, 0L).otherwise(col("o_custkey") % 100).as("k"),
        dec(col("o_totalprice")).as("price"))
      .withColumn("salt", pmod(col("price").cast("long") + col("k"), lit(Salts)))
    val dim = s.range(100).select(col("id").as("k"),
        concat(lit("dim-"), col("id").cast("string")).as("dim_name"))
      .withColumn("salt", explode(array((0 until Salts).map(i => lit(i.toLong)): _*)))
    dim.join(fact, Seq("k", "salt"), "left")
      .groupBy(col("k"), col("dim_name"))
      .agg(count(col("price")).as("n"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy("k")
  }

  val all: Seq[Q] = Seq(q51SaltedSkewJoin)
}
