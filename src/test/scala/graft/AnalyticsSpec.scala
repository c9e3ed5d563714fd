package graft

import org.apache.spark.sql.functions._

/** Bounds the sketch query (no DuckDB oracle — HLL implementations
  * differ): approx_count_distinct must sit within 10% of exact at the
  * configured 2% target rsd. */
class AnalyticsSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact") {
    val rows = ops.Analytics.q50Sketch.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_nd").toDouble
      val approx = r.getAs[Long]("approx_nd").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"flag=${r.getString(0)} exact=$exact approx=$approx")
    }
  }
}
