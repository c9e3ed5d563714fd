package graft

import org.apache.spark.sql.functions._

/** Bounds the sketch query (no DuckDB oracle — HLL implementations
  * differ): approx_count_distinct must sit within 10% of exact at the
  * configured 2% target rsd. */
class AnalyticsSpec extends SparkSpec {

  test("KMV sketch: estimate within 30% of exact, state independent of partitioning") {
    import org.apache.spark.sql.functions._
    val rows = ops.Analytics.q82KmvSketch.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_distinct").toDouble
      val est = r.getAs[Long]("est_distinct").toDouble
      // k=64 -> rsd ~ 1/sqrt(62) ~ 13%; 30% is a safe determinism-free bound
      assert(math.abs(est - exact) / exact <= 0.30,
        s"lang=${r.getString(0)} exact=$exact est=$est")
    }
    // partial merges commute: any partitioning yields the same k minima
    val kmv = udaf(new functions.KmvAgg(8))
    val hs = (1L to 500L).map(i => (i % 3, i * 2654435761L % 4294967296L))
    import spark.implicits._
    val base = hs.toDF("g", "h")
    val a = base.repartition(1).groupBy("g").agg(kmv(col("h")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = base.repartition(17).groupBy("g").agg(kmv(col("h")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    a.values.foreach(m => assert(m.length == 8 && m == m.sorted && m.distinct == m))
  }

  test("CMS sketch: every estimate dominates its exact count (one-sided error)") {
    val out = ops.Analytics.q90CmsSketch.fn(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"token=${r.getString(0)} est=$est < exact=$exact")
    }
  }

  test("approx_count_distinct within 10% of exact") {
    val rows = ops.Analytics.q50Sketch.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_nd") > 0L)
      assert(r.getAs[Long]("approx_within_10pct") == 1L,
        s"flag=${r.getString(0)} exact=${r.getAs[Long]("exact_nd")} outside 10%")
    }
  }
}
