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

  test("q181: per-day incremental sessionization equals q37's global pass exactly") {
    // the operator's whole claim: fragment-level re-merge reconstructs the
    // event-level session partition bit-for-bit (the oracle proves it vs
    // DuckDB at sf0.01, which contains one midnight-straddling session;
    // this proves it engine-internally, row for row)
    val inc = ops.Events.q181BoundarySessions.fn(spark, sf)
    val glob = ops.Events.q37Sessionize.fn(spark, sf)
    assert(inc.exceptAll(glob).isEmpty && glob.exceptAll(inc).isEmpty)

    // planted fixture with GUARANTEED boundary sessions (sf0.001 has
    // none): u1 straddles one midnight (23:50+23:59 -> 00:10+00:20) then
    // a separate afternoon session; u2 straddles two different midnights
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-03-01 23:50:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-03-01 23:59:00", 1L, "click", 1.0, "{}"),
      (3L, "2024-03-02 00:10:00", 1L, "purchase", 9.0, "{}"),
      (4L, "2024-03-02 00:20:00", 1L, "view", 1.0, "{}"),
      (5L, "2024-03-02 13:00:00", 1L, "view", 1.0, "{}"),
      (6L, "2024-03-01 23:55:00", 2L, "view", 1.0, "{}"),
      (7L, "2024-03-02 00:05:00", 2L, "view", 1.0, "{}"),
      (8L, "2024-03-02 23:58:00", 2L, "view", 1.0, "{}"),
      (9L, "2024-03-03 00:14:00", 2L, "purchase", 5.0, "{}"))
      .toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("raw_ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q181").toString
    try {
      rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val pInc = ops.Events.q181BoundarySessions.fn(spark, dir).collect()
      val pGlob = ops.Events.q37Sessionize.fn(spark, dir).collect()
      assert(pInc.map(_.toSeq).toSeq == pGlob.map(_.toSeq).toSeq)
      // u1: one merged midnight session (4 events, 1 purchase) + the 13:00
      // singleton; u2: two merged boundary sessions of 2 events each
      val byUser = pInc.groupBy(_.getLong(0))
      assert(byUser(1L).map(r => (r.getLong(2), r.getLong(5))).sorted.toSeq ==
        Seq((1L, 0L), (4L, 1L)))
      assert(byUser(2L).map(r => (r.getLong(2), r.getLong(5))).sorted.toSeq ==
        Seq((2L, 0L), (2L, 1L)))
    } finally {
      graft.sources.Versioned.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("q186: rendezvous moves ~1/9 of docs, modulo moves ~8/9") {
    val rows = ops.Scale.q186RendezvousRebalance.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // mod placement: P[h%8 == h%9] = 1/9 for uniform h -> ~888888 ppm moved
    assert(rows("mod") > 800000L && rows("mod") < 960000L,
      s"mod moved_ppm=${rows("mod")} not ~8/9")
    // rendezvous: only the new shard's wins move -> ~111111 ppm
    assert(rows("rendezvous") > 60000L && rows("rendezvous") < 170000L,
      s"rendezvous moved_ppm=${rows("rendezvous")} not ~1/9")
  }
}
