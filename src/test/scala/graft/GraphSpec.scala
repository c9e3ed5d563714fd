package graft

import graft.ops.Graph

/** Host-rank power-iteration tests: the DataFrame iteration must equal
  * a plain-Scala replay of the integer formula on a hand-built graph,
  * and the registered query must be invariant to input partitioning. */
class GraphSpec extends SparkSpec {

  test("powerIterate equals the integer formula replayed by hand") {
    import spark.implicits._
    // A(0) <- B(1) w=2, A <- C(2) w=1; B <- A w=1; C has no in-links
    val hosts = Seq(0L, 1L, 2L).toDF("hid")
    val edges = Seq((1L, 0L, 2L), (2L, 0L, 1L), (0L, 1L, 1L)).toDF("src", "dst", "w")
    val deg = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("hid", "outdeg")

    def ref(iters: Int): Map[Long, Long] = {
      val es = Seq((1L, 0L, 2L), (2L, 0L, 1L), (0L, 1L, 1L))
      val dg = Map(0L -> 1L, 1L -> 2L, 2L -> 1L)
      var r = Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L)
      (1 to iters).foreach { _ =>
        val contrib = es.groupBy(_._2).map { case (dst, in) =>
          dst -> in.map { case (s, _, w) => w * (r(s) / dg(s)) }.sum
        }
        r = r.keys.map(h => h -> (150000L + (850L * contrib.getOrElse(h, 0L)) / 1000L)).toMap
      }
      r
    }

    Seq(1, 3).foreach { iters =>
      val got = Graph.powerIterate(hosts, edges, deg, iters)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == ref(iters), s"iteration mismatch at iters=$iters")
    }
    // the hand graph's qualitative truth: A collects both hosts' mass
    val r3 = ref(3)
    assert(r3(0L) > r3(1L) && r3(1L) > r3(2L),
      "in-link mass should order A > B > C")
  }

  test("q128 host ranks are partitioning-independent") {
    val base = Graph.q128HostRank.fn(spark, sf).collect()
    assert(base.length > 1)
    val once = base.map(_.toSeq.mkString("|")).toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val again = Graph.q128HostRank.fn(spark, sf).collect()
        .map(_.toSeq.mkString("|")).toSeq
      assert(again == once, "host ranks drifted under a different partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
