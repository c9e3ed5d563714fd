package graft

/** Determinism canary (round-5 VERDICT item 6): the engine must produce
  * IDENTICAL results regardless of how the data is partitioned.
  *
  * The full gate is `scripts/determinism.sh` — two fresh JVMs at 32 vs 5
  * cores over the whole 125-query registry at sf0.1 (committed record:
  * 0 diff). One JVM can't host two differently-sized SparkContexts, so
  * this cheap in-CI variant varies what a different core count actually
  * changes — shuffle partition count, input split size, and the AQE
  * re-planner — across two sessions of the shared context, for a
  * representative slice of the order-sensitive operators: first-match
  * dedup, top-k ties, LSH banding, iterative CC / Lloyd / BPE folds,
  * permutation manifests, cluster-scoped near-dedup, and RRF fusion.
  * Any order-dependent fold, unstable sort, or first() without a frame
  * diffs here and fails `sbt test` instead of the driver's double-run.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q05_dedup_audit", "q07_topk_per_group", "q27_minhash_lsh",
    "q61_connected_components", "q84_span_dedup", "q96_epoch_shuffle",
    "q98_kmeans_lloyd", "q109_semdedup", "q113_bpe_rounds",
    "q115_phash_dedup", "q125_hybrid_rrf")

  test("representative queries are identical under a different partitioning regime") {
    val sfDir = "/root/testdata/sf0.01"
    // regime A: the shared session as-is (4 shuffle partitions, AQE on)
    val a = spark
    // regime B: different shuffle fan-out, forced-small input splits
    // (different scan task boundaries), AQE off (no runtime re-plan)
    val b = spark.newSession()
    b.conf.set("spark.sql.shuffle.partitions", "7")
    b.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    b.conf.set("spark.sql.adaptive.enabled", "false")

    def canon(s: org.apache.spark.sql.SparkSession, name: String): Seq[String] =
      SparkEntry.queries(name)(s, sfDir).collect().map(_.toString).sorted.toSeq

    val diffs = names.flatMap { name =>
      val ra = canon(a, name)
      val rb = canon(b, name)
      if (ra == rb) None
      else {
        val firstDiff = ra.zipAll(rb, "<missing>", "<missing>")
          .find { case (x, y) => x != y }
        Some(s"$name: ${ra.length} vs ${rb.length} rows; first diff: $firstDiff")
      }
    }
    assert(diffs.isEmpty,
      s"nondeterministic under repartitioning:\n${diffs.mkString("\n")}")
  }
}
