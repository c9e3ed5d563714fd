package graft

/** Fleet-wide plan audit: every registered query's physical plan is
  * screened for the operators that do not survive a 100× scale-up.
  * Individual suites pin positive plan shapes (broadcasts, pushdowns,
  * two-phase top-k); this suite pins the NEGATIVE space for all of
  * them at once, so a refactor that silently degrades some query into
  * a cartesian product or an O(n·m) nested loop fails CI rather than
  * the 100 TB run. */
class PlanAuditSpec extends SparkSpec {

  // queries whose semantics genuinely need a non-equi pairing, with the
  // reason they are still scale-safe: every entry broadcasts a side that
  // is small BY CONSTRUCTION (not by luck of the data)
  private val nestedLoopAllowed: Map[String, String] = Map(
    "q31_knn_brute" -> "brute-force KNN baseline: the k query vectors broadcast; corpus streams once (q32/q54 are the sublinear paths)",
    "q52_gap_fill" -> "calendar-spine cross: the generated month sequence broadcasts against the key set",
    "q75_tfidf" -> "corpus-scalar join: the 1-row total-doc-count broadcasts into the per-term idf",
    "q77_mixture_rebalance" -> "corpus-scalar join: the 1-row rarest-language count broadcasts into per-language rates",
    "q86_temperature_sample" -> "corpus-scalar join: the 1-row min-isqrt broadcasts into per-language temperature rates",
    "q94_vocab_oov" -> "corpus-scalar join: the 1-row top-K vocab array broadcasts into the per-doc membership scan",
    "q98_kmeans_lloyd" -> "Lloyd assignment: the k-row centroid table broadcasts; the corpus streams once per iteration",
    "q101_bigram_lm" -> "corpus-scalar join: the 1-row bigram-count map (≤|V|² entries) broadcasts into the per-doc scoring scan",
    "q105_bm25" -> "corpus-scalar join: the 1-row (n_docs, avgdl) stats broadcast into the per-term BM25 scoring",
    "q54_ann_ivf" -> "corpus-scalar join: the 1-row centroid codebook broadcasts into the per-vector argmax assignment",
    "q104_ann_recall" -> "composes q31/q32/q54 verbatim — inherits their allowlisted broadcast scalar joins",
    "q110_dsir" -> "corpus-scalar joins: the 1-row totals and the 64-row bucket-weight table broadcast into the scoring scan",
    "q113_bpe_rounds" -> "corpus-scalar join: each round's 1-row winning pair broadcasts into the merge scan",
    "q123_bpe_encode" -> "shares q113's merge stages: each trained 1-row merge-pair broadcasts into the encode scan",
    "q114_unimax" -> "corpus-scalar join: the 1-row budget broadcasts into the k-row language stats before the fold",
    "q116_bitext_mine" -> "brute scoring baseline: the 20 anchors broadcast; corpus streams once (the ANN index is the scale path for the scored pass)",
    "q117_cluster_quality" -> "Lloyd-style assignment scoring: the k-row centroid codebook broadcasts; the corpus streams once",
    "q121_ccnet_buckets" -> "composes q101 verbatim — inherits its allowlisted 1-row bigram-total broadcast",
    "q122_decay_score" -> "corpus-scalar join: the 1-row reference time broadcasts into the decay scan",
    "q125_hybrid_rrf" -> "corpus-scalar joins: the 1-row query vector and BM25 stats broadcast; fusion joins two O(k)+O(matched) rank lists, never the corpus",
    "q128_host_rank" -> "corpus-scalar join: the 1-row host count broadcasts into the outlink scan; the power iteration runs on the host-cardinality graph only",
    "q137_ivfpq_search" -> "shares q54's probe scoring: the k-row centroid codebook broadcasts against the 5 query vectors; the corpus-side ADC join is an equi-join on codes",
    "q140_training_build" -> "corpus-scalar join: the 1-row token budget broadcasts into the running-sum selection",
    "q141_drift_report" -> "corpus-scalar joins: each revision's 1-row doc total broadcasts into its ~9-key share aggregate",
    "q143_skew_audit" -> "scalar-scalar join: the 1-row top-10 total broadcasts against the 1-row key-count aggregate",
    "q149_vocab_growth" -> "corpus-scalar join: the 1-row doc-count broadcasts into the bucket assignment on both the term and doc legs",
    "q151_public_suffix" -> "public-suffix longest match: the 7-row (real PSL: ~9k-row) suffix table broadcasts into the dot-boundary suffix predicate; per-host matches are label-count-bounded",
    "q161_pmi_collocations" -> "corpus-scalar join: the 1-row unigram/bigram totals broadcast into the vocab-bounded pair scoring",
    "q166_calibration_ece" -> "corpus-scalar join: the 1-row doc total broadcasts into the ≤10-bin ECE report",
    "q169_vocab_drift" -> "corpus-scalar join: the 1-row per-slice token totals broadcast into the vocab-bounded drift scoring",
    "q172_prefix_dim_quality" -> "shares q31's shape: the k query vectors broadcast; the corpus is scored in one streaming pass",
    "q174_bpe_fertility" -> "composes q113's BPE chain verbatim — inherits its allowlisted per-round 1-row merge-pair broadcasts",
    "q176_session_paths" -> "corpus-scalar join: the 1-row path total broadcasts into the ≤|types|³ share table",
    "q177_ab_report" -> "scalar-scalar joins: the two 1-row arm frames form the t² scalar, which broadcasts back onto the 2-row report",
    "q178_trend_ols" -> "corpus-scalar join: the 1-row global min-day broadcasts into the |types|·|days| daily-cell frame",
    "q183_chi2_tokens" -> "corpus-scalar join: the 1-row (n, np) class totals broadcast into the per-token contingency scoring",
    "q185_rfm_segments" -> "scalar joins: the 1-row user count and three 1-row tercile-threshold frames broadcast into the bucketing pass",
    "q187_covisitation" -> "corpus-scalar join: the 1-row user count broadcasts into the ≤|items|² lift scoring",
    "q188_conversion_delay" -> "corpus-scalar join: the 1-row viewer total broadcasts into the ≤span-in-hours curve cells",
    "q189_join_cardinality" -> "scalar-scalar joins: each audit row is built from 1-row stats frames (n, ndv, Σaₖbₖ) cross-joined into one report row",
    "q197_theil_sen" -> "cells² pair frame: the daily-cell side is TIME-domain-bounded (~2.4k rows whatever the corpus size) and broadcasts; the median extraction is conditional-count aggregates, never a sort",
    "q198_multisource_bfs" -> "shares q128's link extraction: the 1-row host count broadcasts into the outlink scan; the BFS rounds run on the host-cardinality graph only",
    "q200_benford_audit" -> "corpus-scalar join: the 1-row total broadcasts into the 9-digit-cell report",
    "q202_quantile_norm" -> "cell-table range join: both sides are value-domain-bounded (source,value) cells — the pooled interval table broadcasts; per-row application at scale is an equi-join against this output",
    "q204_mutual_nn" -> "brute bipartite scoring baseline: one population broadcasts, the other streams once (q32/q54 banded-LSH/IVF are the sublinear candidate path); the mutual gate is two argmax folds + an id equi-join",
    "q206_share_of_parent" -> "scalar join: the 1-row grand-total broadcasts into the ≤(1+|regions|+|nations|)-row cell report",
    "q208_equidepth_hist" -> "corpus-scalar join: the 1-row row-total broadcasts into the value-domain cell bucketing",
    "q209_assortativity" -> "shares q128's link extraction: the 1-row host count broadcasts into the outlink scan; moments are one collapsing aggregate over edges",
    "q210_monetary_unit_sample" -> "corpus-scalar join: the 1-row sampling-interval scalar broadcasts into the selection scan",
    "q212_hits" -> "shares q128's link extraction (1-row host count broadcast); score tables are host-cardinality broadcasts into the edge list and each half-round max is a 1-row scalar",
    "q213_priority_sample" -> "scalar join: the 1-row τ = (k+1)-th priority broadcasts into the k-row kept sample's Horvitz-Thompson estimates",
    "q216_linear_interp" -> "calendar-spine cross: the generated day sequence broadcasts against the |types|-row key set (q52's shape); interpolation windows run on (type, day) cells",
    "q218_sketch_algebra" -> "sketch-pair cross: both sides are the |sources|-row 64-int KMV synopsis table — pairwise algebra never rescans the corpus",
    "q220_pca_power" -> "power-iteration scalar joins: the d-cell eigenvector estimate and 1-row max broadcast into the d²-cell Gram matrix each round",
    "q222_fellegi_sunter" -> "scalar join: the 1-row m/u probability estimates broadcast into the suffix-blocked (never n²) candidate scoring",
    "q223_shuffle_quality" -> "scalar joins: the 1-row corpus total and |sources|-cell perfect-shuffle expectation broadcast into the ≤shards·sources-cell audit",
    "q226_stump_split" -> "scalar join: the 1-row min/max broadcasts into the 64-bin histogram pass (q208's two-pass shape)",
    "q227_modularity" -> "scalar joins: the 1-row edge count and node count broadcast into the community-cell fold; labels stay in co-partitioned equi-joins",
    "q230_blocking_quality" -> "scalar join: the 1-row pair-space total broadcasts into the 3-scheme report; candidate mass is computed on block COUNT cells",
    "q233_purged_split" -> "scalar joins: the 1-row day boundary broadcasts into the tagging scan; the 1-row overlap/stats frames cross into the single report row",
    "q234_kcenter_coreset" -> "per-round scalar joins: each round broadcasts ONE new center vector (and its 1-row argmax) into the corpus distance scan — the streaming Gonzalez shape",
    "q235_kendall_tau" -> "cell-pair join: both sides are the ≤|nations| metric-cell table; the n_name< predicate is item-bounded by construction",
    "q236_kneser_ney" -> "corpus-scalar join: the 1-row distinct-bigram count broadcasts into the vocab²-bounded probability cells (q75's idf shape)",
    "q239_shapley_exact" -> "scalar join: the 1-row empty-coalition mean broadcasts into the cell-bounded Shapley table; the 7 coalition tables join by equi keys",
    "q241_diff_in_diff" -> "scalar join: the 1-row midpoint boundary broadcasts into the 4-cell (group, period) collapse",
    "q243_prf_expansion" -> "corpus-scalar joins: q105's 1-row (n_docs, avgdl) stats broadcast into both scoring passes; feedback docs and expansion terms are 3- and 5-row broadcasts",
    "q245_shrunk_rates" -> "corpus-scalar join: the 1-row global-rate prior broadcasts into the per-user shrinkage map",
    "q247_permutation_test" -> "scalar join: the 1-row observed gap broadcasts into the 17-cell permutation fold",
    "q237_mmr_rerank" -> "scalar + k-bounded joins behind eager checkpoints: the 1-row query vector broadcasts into the relevance scan; the k²=64 pair table and per-round picks are k-bounded broadcasts",
    // the next 8 were invisible until the audit learned to see through
    // eager localCheckpoints (round 9); each is a by-construction-small
    // broadcast executed during the build
    "q99_hard_negatives" -> "checkpoint-hidden: the k query vectors broadcast into the scoring scan (q31's shape); corpus streams once",
    "q109_semdedup" -> "checkpoint-hidden: the ≤k anchor/centroid rows broadcast into the candidate scan; the pair space is cluster-bounded (Σn_c²)",
    "q134_ivf_append" -> "checkpoint-hidden: the k-row centroid codebook broadcasts into each assignTo pass (q54's shape) on base, append, and probe legs",
    "q221_jl_distortion" -> "checkpoint-hidden: the 1-row corpus-count scalar broadcasts before the sampled self-join snapshot",
    "q160_triangle_count" -> "checkpoint-hidden: the 1-row node-count scalar broadcasts into rankIds' id densification; wedges run on degree-oriented equi-joins",
    "q173_label_prop" -> "checkpoint-hidden: the 1-row node/edge-count scalars broadcast into rankIds and the modular label fold; LPA rounds are equi-joins",
    "q211_kcore" -> "checkpoint-hidden: the 1-row host-count scalar broadcasts into the edge build; peel rounds are degree equi-joins",
    "q244_clustering_coeff" -> "checkpoint-hidden: the 1-row node-count scalar broadcasts into rankIds; wedge legs and the closing-edge probe are equi-joins",
    "q249_kaplan_meier" -> "scalar join: the 1-row observation-end day broadcasts into the duration-cell censoring tag",
    "q250_mrr_eval" -> "brute scoring baseline: the 20 query vectors broadcast; corpus streams once (q31's shape; q32/q54 are the sublinear candidate path)",
    "q257_ndcg_eval" -> "q250's shape: the 20 query vectors broadcast; corpus streams once; the |labels|-cell relevant-count table broadcasts back",
    "q265_bradley_terry" -> "cell-table joins: the |types|² pair spine is a broadcast self-cross of the |types|-row type list; each MM round broadcasts |types| strength cells and a 1-row normalizer",
    "q268_brier_decomp" -> "corpus-scalar join: the 1-row (N, K, Σsq) totals broadcast into the ≤10 decile cells (q166's ECE shape)",
    "q271_fairness_audit" -> "corpus-scalar join: the 1-row global confusion reference broadcasts into the |nations| group cells",
    "q273_partition_agree" -> "scalar-scalar joins: three 1-row pair-count folds cross-combine into the single metrics row",
    "q274_personalized_pr" -> "q128's shape: the 1-row host count broadcasts into the outlink scan and seed mass; power rounds run on the host-cardinality graph",
    "q275_cuped" -> "corpus-scalar joins: the 1-row midpoint, theta, and variance-ratio scalars broadcast into user-cell scans",
    "q276_rank_biased_overlap" -> "q172's shape: the 5 query vectors broadcast; corpus streams once; the 10-row depth spine crosses query-cardinality cells",
    "q277_threshold_curve" -> "threshold-spine join: the 5-row pinned threshold list broadcasts into the banding-bounded pair cells; the 1-row corpus count broadcasts into the final 5-row sweep",
    "q266_t_closeness" -> "cell-table joins: the 5-row ordinal-level spine and the 1-row global total broadcast into group-cardinality cells",
    "q258_map_eval" -> "q250's shape: the 20 query vectors broadcast; corpus streams once; the |labels|-cell relevant-count table broadcasts back",
    "q251_isotonic_fit" -> "scalar join: the 1-row min/max broadcasts into the 32-bin histogram pass (q226's two-pass shape); PAVA runs on cells",
    "q252_dbscan" -> "checkpoint-hidden: the CC rounds' scalar folds run behind the core-edge checkpoint; candidates are the 9-cell grid equi-join, never n²",
    "q280_logrank" -> "scalar joins: the 1-row observation-end day broadcasts into the streak tag (q249's shape) and the two 1-row folds cross-combine into the single report row",
    "q284_link_prediction" -> "checkpoint-hidden: the 1-row doc-count scalar broadcasts into the link derivation; wedges (cap-64 windowed adjacency), degrees, and the adjacency anti-join are equi-joins with no explicit broadcast hint — AQE picks the degree-table strategy",
    "q285_err_eval" -> "q250's shape: the 20 query vectors broadcast; corpus streams once; the cascade fold runs on 10 rows per query",
    "q288_burstiness" -> "corpus-scalar join: the 1-row doc count broadcasts into the vocab-cardinality Fano scoring",
    "q289_wilcoxon_signed_rank" -> "corpus-scalar join: the 1-row midpoint broadcasts into the per-user diff rollup (q275's shape)",
    "q290_kruskal_wallis" -> "scalar joins: the two 1-row H/tie folds cross-combine into the |types|-row report",
    "q291_stratified_ate" -> "scalar-scalar join: the two 1-row folds (weighted ATE, naive gap) combine into the single report row",
    "q294_morans_i" -> "scalar joins: the 1-row (n, Σx) scalar broadcasts into the link/centering scans; the two 1-row moment folds combine into the report row",
    "q297_quantile_te" -> "spine joins: the 3-row quantile spine and two 1-row arm counts broadcast into value-domain CDF cells",
    "q299_cramers_v" -> "corpus-scalar join: the 1-row (n, r, c) totals broadcast into the ≤|types|·7 contingency cells",
    "q302_spearman" -> "cell-table joins: the ≤|nations|-row midrank tables broadcast back onto the cells; moments are a 1-row fold",
    "q303_cronbach_alpha" -> "corpus-scalar joins: the 1-row user count broadcasts into item/total moment folds, which cross-combine into the report row",
    "q306_friedman" -> "scalar joins: the 1-row k/block-count/rank-square folds cross-combine into the single report row; ranks come from day-co-partitioned cell joins",
    "q308_tost_equivalence" -> "scalar-scalar join: the two 1-row arm frames cross-combine into the single TOST report row (q177's shape)",
    "q309_cochran_armitage" -> "scalar join: the 1-row trend statistic broadcasts back onto the 4 dose cells (q177's shape)",
    "q310_sequence_support" -> "corpus-scalar join: the 1-row session count broadcasts into the |types|²-cell pair report; the pair join itself is the session-key equi-join, bounded |types|² per session",
    "q311_nprobe_curve" -> "spine joins: the ≤160-row (nprobe × query × cell) probe spine broadcasts into the cell-assignment scan; the 1-row query count broadcasts into the 4-row curve (q277's threshold-curve shape); centroids are q54's broadcast codebook",
    "q313_dedup_store_audit" -> "scalar-scalar join: the two 1-row store checksums (incremental vs from-scratch) cross into the single store_match row; every other leg is a collapsing count over band-key equi-joins")

  /** Plans executed EAGERLY while a query builds (localCheckpoint
    * materialization) never appear in the final executedPlan — without
    * this capture a checkpoint could hide a cartesian from the audit.
    * QueryExecutionListener events arrive on the async listener bus, so
    * each query's capture is drained with a quiet-window poll. */
  private def drainCaptured(buf: java.util.concurrent.ConcurrentLinkedQueue[String]): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var quiet = 0
    var waited = 0
    while (quiet < 2 && waited < 2000) {
      var got = false
      var s = buf.poll()
      while (s != null) { out += s; got = true; s = buf.poll() }
      quiet = if (got) 0 else quiet + 1
      Thread.sleep(25); waited += 25
    }
    out.toList
  }

  test("no query plans a cartesian product or an unbounded nested-loop join") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val offenders = SparkEntry.registry.flatMap { q =>
        captured.clear()
        val finalPlan =
          try q.fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
        // final plan + every plan the build executed eagerly (checkpoints)
        val plans = finalPlan :: drainCaptured(captured)
        val cartesian = plans.exists(_.contains("CartesianProduct"))
        val nlj = plans.exists(_.contains("BroadcastNestedLoopJoin")) &&
          !nestedLoopAllowed.contains(q.name)
        if (cartesian || nlj)
          Some(s"${q.name}: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}" +
            s" (in ${plans.size} plan(s) incl. checkpoint-hidden)")
        else None
      }
      assert(offenders.isEmpty, offenders.mkString("\n"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("no query falls back to a non-codegen RDD scan of collected rows") {
    // LocalTableScan of more than a few rows in a query plan means a
    // driver-side collect crept into the dataflow (literals/lookup
    // arrays are fine — they stay tiny and broadcast)
    SparkEntry.registry.foreach { q =>
      val df = q.fn(spark, sf)
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("ExternalRDD"),
        s"${q.name}: dataflow routes through a driver-collected RDD")
    }
  }
}
