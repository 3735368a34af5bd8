package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan lint: every `SparkEntry` query is planned
  * (not executed) and checked against the scale anti-patterns SCALE.md
  * bans. A new operator that accidentally plans a Cartesian product or
  * funnels all rows through one unpartitioned window fails here before
  * it ever reaches a fixture large enough to hurt.
  *
  * Streaming-sink queries are excluded: they EXECUTE on invocation
  * (their plan is the read-back of the sink, checked by their own
  * specs + the driver oracle). */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * 1-row scalar broadcasts (grand totals, minima, codebook counts) and
    * deliberately guarded brute-force baselines. CartesianProduct —
    * the unbroadcast, shuffle-everything form — is never allowed. */
  private val scalarBnlj = Set(
    "bigram_probs", "bigram_probs_onlyone", // grand-total scalar
    "dedup_embedding_pairs",                // guarded brute pair join
    "dedup_lsh_geometry_eval",              // guarded brute truth + 1-row aggs
    "ann_topk_brute",                       // broadcast query side, i<j
    "ann_knn_classify",                     // reuses brute top-k stage
    "ann_topk_ivf", "ann_topk_ivf_kmeans",  // broadcast codebook score
    "ann_topk_ivfpq",                       // broadcast coarse-cell score
    "ann_label_purity",                     // reuses brute top-k
    "dedup_clusters", "text_quality_propagation", // scalar min/convergence
    "text_domain_rebalance",                // 1-row min broadcast
    "text_mixture_schedule",                // 1-row weight-total broadcast
    "text_mixture_dedup_shift",             // 1-row token-total broadcast
    "text_length_profile",                  // 1-row corpus-total broadcast
    "events_forget_audit",                  // 1-row event-total broadcast
    "rel_join_cardinality",                 // 1-row stat-agg broadcasts
    "rel_join_cardinality_sketch",          // 1-row sketch-agg broadcasts
    "rel_bloom_semijoin",                   // 16-word filter broadcast
    "rel_cms_freq", "rel_hll_sketch_union", // sketch-as-scalar probes
    "rel_stats_summary", "rel_scalar_funcs", "text_bm25", // corpus scalars
    "text_doc_similarity", "text_top_terms", // n_docs scalar
    "rel_exists_subquery",                  // uncorrelated exists → BNLJ
    "text_lm_score",                        // ≤676-row bigram-LM broadcast
    "text_select_quality",                  // 1-row sketch-threshold broadcast
    "ann_recall_at_k",                      // 4-row method × #queries scaffold
                                            // (reuses brute/ivf broadcasts)
    "dedup_lsh_eval",                       // three 1-row count aggregates
    "ann_nprobe_sweep",                     // 32-row codebook crossJoin score
                                            // + 1-row truth-total broadcast
    "ann_pq_distortion",                    // 32-row coarse-codebook score
                                            // (the ivfPqParts legs)
    "events_priority_sample",               // 1-row τ-threshold broadcast
    "text_bpe_vocab",                       // 1-row chosen-merge broadcast
    "rel_skyline",                          // guarded candidate dominance pass
    "rel_rfm",                              // 1-row tercile-cutpoint broadcast
    "events_ab_test",                       // 1-row variant-totals broadcast
    "ann_topk_filtered",                    // broadcast query side, i≠j
                                            // (the brute-force shape over
                                            // the pre-filtered corpus)
    "events_diurnal",                       // 1-row grand-total broadcast
    "text_collocations",                    // 1-row bigram-total broadcast
    "rel_kmv_sketch",                       // 1-row sketch-estimate probes
    "ann_dominant_direction",               // 1-row renorm-max broadcast
    "rel_benford",                          // 1-row total broadcast
    "dedup_banding_sweep",                  // 1-row count broadcasts × 4
    "rel_sales_opportunity",                // 1-row avg-balance broadcast
    "rel_important_parts",                  // 1-row revenue-total broadcast
    "rel_basket_pairs",                     // 1-row order-count broadcast
    "events_independence",                  // 1-row grand-total broadcast
    "events_forecast_eval",                 // 1-row last-day/day-count bcast
    "events_lateness",                      // 1-row grand-total broadcast
    "events_time_to_convert",               // 1-row grand-total broadcast
    "ann_ivf_balance",                      // codebook score + 1-row total
    "ann_assignment_margin",                // broadcast codebook score
    "ann_kcenter",                          // 1-row max/center broadcasts
    "rel_t_closeness",                      // 5-row global-dist scaffold
    "events_state_audit")                   // 1-row total×peak combines

  test("no ann_* plan ranks through a Window partitioned by query_id") {
    // VERDICT r6: the shared rerank tail and the PQ ranking once used
    // row_number() OVER (PARTITION BY query_id) — a funnel of per-query
    // candidate rows (the FULL corpus per query for PQ's ADC scoring)
    // into #queries partitions. All ranking now goes through the
    // bounded-heap TopKAgg; the only windows left in ann_* plans are the
    // per-VECTOR assignment windows (partition count = corpus size —
    // scale-safe). Pin that, so a future candidate path can't quietly
    // reintroduce the funnel.
    val plans = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("ann_"))
      .map { case (name, fn) =>
        name -> fn(spark, d).queryExecution.executedPlan.toString
      }
    // self-check against plan-string truncation: the per-vector IVF
    // assignment windows must be VISIBLE in the same strings, or the
    // query_id scan below would pass vacuously
    assert(plans.exists(_._2.contains("windowspecdefinition(vec_id#")),
      "no vec_id window visible in any ann_* plan string — truncated?")
    val offenders = plans.collect {
      case (name, plan) if plan.contains("windowspecdefinition(query_id#") =>
        name
    }
    assert(offenders.isEmpty,
      s"ann_* plans ranking through a query_id window: ${offenders.mkString(", ")}")
  }

  test("no query plans a CartesianProduct or an unpartitioned Window") {
    val skip = SparkEntry.queries.keySet.filter(_.endsWith("_stream"))
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val problems = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "unpartitioned Window" ->
            plan.contains("windowspecdefinition(,"),
          "unexpected BNLJ" -> (!scalarBnlj(name) &&
            plan.contains("BroadcastNestedLoopJoin"))
        ).collect { case (what, true) => what }
        if (problems.isEmpty) None else Some(s"$name: ${problems.mkString(", ")}")
      }
    assert(offenders.isEmpty,
      s"plan lint failures:\n${offenders.mkString("\n")}")
  }
}
