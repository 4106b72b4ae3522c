package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Physical-plan quality gates: the properties that make these dataflows
  * survive a 100× scale-up must be visible in the plan, not just hoped for.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect() // finalize AQE so the executed plan shows real operators
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates are pushed to the parquet scan") {
    val p = plan("q02_revenue_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), "shipdate range must reach the scan")
  }

  test("q01: scan reads only referenced columns (column pruning)") {
    val p = plan("q01_pricing_summary")
    assert(!p.contains("l_orderkey"), "unreferenced column must be pruned:\n" + p)
    assert(p.contains("l_quantity"))
  }

  test("q03: dimension joins are broadcast, no shuffle of the fact side per dim") {
    val p = plan("q03_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q22: kNN is broadcast-join + partial top-k aggregation, no window over pairs") {
    val p = plan("q22_knn_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("top_k_by_score"), "bounded top-k aggregate must be used")
    assert(p.contains("partial_top_k_by_score") || p.contains("HashAggregate"),
      "map-side partial aggregation expected:\n" + p)
    assert(!p.contains("Window"), "no global window over the similarity matrix")
  }

  test("q01 aggregation has a map-side partial phase") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), "partial aggregation expected before the shuffle:\n" + p)
  }

  test("q31: minhash LSH plan contains no cartesian product") {
    val p = plan("q31_minhash_neardup")
    assert(!p.contains("CartesianProduct"), "banding must be an equi-join:\n" + p)
  }

  test("q24: banded embedding near-dup has no all-pairs stage") {
    val p = plan("q24_neardup_pairs")
    assert(!p.contains("CartesianProduct"), "band join must be equi:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "no O(n²) pair stage:\n" + p)
  }

  test("q32: pigeonhole simhash blocking has no all-pairs stage") {
    val p = plan("q32_simhash_pairs")
    assert(!p.contains("CartesianProduct"), "block join must be equi:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "no O(n²) pair stage:\n" + p)
  }

  test("q29: the declared IVF query probes the STORED index with partition pruning") {
    val p = plan("q29_ivf_trained")
    assert("PartitionFilters: \\[cell_id".r.findFirstIn(p).isDefined,
      "probed cells must prune the stored-index scan:\n" + p)
  }

  test("q40: language-ID rate table is broadcast") {
    val p = plan("q40_lang_id")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q49: TF-IDF document-frequency table and corpus count are broadcast") {
    val p = plan("q49_tfidf_top_terms")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q49: top-k window is rewritten to the bounded aggregate (no window sort)") {
    val p = plan("q49_tfidf_top_terms")
    assert(p.contains("top_k_rows"), "GroupedTopKRewrite must fire on the " +
      "(score desc, term asc) long+string window:\n" + p)
    assert(!p.contains("Window"), "no full shuffle+sort of the scored set:\n" + p)
  }

  test("q40: language-ID argmax is a map-side-combined aggregate, no window") {
    // round 12 rewrote the row_number window to a single min_by aggregate:
    // the per-doc pick is bounded map-side (partial phase) instead of an
    // exchange + full sort of the (doc, lang) score table
    val p = plan("q40_lang_id")
    assert(p.contains("min_by"), "per-doc argmax must be the min_by aggregate:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("q53: bloom decontamination has no cartesian; verify join is left-semi") {
    val p = plan("q53_bloom_decontaminate")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftSemi"), "exact verify should be a semi join:\n" + p)
  }

  test("q57: weighted sampling is join-free and window-free (pure narrow filter)") {
    val p = plan("q57_weighted_sample")
    assert(!p.contains("Join"), "sampling must not join:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("q63: the quality gate is a pure narrow pass — no join, no window") {
    val p = plan("q63_quality_filter")
    assert(!p.contains("Join"), "rule thresholds must not join:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("q64: passage strip broadcasts the hot-chunk table, no cartesian") {
    val p = plan("q64_passage_strip")
    assert(p.contains("BroadcastHashJoin"),
      "the shared-chunk mark join must broadcast (hot set is tiny by construction):\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q66: vocab mapping joins broadcast; ranking window is vocab-sized only") {
    val p = plan("q66_vocab_map")
    assert(p.contains("BroadcastHashJoin"),
      "token->id mapping must broadcast the vocabulary:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q68: ADC scan joins codes to a broadcast distance table, no pair matrix") {
    val p = plan("q68_pq_adc")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "ADC must never form the |Q|x|C| vector-pair matrix:\n" + p)
  }

  test("q67: interval join is a banded equi-join, never a nested loop") {
    val p = plan("q67_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the |Δt| predicate must ride an equi-join on (key, band):\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q69: nation is broadcast and the fact side never hits a nested loop") {
    val p = plan("q69_brand_supplier_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q70: per-part argmin shuffles at most one row per group per task") {
    // round 12 rewrote the WindowGroupLimit window to min(struct(price,
    // suppkey)) — ONE aggregate whose partial phase bounds the pre-shuffle
    // volume to one row per (task, part); no Window/sort of the scored set
    val p = plan("q70_min_cost_supplier")
    assert(p.contains("partial_min(struct(") || p.contains("partial_min(named_struct"),
      "map-side partial min(struct) must bound the shuffle:\n" + p)
    assert(!p.contains("Window"), "no window over the scored set:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q71: source cap bounds the map-side emit to k rows per group per task") {
    val p = plan("q71_source_cap")
    assert(p.contains("WindowGroupLimit") || p.contains("top_k_rows"),
      "rank-k selection must be bounded before the shuffle:\n" + p)
  }

  test("q72: the rebalance rate table joins broadcast, no extra corpus shuffle") {
    val p = plan("q72_temperature_rebalance")
    // (the 1-row min-count attach inside the groups-sized rate build is a
    // broadcast nested loop by construction — bounded; the corpus-side
    // join must be a BroadcastHashJoin and nothing may be a cartesian)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q74: incremental dedup never cross-joins and reads the stored band table") {
    val p = plan("q74_incremental_neardup")
    assert(!p.contains("CartesianProduct"), "band-key joins must be equi:\n" + p)
    assert(p.contains("_bands"), "stored band table must feed the candidate join:\n" + p)
  }

  test("q75: the returns audit is a semi join — no payload rides the probe side") {
    val p = plan("q75_priority_returns")
    assert(p.contains("LeftSemi"), "EXISTS must plan as a semi join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q76: rollup is ONE aggregation pass over Expand, not a union of scans") {
    val p = plan("q76_rollup_revenue")
    assert(p.contains("Expand"), "rollup must share one pass via Expand:\n" + p)
    assert(!p.contains("Union"), "no per-level rescan union:\n" + p)
    assert(p.contains("partial"), "map-side partial aggregation expected:\n" + p)
  }

  test("q95: blacklist anti-join is broadcast; distinct-agg expands partial") {
    val p = plan("q95_supplier_cnt")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    // two-phase distinct: a partial_count(distinct ...) before the final
    assert(p.contains("partial_count(distinct"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q100: the share window runs over the nations aggregate, not the fact") {
    val p = plan("q100_revenue_share")
    // the window's input must already be aggregated: HashAggregate appears
    // below the Window in the plan string (plans print top-down)
    val w = p.indexOf("Window [")
    val agg = p.indexOf("HashAggregate", w)
    assert(w >= 0 && agg > w, "window must sit above the grouped aggregate:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q86: the status filter survives under the outer join (orders side)") {
    val p = plan("q86_order_count_distribution")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    assert(p.contains("o_orderstatus"), "filter must reach the orders branch:\n" + p)
  }

  // ---- unpartitioned-window boundedness gates (round 13) ----
  // The engine's global (no PARTITION BY) windows are by design windows
  // over AGGREGATED, cardinality-bounded tables (distinct integer-ppm
  // scores, bins, strata) — never over the corpus. That design claim is
  // what makes the single-partition sort safe at 100 TB, so pin it in the
  // plan: every `Window [` node must sit ABOVE a grouped aggregate (plans
  // print top-down — the aggregate appears later in the string), i.e. the
  // window's input already collapsed to the bounded value/stratum domain.
  private def windowsSitAboveAggregate(name: String): Unit = {
    val p = plan(name)
    val firstW = p.indexOf("Window [")
    assert(firstW >= 0, s"expected a global window in $name:\n" + p)
    var w = firstW
    while (w >= 0) {
      val agg = math.max(p.indexOf("HashAggregate", w),
        p.indexOf("SortAggregate", w))
      assert(agg > w,
        s"window at char $w of $name must sit above an aggregate " +
          s"(bounded input):\n" + p)
      w = p.indexOf("Window [", w + 1)
    }
  }

  test("q116: AUC window runs over the distinct-score histogram, not rows") {
    windowsSitAboveAggregate("q116_score_auc")
  }
  test("q119: KS windows run over the distinct-score histogram, not rows") {
    windowsSitAboveAggregate("q119_ks_separation")
  }
  test("q120: threshold-sweep windows run over the distinct-score histogram") {
    windowsSitAboveAggregate("q120_threshold_sweep")
  }
  test("q130: cumulative-gain windows run over the score histogram and bins") {
    windowsSitAboveAggregate("q130_cumulative_gain")
  }
  test("q166: spearman rank windows run over distinct-value count tables") {
    windowsSitAboveAggregate("q166_spearman_rank")
  }
  test("q228: Neyman allocation window runs over the strata table") {
    windowsSitAboveAggregate("q228_neyman_alloc")
  }
  test("q255: perplexity-bucket window runs over the bounded bin histogram") {
    windowsSitAboveAggregate("q255_perplexity_buckets")
  }

  test("whole-stage codegen covers the cosine hot path (equi-join variant)") {
    // q20's BroadcastNestedLoopJoin disables whole-stage codegen around its
    // projection (cosine_sim still evaluates, interpreted); the equi-join
    // detection path q25 is the hot shape and must stay codegen'd.
    val p = plan("q25_path2_centroid_anomaly")
    // codegen spans print as "*(n) Operator" in the executed-plan string
    assert(p.contains("*(") && """\*\(\d+\) Project \[.*cosine_sim""".r
      .findFirstIn(p).isDefined, p)
  }
}
