package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Whole-registry plan hygiene: NO declared query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where it
  * is the design (a driver-sized side crossed on purpose: query vectors
  * against a corpus, a 1-row aggregate attached to a groups-sized frame).
  * Any new query that accidentally regresses into an all-pairs stage
  * fails here by name — the gate that keeps 76 queries honest at 100 TB.
  */
class PlanHygieneSpec extends SparkSpec {

  // BNLJ-by-design: the crossed side is provably tiny (queries, centroids,
  // 1-row aggregates), so the "nested loop" is a broadcast map over the
  // corpus — the intended shape, not an accident.
  private val bnljByDesign = Set(
    "q20_cosine_vs_query",    // 1 query vector × corpus
    "q22_knn_topk",           // broadcast query set × corpus scan
    "q23_knn_same_label",     // per-label variant of the same
    "q26_path3_novelty",      // ANN pre-filter crosses the query snapshot set
    "q27_ivf_knn",            // centroid table × query set probe
    "q28_lsh_knn",            // hamming prefilter against broadcast signatures
    "q29_ivf_trained",        // stored-index probe (centroids broadcast)
    "q80_ivfpq",              // cell probe (centroids broadcast) + refine
                              // shortlist broadcast over probed cells
    "q61_media_knn",          // media-feature kNN (broadcast queries)
    "q68_pq_adc",             // broadcast distance table
    "q72_temperature_rebalance", // 1-row min-count attached to groups frame
    "q54_length_percentiles", // single-row percentile frame
    "q36_token_distribution", // 1-row total attached to distribution
    "q55_iot_all_methods",    // method-comparison summary over 5 devices
    "q56_similar_states",     // per-anomaly history probe (anomaly set tiny)
    "q65_bigram_fluency",     // 1-row corpus total attached to rate table
    "q49_tfidf_top_terms",    // 1-row doc-count attached to df table
    "q62_boilerplate_mining", // 1-row corpus threshold attach
    "q64_passage_strip",      // same threshold attach as q62
    "q73_int8_quantize",      // none expected, tolerated if AQE 1-rows it
    "q81_value_parts",        // 1-row global total attached to part values
    "q96_idle_rich_customers", // 1-row scalar average attached to customers
    "q99_funnel",             // three 1-row stage aggregates crossed into one row
    "q103_ann_recall",        // exact-kNN ground truth: broadcast query set × corpus
    "q199_copurchase_triangles", // three 1-row census aggregates (edge,
                              // degree, triangle counts) crossed into the
                              // single summary row
    "q203_copurchase_kcore",  // full-graph and core-graph 1-row censuses
                              // crossed into the summary row
    "q210_blocking_quality",  // exact ground-truth pair set on a bounded
                              // ~400-row audit subset (the corpus-scale
                              // linkage path stays the banded q105)
    "q211_sql_surface",       // 1-row query vector crossed onto the scan
                              // (q20's shape, written in SQL text)
    "q214_abc_xyz",           // 1-row revenue total crossed onto the
                              // part-domain Pareto/CV frames (twice)
    "q106_token_cooccurrence", // 1-row corpus count attached to pair supports
    "q50_iot_detect_pipeline", // simulator: tick sequence × broadcast metric
                               // spec table (generator fan-out, not a corpus)
    "q112_feature_normalize",  // 1-row stats aggregate attached to the scan
                               // (feeds bucketing + min-max/z-score readouts)
    "q113_bm25_topk",          // 1-row corpus stats (N, Σdl, df) broadcast
                               // back onto the narrow per-doc tf/dl scan
    "q204_rrf_fusion",         // composes q113's BM25 chain — same 1-row
                               // stats cross; the fusion join itself is a
                               // 30-row × 30-row equi full-outer
    "q118_chi2_independence",  // 1-row grand total attached to the
                               // category-sized contingency cell table
    "q121_lang_kappa",         // 1-row chance-agreement aggregate attached
                               // to the 1-row observed-agreement aggregate
    "q124_matryoshka_recall",  // both sides are broadcast-query exact kNN
    "q126_bpe_merges",         // per-iteration 1-row argmax merge rule
                               // broadcast onto the vocab-sized seg table
    "q127_bpe_encode",         // trains via q126's plan (same 1-row
                               // argmax broadcasts); encoding itself is
                               // a zero-shuffle scan transform
    "q131_lm_score",           // 1-row vocab-size (smoothing V) attached
                               // to the holdout bigram score table
    "q132_skew_audit",         // 1-row total/keys aggregate attached to
                               // the top-K hot-key frame
    "q135_cluster_quality",    // label-count centroid table broadcast
                               // over the point scan (k rows, k ≈ 8)
    "q136_dsir_weights",       // 1-row corpus totals attached to the
                               // hashed-bucket rate tables
    "q142_hard_negatives",     // broadcast anchor set × corpus scan with
                               // the label-inequality residual (q22 shape)
    "q143_retrieval_mrr",      // exact-kNN ranking side (broadcast query
                               // set × corpus) under the 1-row MRR fold
    "q151_quantile_normalize", // 1-row (n, min, max) stats aggregate
                               // attached for bucketing + the index rule
                               // (q112's designed shape, twice)
    "q158_retrieval_ndcg",     // exact-kNN ranking side (broadcast query
                               // set × corpus), the q143 shape
    "q161_corpus_curate",      // quantile-normalize stage: q151's
                               // designed 1-row stats attaches
    "q162_zipf_coverage",      // 1-row (n_vocab, n_tokens) total attached
                               // to the vocabulary-sized coverage window
    "q163_heavy_hitters",      // 1-row MG-candidates + total aggregate
                               // attached to the bounded exact recount
    "q169_session_pmi",        // 1-row session-count total attached to
                               // the |types|²-sized pair table
    "q172_activity_heatmap",   // 1-row event total attached to the
                               // 7×24-bounded calendar-cell table
    "q174_knn_vote",           // exact-kNN ranking side (broadcast query
                               // set × corpus), the q143 shape
    "q175_market_basket",      // 1-row order total attached to the
                               // support-bounded pair table
    "q186_revenue_pareto",     // 1-row (n_cust, total) attached to the
                               // customer-sized coverage window
    "q224_survival_km",        // 1-row corpus-end-hour attached to the
                               // per-user lifetime table (censoring cut)
    "q229_token_burstiness",   // 1-row corpus doc count attached to the
                               // vocabulary-sized VMR table
    "q231_decayed_popularity", // 1-row as-of date attached to the fact
                               // scan (per-row dyadic age weight)
    "q238_cohort_survival",    // q224's 1-row corpus-end-hour attach,
                               // cohort-grouped
    "q188_user_value_deciles", // 1-row value total attached to the
                               // 10-row decile table
    "q247_dsir_scores",        // 1-row (tt, tr) feature totals attached to
                               // the bucket-sized weight table + 1-row doc
                               // count attached to the score-bin histogram
    "q248_lm_surprisal",       // 1-row vocab-size (smoothing V) attached
                               // to the per-bigram score rows (q131 shape)
    "q249_source_drift",       // 1-row global token total attached to the
                               // (source, word) rate rows
    "q253_semdedup_recall",    // exact ground-truth pair set on the bounded
                               // vec_id % 4 audit subset (broadcast sample
                               // × sample — the q210 calibration shape)
    "q255_perplexity_buckets", // q248's 1-row vocab-size attach + the 1-row
                               // doc-count attach onto the bounded bin table
    "q260_domain_mix_weights", // q248's 1-row vocab-size attach feeding the
                               // |domains|-row DoReMi rollup
    "q261_rholoss_selection",  // two q248 chains -> two 1-row vocab-size
                               // attaches (train + holdout LM)
  )

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("no declared query plans a CartesianProduct; BNLJ only where designed") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = executedPlan(name)
      val cart = if (p.contains("CartesianProduct")) Some(s"$name: CartesianProduct") else None
      val bnlj = if (p.contains("BroadcastNestedLoopJoin") && !bnljByDesign(name))
        Some(s"$name: unexpected BroadcastNestedLoopJoin") else None
      cart.toSeq ++ bnlj.toSeq
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
