package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes docs/PLANS.md: executed physical plans of headline queries with
  * scale commentary. Regenerate with `sbt "runMain graft.PlanDump"` after
  * plan-affecting changes so the doc never drifts from reality.
  */
object PlanDump {

  private val commentary: Seq[(String, String)] = Seq(
    "q224_survival_km" ->
      ("Kaplan-Meier survival: the corpus pays exactly one groupBy(user) " +
        "shuffle; the 1-row corpus-end aggregate broadcasts onto the " +
        "per-user table (the designed scalar BNLJ), and the ordered " +
        "survival recurrence — the part that looks like it needs a global " +
        "sorted window — runs as a linear aggregate HOF over the " +
        "collected lifetime DOMAIN (hundreds of rows), never the corpus."),
    "q226_conformal" ->
      ("Split conformal: folds are a narrow hash predicate fused into the " +
        "scan (no split shuffle); the per-group predictor and q-hat " +
        "tables are |groups|-row broadcasts; the conformal quantile is a " +
        "window over DISTINCT residual values (value-compressed, the " +
        "AUC/KS discipline). Three passes over the fact, zero wide " +
        "shuffles beyond the group aggregates."),
    "q234_attribution_models" ->
      ("Multi-touch attribution: one per-user sequence window over the " +
        "fact (its natural partitioning), then conversions join touches " +
        "on user with a row-index band — fanout bounded at maxTouches " +
        "per conversion by construction, so the join never explodes. " +
        "The per-conversion (k, first, last) rollup and the channel " +
        "rollup are ordinary keyed hash aggregates; every credit split " +
        "is integer milli, no UDFs anywhere."),
    "q199_copurchase_triangles" ->
      ("Triangle census with degree-ordered orientation: every edge is " +
        "directed from its lower (degree, id) endpoint, so the wedge self-join " +
        "— the only super-linear stage — is bounded by Σ outdeg² = O(m^1.5) " +
        "even on power-law co-purchase graphs where a naive adjacency join " +
        "explodes on hub parts. All three joins are equi-joins on vertex ids " +
        "(shuffle or broadcast per AQE); the BNLJ at the top crosses three " +
        "1-row census aggregates, nothing else."),
    "q209_skyline_parts" ->
      ("Skyline/Pareto frontier without a pairwise stage: the corpus shrinks " +
        "to DISTINCT (price, size) pairs in one map-combined aggregate, " +
        "same-price domination collapses to a max-per-price, and the " +
        "cross-price sweep is a cumulative-max window over the PRICE DOMAIN — " +
        "the window's input is value-range-bounded, never row-count-bounded, " +
        "so a 100 TB fact table costs one aggregate plus a tiny sort."),
    "q195_minhash_error" ->
      ("Sketch-accuracy audit sharing q31's exact plan shape: narrow " +
        "signature projection (zero-shuffle), band-key equi-join for " +
        "candidates, candidate-only exact rescoring. The only addition is a " +
        "9-row aggregate keyed on the signature-agreement count — auditing " +
        "the estimator costs the same as running it."),
    "q203_copurchase_kcore" ->
      ("Iterative peel: each round is one map-combined degree aggregate and " +
        "two anti-joins against the sub-k vertex set, on an edge set that " +
        "only shrinks; localCheckpoint truncates lineage and its count is the " +
        "loop condition (no extra job). Rounds are bounded by degeneracy " +
        "depth — single digits on real graphs."),
    "q186_revenue_pareto" ->
      ("Pareto knees without a single-partition window: PrefixSum's two-pass " +
        "shape — a RANGE exchange on (rev desc, custkey), per-partition " +
        "running sums partitioned by spark_partition_id, and a " +
        "partition-count-sized offset frame broadcast back. The plan shows " +
        "parallel Window operators instead of WindowExec's all-rows-to-one-" +
        "task warning; at a billion customers every stage stays partitioned."),
    "q242_repeated_spans" ->
      ("Span-level dedup readout: one posexplode (linear in tokens) into a " +
        "persisted longs-only (doc, pos, gramhash) frame; the duplicated-gram " +
        "table is a distinct + count keyed on the hash, positions re-join it " +
        "LEFT SEMI (postings x 1, never postings squared), and the interval " +
        "union runs as per-doc windows bounded by doc length. No pair stage " +
        "anywhere — corpus size only widens the embarrassingly parallel map " +
        "side and the two keyed shuffles."),
    "q246_semantic_exemplars" ->
      ("Paper-faithful SemDeDup, corpus-bounded: the trained cells are a " +
        "LITERAL frame (Lloyd state collected per round — nCells x dim, " +
        "driver-sized), so assignment is a zero-shuffle map and the " +
        "election broadcast costs nothing to recompute. One window over " +
        "(cell, vector) collapses byte-identical vectors to min-id " +
        "delegates (copy-heavy cells cost distinct squared, members ride " +
        "free cosine-1 edges); a second window counts the distinct-class " +
        "census that arms the sign-LSH sub-band split above the per-cell " +
        "cap; the pair join is equi on (cell, band) — never corpus " +
        "squared — with a one-word hamming popcount screening candidates " +
        "before the 2-dim-flop cosine. Components label in the one-eager-" +
        "job star-contraction pass; the centroid-outlier election is a " +
        "min(struct) window per component, not a groupBy + join."),
    "q225_bootstrap_ci" ->
      ("Poisson bootstrap: replicate draws are pure per-row hash math, so " +
        "the plan is explode(x100) -> map-combined partial aggregate; the " +
        "shuffle carries |groups| x replicates cells, never the data. The " +
        "pre-explosion rows are re-spread when the source arrives in fewer " +
        "splits than cores — shuffling 1x of the data to parallelize 100x " +
        "of the work (13.8s -> 2.0s on the single-split fixture)."),
    "q01_pricing_summary" ->
      ("Scan → partial HashAggregate → exchange → final aggregate. The shipdate " +
        "predicate reaches the parquet scan (PushedFilters) and only the six " +
        "referenced columns are read — at 100 TB this is the difference between " +
        "scanning a column subset and the whole table."),
    "q03_star_join" ->
      ("Fact side streams once; nation/region/customer build sides are " +
        "BroadcastHashJoins — zero fact-side shuffles before the final " +
        "aggregation. The same shape holds at 1000 executors because dimension " +
        "sizes don't grow with the fact table."),
    "q22_knn_topk" ->
      ("kNN without a window: queries broadcast over the corpus scan, cosine in " +
        "whole-stage codegen, then top_k_by_score partial aggregation — shuffle " +
        "volume is partitions x queries x k rows, never the |Q|x|C| similarity " +
        "matrix. Corpus size only affects the embarrassingly parallel map side."),
    "q25_path2_centroid_anomaly" ->
      ("Path-2 detection: centroid build (posexplode + two-level aggregate) " +
        "feeds a BroadcastHashJoin against the snapshot stream; scoring is one " +
        "codegen'd projection. Profiles stay one-row-per-entity, so the " +
        "broadcast never grows with history."),
    "q31_minhash_neardup" ->
      ("MinHash+LSH: ONE shuffle aggregates each doc's distinct shingle-hash " +
        "set; signatures, counts and the candidate-pair intersection " +
        "(array_intersect) derive narrowly from it. Banding is an equi-join " +
        "(no cartesian anywhere); shuffle_hash hints pin the set-carrying " +
        "joins out of broadcast regardless of size estimates."),
    "q24_neardup_pairs" ->
      ("Embedding near-dup, banded: 16 portable sign-LSH band signatures per " +
        "vector, candidates from a (band, signature) equi self-join, exact " +
        "cosine verify on candidates only. No nested-loop/cartesian stage — " +
        "the O(n²) all-pairs variant survives only as a spec cross-check. " +
        "Candidate volume scales with bucket occupancy, not corpus size."),
    "q32_simhash_pairs" ->
      ("SimHash with pigeonhole blocking: the 64-bit fingerprint splits into " +
        "4 x 16-bit spans; Hamming<=3 pairs MUST collide on >=1 span, so an " +
        "equi-join on (span, value) has EXACT recall with no all-pairs stage. " +
        "Cost is per-bucket occupancy², the standard simhash sharding scheme."),
    "q38_neardup_components" ->
      ("Transitive components: one star-contraction shuffle (each vertex " +
        "takes min over itself and its neighbors) collapses every " +
        "min-centered star/clique — the typical dup-graph shape labels in " +
        "3 jobs flat, zero propagation rounds — then pointer-doubling " +
        "min-label propagation (lbl := lbl(lbl) each round) covers residual " +
        "chains in O(log diameter) rounds. Round count, not bytes, is what " +
        "a busy cluster multiplies: under a 24-core synthetic load q38 " +
        "inflates 1.36x where the one-hop loop inflated 11.6x (BENCH_r06)."),
    "q49_tfidf_top_terms" ->
      ("TF-IDF top-3 terms: document-frequency table and corpus count " +
        "broadcast back onto the tf stream, then GroupedTopKRewrite turns the " +
        "(score desc, term asc) row_number window into a bounded top_k_rows " +
        "aggregate — O(k) state per doc, map-side partials, no shuffle+sort " +
        "of the full scored set. 5.7 s → 0.9 s vs round 2."),
    "q29_ivf_trained" ->
      ("Stored IVF: k-means cells persisted with the corpus PARTITIONED BY " +
        "cell_id; the probed cell set resolves first and reaches the scan as " +
        "a static PartitionFilter — a 3-of-1024-cells probe reads ~0.3% of " +
        "corpus bytes, enforced by layout rather than a runtime filter. The " +
        "declared query trains with Ivf.buildPortable (micro-unit Lloyd " +
        "rounds, exact BIGINT-sum re-centering, zero-shuffle fold " +
        "assignment), which the DuckDB oracle reproduces bit-for-bit via " +
        "unrolled CTEs — the one k-means whose trained output is " +
        "hash-checked, not rows-only."),
    "q58_corpus_shuffle" ->
      ("Deterministic global shuffle without a global sort: the uniform id " +
        "hash is cut into fixed-width bucket ranges, ranks are per-bucket " +
        "windows (parallel), and bucket offsets come from one driver-sized " +
        "count aggregation — offset + rank equals the global permutation " +
        "position exactly. One shuffle on the bucket key; no single-" +
        "partition window anywhere."),
    "q62_boilerplate_mining" ->
      ("Repeated-passage mining: per-row chunking is narrow (zero shuffles " +
        "until the hash), then ONE shuffle on the 8-byte chunk hash with " +
        "partial-aggregating distinct-doc counts. Join the result back on " +
        "chunk_hash to strip template text — corpus bytes are touched " +
        "exactly once."),
    "q67_interval_join" ->
      ("Banded interval join: a |Δt| <= w condition alone would plan a " +
        "BroadcastNestedLoopJoin (O(|L|x|R|) per key). Bucketing time into " +
        "width-w bands and exploding ONE side to its 3 candidate bands turns " +
        "it into a hash equi-join on (user, band) with the exact predicate as " +
        "a residual conjunct — shuffle-partitionable, AQE-skew-splittable, " +
        "each qualifying pair produced exactly once."),
    "q68_pq_adc" ->
      ("Product quantization + ADC: candidates are scored from m=8 int codes " +
        "and a broadcast query-side distance table — the corpus vectors are " +
        "never touched after encoding. At 100 TB the ADC scan reads ~m bytes " +
        "per vector instead of 4·d, and per-candidate work is m table lookups. " +
        "Fixed-point micro-units make every distance bit-identical across " +
        "engines, so even this approximate path is oracle-hash-checked."),
    "q70_min_cost_supplier" ->
      ("Per-part argmin over a fact-derived score: the rank-1 window's " +
        "Partial WindowGroupLimit runs BEFORE the exchange, so each task " +
        "ships at most one row per part key — shuffle volume is |parts|, " +
        "not |lineitem|. (All-primitive payload, so GroupedTopKRewrite's " +
        "cost guard defers to Spark's native group-limit; with string/array " +
        "payloads the custom bounded aggregate takes over instead.)"),
    "q71_source_cap" ->
      ("Source balancing: keep ≤ k docs per source by deterministic " +
        "(id-hash, id) rank. Same bounded rank-k shape as q70 — a hot crawl " +
        "dump with billions of rows still contributes at most k rows per " +
        "map task to the shuffle, and the selection is a pure function of " +
        "ids, so incremental rebuilds keep the same docs."),
    "q72_temperature_rebalance" ->
      ("α=0.5 temperature rebalancing: the rate table is one |groups|-row " +
        "aggregate joined back by broadcast; the corpus-side decision is a " +
        "codegen'd integer predicate on a portable md5-derived hash — no " +
        "second corpus shuffle, no rand(), bit-identical keep set on rerun, " +
        "retry, or in another engine (the DuckDB oracle hash-matches it)."),
    "q77_small_qty_revenue" ->
      ("Correlated scalar subquery, decorrelated: the per-part average is a " +
        "two-level aggregate whose exchange hash-partitions on l_partkey — " +
        "the same key the fact join needs, so the join adds no exchange of " +
        "its own on that side (SMJ/SHJ co-partitioned; AQE broadcasts the " +
        "part dimension). The naive form — a subquery re-evaluated per row — " +
        "never appears: Catalyst sees only the join."),
    "q78_sole_return_suppliers" ->
      ("EXISTS + NOT EXISTS double correlation: both subqueries become hash " +
        "joins (LeftSemi then LeftAnti) keyed on l_orderkey with the " +
        "supplier inequality as a residual condition — the classic " +
        "decorrelation that keeps Q21-style queries off nested loops. All " +
        "three lineitem branches shuffle on the same key, so AQE can reuse " +
        "the exchange; per-order groups are bounded (7 lines), so no skew."),
    "q79_component_representatives" ->
      ("Quality-canonical dedup: component labels (pair-members only), the " +
        "corpus id spine, and the quality scores all join on doc_id — one " +
        "hash partitioning serves the chain. The per-component argmax is a " +
        "rank-1 window bounded before the exchange (WindowGroupLimit / " +
        "GroupedTopKRewrite), and the member counts reuse the same " +
        "comp-keyed shuffle. Label propagation cost is the q38 " +
        "contraction+doubling labeling; everything after it is linear."),
    "q80_ivfpq" ->
      ("IVF-PQ with exact refine — three compounding bounds: the stored " +
        "cells turn the probe into a static PartitionFilter (bytes READ ~ " +
        "nprobe/k of the corpus); ADC ranks the survivors from m-byte codes " +
        "against a broadcast distance table (bytes per CANDIDATE ~ m, not " +
        "4·d); exact cosine touches only the top-rerank shortlist, which " +
        "broadcasts back over the probed cells (float work ~ |Q|·rerank). " +
        "Exhaustive settings provably reproduce exact kNN (IvfPqSpec). The " +
        "declared query runs the PORTABLE stack (fixed-point Lloyd cells + " +
        "label codebook, every fold in fixed order), so the driver's DuckDB " +
        "oracle value-checks the trained index end to end; plan shape is " +
        "identical to the ML-KMeans production variant."),
    "q74_incremental_neardup" ->
      ("Incremental near-dup: the indexed corpus appears ONLY as its " +
        "bucketed band/set tables — the delta's band keys equi-join the " +
        "stored bands, the delta self-bands normally, and the exact-Jaccard " +
        "rescore touches just banding-bounded candidates. Per-increment " +
        "cost is O(delta); the base corpus was shuffled exactly once, at " +
        "index-build time. This is the daily-crawl-increment shape at " +
        "100 TB — re-running full dedup per increment is the thing this " +
        "operator exists to avoid."),
    "q81_value_parts" ->
      ("Global-share HAVING (TPC-H Q11 shape): the per-part aggregate and " +
        "the 1-row corpus total derive from the SAME lineitem scan; the " +
        "total attaches by broadcast (the only by-design nested loop is a " +
        "1-row build side), and the share predicate is an integer-decimal " +
        "comparison — no double division, so the cut is bit-stable across " +
        "engines. Fact bytes are read once."),
    "q82_big_ticket_orders" ->
      ("Grouped-HAVING semi filter (TPC-H Q18 shape): the qty-sum filter " +
        "reduces lineitem to qualifying order keys BEFORE any wide join — " +
        "AQE sees a tiny filtered aggregate and broadcasts it over orders; " +
        "customers broadcast over the survivors. The fact table crosses " +
        "the network once, as an aggregate keyed on its natural join key."),
    "q83_token_budget_mix" ->
      ("Token-budget corpus mixing by quality-BIN threshold: docs " +
        "aggregate once into (source, quality_ppm) bins, only the bounded " +
        "bin table (≤1e6 rows/source, corpus-size-independent) sees the " +
        "running-sum window, and membership returns as a LEFT SEMI join on " +
        "the bin key. The naive per-doc cumulative window — a dominant " +
        "source's entire corpus in ONE window task — never appears."),
    "q84_shared_span" ->
      ("Longest literally-shared token run per near-dup pair: token " +
        "positions meet in an equi-join keyed on (doc id, token) — only " +
        "genuinely shared tokens materialize — and islands of consecutive " +
        "positions per diagonal reduce to a per-(pair, diagonal) window " +
        "over banding-bounded candidates. The suffix-array question " +
        "answered with joins: no per-pair alignment loop, no cross join."),
    "q85_semantic_dedup" ->
      ("SemDeDup shape: the portable trained k-means cells bound the " +
        "pair space — a co-partitioned self-join on cell_id, O(Σ cell²) " +
        "never corpus², cosine verify inside whole-stage codegen. The " +
        "earliest-id keep rule makes the removed set a pure function of " +
        "the inputs, so the whole cluster-then-compare pipeline is " +
        "oracle-hash-checked (trained cells included)."),
    "q88_histogram_percentiles" ->
      ("Percentiles without a global sort: fixed-width bins aggregate " +
        "with map-side partials (mergeable, streaming-compatible), the " +
        "per-group bin table is bounded by the VALUE RANGE rather than " +
        "corpus size, and integer ppm rank thresholds read the answer " +
        "off cumulative counts. q54's exact percentile collects every " +
        "group into one task; this shape never does."),
    "q89_source_overlap" ->
      ("Cross-source overlap matrix: the corpus reduces to its distinct " +
        "(source, shingle-hash) set — ONE shuffle on the 8-byte hash — " +
        "and the per-hash self-join fans out by the number of sources " +
        "(dozens), never documents. Containment is integer-ppm against " +
        "the smaller side, so the matrix is bit-stable across engines."),
    "q92_value_drift" ->
      ("Distribution-drift monitor: ONE conditional-count pass builds " +
        "BOTH periods' histograms (map-side partials), everything after " +
        "runs on the bounded bin table, and the total-variation score is " +
        "integer-ppm — the train-vs-serve skew check as a single scan, " +
        "no log/exp, bit-identical on rerun or another engine."),
    "q93_countmin_shingles" ->
      ("Count-min sketch, oracle-checkable: the (4 × 256) grid builds in " +
        "one partial-aggregating pass and is fixed bytes at ANY key " +
        "cardinality; estimates broadcast-join the driver-tiny grid. " +
        "Portable md5 bucket hashes mean the approximate path itself " +
        "hash-matches DuckDB — plus cell-wise mergeability (SketchSpec), " +
        "the property that lets per-day grids combine at 100 TB."),
    "q94_kmv_distinct" ->
      ("KMV distinct-count: per-group state is the k smallest portable " +
        "key hashes — GroupedTopKRewrite turns the rank-k window into a " +
        "bounded map-side aggregate, so the distinct-hash set never " +
        "sorts — and the order-statistic estimate is pure integer " +
        "arithmetic, reproduced bit-for-bit by the oracle."),
    "q99_funnel" ->
      ("Conversion funnel without a per-user sort: each stage is a " +
        "filtered min-aggregate chained on the user key — the stage " +
        "tables shrink monotonically, the 1-row stage summaries cross by " +
        "broadcast (the only by-design nested loops), and the same " +
        "semantics run incrementally on a stream with O(stages) state " +
        "per user (StreamingFunnel, batch ≡ stream proven)."),
    "q101_mad_outliers" ->
      ("Robust outliers: two grouped exact percentiles (median, then " +
        "median absolute deviation) — both result tables are |groups| " +
        "rows and broadcast back over the scan, so the corpus is read " +
        "twice and shuffled never. MAD tolerates the heavy tails that " +
        "inflate stddev-based z-scores (q14's method)."),
    "q102_fuzzy_decontaminate" ->
      ("Fuzzy decontamination: band signatures of the eval and training " +
        "sides meet in an equi-join on the band key — never test × " +
        "train — and only collided candidates are exactly " +
        "Jaccard-rescored. Catches paraphrased cross-boundary leakage " +
        "that exact fingerprint overlap (q35) misses; candidate volume " +
        "scales with band-bucket occupancy, not |test|·|train|."),
    "q105_fuzzy_part_names" ->
      ("Fuzzy record linkage with EXACT recall: edit distance bounds the " +
        "length difference, so width-(t+1) length bands plus an " +
        "adjacent-band explode surface every qualifying pair through an " +
        "equi-join — per-(block, band) occupancy², never block². The " +
        "residual Levenshtein is thresholded (diagonal-stripe DP, bails " +
        "past the budget) behind an exact length pre-filter. The oracle " +
        "affirms with the naive exact join the banding replaces."),
    "q106_token_cooccurrence" ->
      ("Market-basket mining: per-doc distinct tokens self-join WITHIN " +
        "the doc — per-doc cost is distinct-token², bounded by " +
        "vocabulary, never corpus² — then one partial-aggregating " +
        "shuffle on the pair key; the support threshold is an integer " +
        "cross-multiplication against the broadcast 1-row corpus count."),
    "q109_pii_redaction" ->
      ("PII scrub: detection counts (RegExpExtractAll) and the ordered " +
        "redaction chain (RegExpReplace) are all codegen'd expressions in " +
        "ONE projection over the scan — zero shuffle before the declared " +
        "ORDER BY. At 100 TB the pass is embarrassingly parallel and reads " +
        "only the id + text columns (pruned scan)."),
    "q110_feature_corr" ->
      ("Pairwise Pearson matrix: every moment (n, Σx, Σx², Σxy for all " +
        "pairs) accumulates in one partial HashAggregate over the scan; " +
        "the exchange carries a SINGLE row of sums regardless of data " +
        "size, and the 6-pair readout is constant work on the driver side " +
        "of the final aggregate. Exact decimal sums make the result " +
        "partitioning-invariant."),
    "q111_epoch_upsample" ->
      ("Epoch upsampling: copy counts (portable-hash Bernoulli on the " +
        "fractional weight) and the explode(sequence) row expansion are " +
        "map-side inside the scan task — zero shuffle before the declared " +
        "ORDER BY. Output volume is Σw_i rows; no stage ever holds more " +
        "than one task's expansion in memory."),
    "q112_feature_normalize" ->
      ("Feature normalization incl. EXACT quantile rank WITHOUT the global " +
        "sort: value-ordered fixed-width buckets (from the same one-row " +
        "stats aggregate that feeds min-max/z-score) partition the rank " +
        "window, and broadcast cumulative bucket counts lift per-bucket " +
        "ranks to global ones. Equal values share a bucket, so ties are " +
        "exactly rank()'s. One data shuffle on the bucket key; the only " +
        "single-partition window is over numBuckets rows."),
    "q113_bm25_topk" ->
      ("BM25 retrieval: per-doc tf (one array_filter per query term) and " +
        "dl are narrow expressions inside the scan task — the tokens are " +
        "never exploded. Corpus stats (N, Σdl, per-term df) reduce to ONE " +
        "row broadcast back, and the global top-k is TakeOrderedAndProject " +
        "— the full plan has exactly one wide stage, the 1-row aggregate, " +
        "regardless of corpus size. Scoring is ppm fixed-point: " +
        "bit-identical in any engine, no libm idf."),
    "q114_textrank_keywords" ->
      ("TextRank: edge extraction is a narrow zip + one groupBy on the " +
        "(u,v) pair key; the graph is vocabulary-sized, so all 10 power " +
        "iterations run as broadcast-hash joins over cached graph tables " +
        "— iteration cost never touches the corpus again. Fixed iteration " +
        "count = no per-round convergence job (the q38 lesson); integer " +
        "ppm damping makes every round's ranks engine-exact."),
    "q115_gap_fill_locf" ->
      ("Dense hourly grid + LOCF: one (key, hour) groupBy is the only " +
        "corpus-sized shuffle; the grid explodes from a per-key (min,max) " +
        "aggregate, so grid cost scales with output rows, and the fill " +
        "window sorts only within a key's hour span — no global sort. A " +
        "key's window state is its span, independent of its event volume."),
    "q116_score_auc" ->
      ("Mann-Whitney AUC: the corpus collapses to a per-DISTINCT-score " +
        "class histogram in one map-side-combined groupBy; the rank window " +
        "runs over that histogram (score cardinality, not corpus rows) and " +
        "the readout is one integer division. Tie handling is exact pair " +
        "counting — no per-row rank, no float rank averaging."),
    "q119_ks_separation" ->
      ("KS statistic: same distinct-score histogram collapse as the AUC; " +
        "cumulative class counts are windows over the histogram only, the " +
        "per-threshold CDF gap is one exact cross-multiplied integer, and " +
        "the arg-max cut point falls out of the same aggregate (max_by on " +
        "a unique ordering struct) — no second pass, no float CDFs."),
    "q120_threshold_sweep" ->
      ("PR/F1 sweep: every operating point from ONE descending cumulative " +
        "window over the distinct-score histogram — tp/fp/fn are running " +
        "sums, each metric one ppm division per DISTINCT score. The " +
        "output is operating-point-sized; the corpus is touched exactly " +
        "once by the map-side-combined histogram groupBy."),
    "q121_lang_kappa" ->
      ("Cohen's kappa: predictions come from the vocabulary-rate language " +
        "model (broadcast rate table), then ONE groupBy on the (pred, " +
        "true) cell key; marginals derive from the cell table and meet on " +
        "the category key. Both final aggregates are 1-row; the decimal " +
        "marginal algebra keeps even negative kappa engine-exact."),
    "q122_quality_audit" ->
      ("Data-quality audit: every row predicate shares ONE scan (a single " +
        "aggregate of conditional counts unpivoted via inline), uniqueness " +
        "is one map-side-combined key groupBy read off two sums, and FK " +
        "integrity is one join against the distinct parent keys. The " +
        "report is constraint-sized whatever the batch size."),
    "q123_snapshot_diff" ->
      ("CDC snapshot diff: BOTH as-of snapshots fall out of one groupBy " +
        "as conditional max_bys (rows past a cutoff have a null ordering " +
        "struct, which max_by ignores) — one corpus scan, one key " +
        "shuffle, no snapshot-vs-snapshot join, and the output is the " +
        "delta only."),
    "q124_matryoshka_recall" ->
      ("Matryoshka recall: two exact brute-force kNN passes (64-dim " +
        "ground truth, 16-dim truncated) — each a broadcast query set " +
        "mapped over the corpus scan with a bounded top-k aggregate — " +
        "then recall@5 joins two query-sized frames. The truncated scan " +
        "reads the same column; slice() keeps it one projection."),
    "q125_component_split" ->
      ("Leakage-free split: the q38 component labeling (banded candidate " +
        "join, frontier label propagation) plus ONE groupBy on the split " +
        "label. The hash rule keys on the component, so near-dup pairs " +
        "can't straddle the boundary by construction — the cross-split " +
        "pair count is structurally zero (SamplingSpec asserts it)."),
    "q126_bpe_merges" ->
      ("BPE merge training: the corpus is touched ONCE (word-frequency " +
        "groupBy); each of the 10 fixed iterations runs on the " +
        "vocabulary-sized segmentation table — a pair-count groupBy plus " +
        "a 1-row argmax broadcast back as a single replace. " +
        "localCheckpoint keeps lineage flat; no per-round convergence " +
        "job; integer counts + binary-collated ties keep the learned " +
        "rules engine-exact."),
    "q127_bpe_encode" ->
      ("BPE encode: merges provably cannot cross word boundaries, so the " +
        "replace chain (nMerges rows, driver-sized) applies to the DISTINCT " +
        "word table — string work is vocab-sized (~54k words at sf0.1), " +
        "sub-linear in the corpus, while the corpus itself pays one " +
        "map-combined (doc, word) count and a word-keyed join of integer " +
        "per-word sizes (2.4x measured vs encoding every document)."),
    "q128_column_profile" ->
      ("Column profile: row/null/exact-distinct counts and native-ordered " +
        "min/max for ALL columns from ONE scan — the multiple exact " +
        "distincts become a single Expand (cost x|cols|, one pass), the " +
        "result is |cols| rows unpivoted via inline. No per-column jobs, " +
        "no driver loop."),
    "q129_table_checksum" ->
      ("Table checksum: one codegen'd md5-derived hash per row, summed " +
        "map-side into decimal(38) — a single partial-aggregated scan, " +
        "one row out, invariant to partitioning and row order. The " +
        "cheapest possible 'did anything change' comparison between " +
        "pipeline runs."),
    "q130_cumulative_gain" ->
      ("Gain/lift table: the same distinct-score histogram collapse as " +
        "the AUC; bin assignment is integer cross-multiplication on the " +
        "descending cumulative counts (whole tied groups, no row-level " +
        "ranks), then an nBins-row aggregate + window. Corpus touched " +
        "once; everything after is score-cardinality-sized."),
    "q148_containment_pairs" ->
      ("Directed containment join: each probe doc's df-rarest prefix " +
        "shingles equi-join the FULL posting table (the asymmetric " +
        "prefix-filter theorem keeps recall exact — the indexed side " +
        "cannot be prefix-pruned because |B| is unbounded relative to " +
        "|A|), then one exact set-intersection verify on candidates. " +
        "Cost concentrates on rare×rare shingle collisions; no " +
        "cartesian/nested-loop stage anywhere."),
    "q150_pca_projection" ->
      ("PCA without a linear-algebra library: every scatter moment of " +
        "the micro-unit dims accumulates in ONE partial aggregate (a " +
        "single row crosses the exchange regardless of corpus size), " +
        "the 8×8 power iteration runs on the driver like the IVF " +
        "centroid collect, and the component returns as literals into " +
        "a zero-shuffle integer projection scan. At 100 TB the plan is " +
        "one corpus pass + one map pass."),
    "q151_quantile_normalize" ->
      ("Quantile normalization with no global sort: within-source ranks " +
        "are per-group windows; the global (position → value) table " +
        "comes from value-ordered buckets + broadcast cumulative " +
        "offsets (q112's rank machinery), and the remap is an integer " +
        "equi-join on the computed position. The two 1-row stats " +
        "attaches are the only BNLJs, by design."),
    "q140_prefix_jaccard" ->
      ("PPJoin with BOTH classic filters: prefix (df-rarest p = " +
        "s−⌈τs⌉+1 shingles per doc, equi-join on the 8-byte hash) AND " +
        "positional (a collision at ranks (i,j) bounds overlap by " +
        "1+min(na−i, nb−j) — integer cross-multiplied against " +
        "α = ⌈τ(na+nb)/(1+τ)⌉). On the bench corpus the positional " +
        "test cuts candidates ~19× (193k → 10k). What gets persisted " +
        "is the doc-count-sized per-doc SET table, not exploded " +
        "shingle rows — one corpus pass feeds df counts, prefix " +
        "ranking and the set verify."),
    "q163_heavy_hitters" ->
      ("Exact heavy hitters whose shuffle never sees the vocabulary: " +
        "pass 1 is ONE aggregate carrying both the total count and the " +
        "Misra-Gries summary (TypedImperativeAggregate, k−1 counters, " +
        "map-side partial merge — partitions×k rows cross the wire); " +
        "pass 2 recounts only the ≤k−1 candidates behind a broadcast " +
        "semi-join. The sketch is merge-order-dependent; the recount " +
        "makes the output exact and deterministic. A plain " +
        "groupBy(token) would shuffle every distinct token instead."),
    "q169_session_pmi" ->
      ("Association mining that never self-joins raw events: the one " +
        "event-level window assigns sessions, the distinct " +
        "session×type table (bounded by sessions·|types|) is pinned " +
        "once, and the pair join runs per session over the ≤|types| " +
        "rows it owns. Marginals and the 1-row session total attach " +
        "by broadcast; the lift readout is exact-integer ppm."))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // same surface as Verify/Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val sections = commentary.map { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
        .linesIterator.take(60).mkString("\n")
      s"## $name\n\n$note\n\n```\n$plan\n```\n"
    }

    val header =
      """# Physical plans of headline queries
        |
        |Generated by `sbt "runMain graft.PlanDump"` (executed plans, AQE-final,
        |sf0.001 inputs; truncated to 60 lines each). Structural properties are
        |enforced by `graft.queries.PlanSpec` — this file is the narrated version.
        |""".stripMargin
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"),
      header + "\n" + sections.mkString("\n"))
    println("wrote docs/PLANS.md")
    spark.stop()
  }
}
