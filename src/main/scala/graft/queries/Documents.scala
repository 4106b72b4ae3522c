package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Scrub, TextAnalysis}
import Q._

/** LLM-data-pipeline suite over the `documents` table: deduplication
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard) and text analysis
  * (language ID, quality scoring, token stats, fingerprinting).
  *
  * All hashing is md5-portable so the DuckDB oracle reproduces signatures
  * bit-for-bit; see [[graft.functions.TextFunctions]] and
  * [[graft.operators.Dedup]].
  */
object Documents {

  val queries: Map[String, QueryFn] = Map(
    // MinHash estimator calibration: per signature-agreement level, how
    // far the k/8 Jaccard estimate sits from the exact shingle Jaccard on
    // the LSH candidate set — the sketch-accuracy audit run before
    // trusting banding thresholds at full scale. Same banded plan as q31
    // plus one 9-row aggregate; everything in exact integer ppm.
    "q195_minhash_error" -> ((s, dir) => {
      Dedup.minhashCalibration(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, rowsPerBand = 2)
    }),

    // KWIC concordance (keyword in context): every occurrence of a query
    // term with its ±3-token context window — the corpus-linguistics /
    // search-snippet primitive a positional index serves. Positions come
    // from posexplode with the token array riding the row (narrow,
    // zero-shuffle until the bounded top-50 cut).
    "q221_kwic" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tok"))
        .select(col("doc_id"), col("tok"),
          posexplode(col("tok")).as(Seq("pos", "w")))
        .filter(col("w") === "vector")
        .select(col("doc_id"), col("pos").cast("bigint").as("pos"),
          concat_ws(" ", slice(col("tok"),
            greatest(col("pos") - 2, lit(1)),
            col("pos") - greatest(col("pos") - 3, lit(0)))).as("left_ctx"),
          concat_ws(" ", slice(col("tok"), col("pos") + 2, lit(3))).as("right_ctx"))
        .orderBy(col("doc_id"), col("pos"))
        .limit(50)
    }),

    // Source-level novelty: per source, its distinct shingle mass and the
    // share of it OWNED by that source under a fixed alphabetical union
    // order — "which dump still adds content if we ingest A, then B, …".
    // The source-granular complement of q153's crawl-order novelty; the
    // first-owner is a min aggregate on the shingle hash (df-table shape,
    // one shuffle on the hash).
    "q216_source_novelty" -> ((s, dir) => {
      import graft.functions.TextFunctions.{hash32, shingles, tokens}
      val sh = t(s, dir, "documents")
        .select(col("source"), tokens(col("text")).as("tok"))
        .select(col("source"),
          explode(array_distinct(transform(
            shingles(col("tok"), 3), x => hash32(x, 0)))).as("h"))
        .distinct()
      val owner = sh.groupBy(col("h")).agg(min(col("source")).as("owner"))
      val own = sh.groupBy(col("source"))
        .agg(count(lit(1)).as("n_distinct_shingles"))
      val novel = owner.groupBy(col("owner").as("source"))
        .agg(count(lit(1)).as("n_novel"))
      own.join(novel, Seq("source"), "left")
        .select(col("source"), col("n_distinct_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          expr("coalesce(n_novel, 0) * 1000000 div n_distinct_shingles")
            .as("novel_ppm"))
        .orderBy(col("source"))
    }),

    // Quality-band duplication rate: per fixed 0.1-wide quality band, the
    // share of docs appearing in a verified near-dup pair — the
    // data-centric diagnosis of whether low-quality content is also the
    // duplicated content (if so, the quality cut buys dedup for free).
    // Fixed score bands, not population deciles: zero global windows.
    "q215_quality_dup_rate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_ppm"))
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text")
      val dups = pairs.select(col("id_a").as("doc_id"))
        .unionAll(pairs.select(col("id_b").as("doc_id"))).distinct()
        .withColumn("is_dup", lit(1L))
      scored.join(dups, Seq("doc_id"), "left")
        .select(least(expr("quality_ppm div 100000"), lit(9L)).as("band"),
          coalesce(col("is_dup"), lit(0L)).as("is_dup"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dup"))
        .select(col("band"), col("n_docs"), col("n_dup"),
          expr("n_dup * 1000000 div n_docs").as("dup_ppm"))
        .orderBy(col("band"))
    }),

    // Near-dup threshold sweep: surviving verified-pair counts at Jaccard
    // 0.3/0.5/0.7/0.8/0.9 from ONE banding pass — the threshold-tuning
    // table that prices a dedup cut before running it corpus-wide.
    "q206_dedup_threshold_sweep" -> ((s, dir) => {
      Dedup.thresholdSweep(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Golden-record survivorship: per near-dup component, the merged
    // record — majority lang/source (deterministic tie-break), longest
    // member as content survivor, token mass summed. The keep-what step
    // of entity resolution, after q31's matching and q38's clustering.
    "q208_golden_record" -> ((s, dir) => {
      Dedup.goldenRecord(t(s, dir, "documents"), "doc_id", "text",
        voteCols = Seq("lang", "source"), lenCol = "n_chars")
    }),

    // Dedup savings accounting: per source, token mass before dedup,
    // after exact dedup, and after near-dup (component-representative)
    // dedup — the readout that prices a full-corpus re-dedup. Near stage
    // reuses the q31 banding + q38 components.
    "q198_dedup_savings" -> ((s, dir) => {
      Dedup.dedupSavings(t(s, dir, "documents"), "doc_id", "text", "source")
    }),

    // Reciprocal-rank fusion (the hybrid-search staple): BM25 ranking and
    // a raw term-frequency ranking for the same query, fused with the
    // integer RRF weight 1e6 div (60+rank) — rank-only fusion needs no
    // score normalization across retrievers, which is exactly why serving
    // stacks use it. Both input rankings are bounded top-30 lists, so the
    // fusion join is constant-sized whatever the corpus.
    "q204_rrf_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.tokens
      val docs = t(s, dir, "documents")
      val a = TextAnalysis.bm25TopK(docs, "doc_id", "text", bm25Terms, k = 30)
        .withColumn("rank_bm25", row_number().over(
          Window.orderBy(col("score_ppm").desc, col("doc_id"))).cast("bigint"))
        .select(col("doc_id"), col("rank_bm25"))
      val tf = bm25Terms
        .map(tm => size(filter(col("tok"), x => x === lit(tm))).cast("bigint"))
        .reduce(_ + _)
      val b = docs.select(col("doc_id"), tokens(col("text")).as("tok"))
        .withColumn("tf", tf).drop("tok")
        .filter(col("tf") > 0)
        .orderBy(col("tf").desc, col("doc_id")).limit(30)
        .withColumn("rank_tf", row_number().over(
          Window.orderBy(col("tf").desc, col("doc_id"))).cast("bigint"))
        .select(col("doc_id"), col("rank_tf"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
          coalesce(col("rank_tf"), lit(0L)).as("rank_tf"),
          (coalesce(expr("1000000 div (60 + rank_bm25)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + rank_tf)"), lit(0L))).as("rrf_ppm"))
        .orderBy(col("rrf_ppm").desc, col("doc_id")).limit(10)
    }),

    // Token-diversity (unbiased Simpson) concentration per document —
    // the no-libm entropy stand-in: exact rational ppm, one narrow
    // two-level aggregate (token counts → two moments), no count vector
    // materialized.
    "q144_token_diversity" -> ((s, dir) => {
      graft.operators.TextAnalysis.simpsonDiversity(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // The streaming MinHash near-dup operator on a batch frame: same
    // banded pair set as q31 (first-colliding-band emission is
    // output-invariant), so the stream state-machine code itself is
    // oracle-hash-checked — the q107 discipline applied to dedup.
    "q147_streaming_neardup_batch" -> ((s, dir) => {
      // quarter sample: the gate exercises the state-machine code path,
      // not throughput — batch-mode FMGWS pays object (de)serialization
      // the real banded join avoids, so don't bench it on the full corpus
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") % 4 === 0)
        .withColumn("ts", timestamp_seconds(col("doc_id")))
      graft.streaming.StreamingNearDup.pairs(docs, "ts", "doc_id", "text",
          minJaccard = 0.5)
        .toDF()
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Exact dedup by canonical text hash (hash-groupBy; one 16-byte-key
    // shuffle regardless of document size).
    "q30_exact_dedup" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("keep_id"))
    }),

    // MinHash(8 perms) + LSH(4 bands x 2 rows) candidates, exact-Jaccard
    // verified at >= 0.5. Candidate generation is an equi-join on band
    // hashes — never a cross join.
    "q31_minhash_neardup" -> ((s, dir) => {
      Dedup.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Incremental near-dup: 80% of the corpus is indexed once (bucketed
    // band/set tables), then the 20% delta is deduped against the index +
    // itself WITHOUT recomputing the base — the daily-crawl-increment
    // shape. Result == full recompute restricted to delta-touching pairs
    // (proven in IncrementalDedupSpec; the oracle is exactly that).
    "q74_incremental_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tbl = "incdedup_" + graft.queries.Q.cacheTag(dir)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") % 10 < 8),
        "doc_id", "text", tbl, nBuckets = 8)
      Dedup.incrementalNearDupPairs(docs.filter(col("doc_id") % 10 >= 8),
          "doc_id", "text", tbl, minJaccard = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // 64-bit term-frequency SimHash; near-dup pairs at Hamming <= 3 via
    // pigeonhole multi-block banding (exact recall, equi-join candidate
    // generation — no all-pairs stage anywhere in the plan).
    "q32_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairsBlocked(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Exact word-3-gram Jaccard within same-source blocks (blocking keeps
    // the pair space linear-ish; the quadratic blow-up is per block).
    "q33_same_source_jaccard" -> ((s, dir) => {
      Dedup.jaccardWithin(t(s, dir, "documents"), "doc_id", "text", "source",
          minJaccard = 0.3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Deterministic hash-based train/test split (training-pipeline staple):
    // portable md5 hash of the id -> stable 80/20 assignment on any engine.
    "q34_train_split" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      t(s, dir, "documents")
        .withColumn("split",
          when(hash32(col("doc_id").cast("string"), 9) % 100 < 80, "train")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang"))
    }),

    // Decontamination: test-split documents sharing >=2 winnowing-fingerprint
    // hashes with any train-split document (near-dup leakage across the
    // boundary). Fingerprint join is equi on 8-byte hashes — no pairwise scan.
    "q35_decontamination" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val docs = t(s, dir, "documents")
      val split = docs.select(col("doc_id"),
        (hash32(col("doc_id").cast("string"), 9) % 100 < 80).as("is_train"))
      val fp = TextAnalysis.fingerprints(docs, "doc_id", "text")
        .select(col("doc_id"), explode(col("fingerprint")).as("h"))
      val te = fp.join(split.filter(!col("is_train")), Seq("doc_id"))
        .select(col("doc_id").as("test_id"), col("h"))
      val tr = fp.join(split.filter(col("is_train")), Seq("doc_id"))
        .select(col("doc_id").as("train_id"), col("h"))
      te.join(tr, Seq("h"))
        .groupBy(col("test_id"), col("train_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("test_id"), col("train_id"))
    }),

    // Dataset-card statistics: per-language token-count distribution
    // (min / exact interpolated p50+p90 / max).
    "q36_token_distribution" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      t(s, dir, "documents")
        .select(col("lang"), size(tokens(col("text"))).as("nt"))
        .groupBy(col("lang"))
        .agg(
          min(col("nt")).cast("bigint").as("min_tokens"),
          round(expr("percentile(nt, 0.5)"), 4).as("p50_tokens"),
          round(expr("percentile(nt, 0.9)"), 4).as("p90_tokens"),
          max(col("nt")).cast("bigint").as("max_tokens"))
        .orderBy(col("lang"))
    }),

    // Transitive near-dup components: label-propagation components over the
    // LSH-verified pair graph (oracle: recursive-CTE min-reachability).
    "q38_neardup_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.nearDupGroups(Dedup.nearDupPairs(docs, "doc_id", "text"))
        .orderBy(col("doc_id"))
    }),

    // Canonical-document selection: per near-dup component keep the
    // HIGHEST-QUALITY member (not the arbitrary min-id) — the production
    // dedup stage when a quality signal exists. Composes the q38 component
    // labeling with the q41 quality score; singletons represent themselves.
    "q79_component_representatives" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = TextAnalysis.qualityScores(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_ppm"))
      Dedup.componentRepresentatives(docs, "doc_id", "text", q, "quality_ppm")
        .select(col("comp"), col("rep_id"),
          col("rep_score").as("rep_quality_ppm"), col("n_members"))
        .orderBy(col("comp"))
    }),

    // Capstone corpus-preparation pipeline: exact dedup -> near-dup
    // removal -> quality floor -> deterministic split, one pass.
    "q37_corpus_prepare" -> ((s, dir) => {
      graft.operators.Corpus.prepare(t(s, dir, "documents"))
        .select(col("doc_id"), col("split"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Frequency-vote language ID: train on doc_id % 5 != 0, predict the
    // held-out fifth. Integer per-million rates -> engine-exact argmax.
    "q40_lang_id" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.languageId(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", "lang")
        .orderBy(col("doc_id"))
    }),

    // Quality heuristics + composite score.
    "q41_quality_score" -> ((s, dir) => {
      TextAnalysis.qualityScores(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace, subword-ish segments, distinct.
    "q42_token_stats" -> ((s, dir) => {
      TextAnalysis.tokenStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Winnowing-style fingerprint: 5 smallest distinct 4-gram hashes,
    // exploded to (doc_id, rk, h) so every output cell is scalar.
    "q43_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprintRows(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Token-budget corpus mix: per source, the best 40% of its tokens by
    // quality, selected via quality-BIN thresholds (only the tiny bin
    // table sees a window — a per-doc cumulative sort would hand a
    // dominant source's whole corpus to one window task at 100 TB).
    "q83_token_budget_mix" -> ((s, dir) => {
      import graft.operators.Corpus
      val docs = t(s, dir, "documents")
      Corpus.tokenBudgetMix(docs, Corpus.proportionalBudgets(docs, pct = 40))
        .orderBy(col("source"), col("quality_ppm").desc, col("doc_id"))
    }),

    // Longest literally-shared token run per near-dup pair: candidate
    // pairs from MinHash banding (q31's pipeline), then a positions
    // equi-join + per-diagonal gaps-and-islands — all cost bounded by
    // candidates, windows partitioned per (pair, diagonal).
    "q84_shared_span" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.longestSharedSpan(docs,
          Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.5),
          "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Cross-source overlap matrix: distinct (source, 3-gram hash) set —
    // one shuffle on the 8-byte hash — self-joined per hash with fan-out
    // bounded by the SOURCE count, never documents. The "which dumps
    // share content" rollup of per-document decontamination.
    "q89_source_overlap" -> ((s, dir) => {
      Dedup.sourceOverlap(t(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Frequent token co-occurrence (market-basket shape): per-doc
    // distinct tokens self-join WITHIN the doc — per-doc cost is
    // distinct-token², bounded by vocabulary, never corpus² — then one
    // partial-aggregating shuffle on the pair key; support threshold by
    // integer cross-multiplication against the 1-row corpus count.
    "q106_token_cooccurrence" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val docs = t(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("w"))
      val total = docs.agg(count(lit(1)).as("n_total"))
      tok.as("a").join(tok.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(total))
        .filter(col("n_docs") * 5 >= col("n_total")) // support >= 20%
        .select(col("w1"), col("w2"), col("n_docs"))
        .orderBy(col("n_docs").desc, col("w1"), col("w2"))
    }),

    // Fuzzy decontamination: near-duplicate documents ACROSS the
    // train/test boundary by cross-corpus minhash banding — catches
    // paraphrased leakage q35's exact fingerprint overlap can miss.
    // Bands of each side meet in an equi-join; never test × train.
    "q102_fuzzy_decontaminate" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val docs = t(s, dir, "documents")
      val isTrain = hash32(col("doc_id").cast("string"), 9) % 100 < 80
      Dedup.crossNearDupPairs(
          docs.filter(!isTrain), docs.filter(isTrain),
          "doc_id", "text", minJaccard = 0.3)
        .select(col("id_a").as("test_id"), col("id_b").as("train_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("test_id"), col("train_id"))
    }),

    // KMV distinct-count estimate vs exact per source: the k smallest
    // portable hashes give (k-1)·2³²/h₍ₖ₎ — an approx_count_distinct the
    // oracle rebuilds bit-for-bit. The rank-k pass rewrites to a bounded
    // map-side aggregate (GroupedTopKRewrite), so the distinct-hash set
    // never sorts.
    "q94_kmv_distinct" -> ((s, dir) => {
      import graft.functions.TextFunctions.{tokens, shingles, hash32}
      import graft.operators.Sketch
      val shs = t(s, dir, "documents")
        .select(col("source"), tokens(col("text")).as("tok"))
        .select(col("source"), explode(shingles(col("tok"), 3)).as("sh"))
      val est = Sketch.kmvDistinct(shs, "sh", "source", k = 64)
      val ex = shs.select(col("source"), hash32(col("sh"), 0).as("h")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("exact_distinct"))
      est.join(ex, Seq("source")).orderBy(col("source"))
    }),

    // Count-min estimates vs exact for the top-20 shingles: the portable
    // md5-hashed sketch grid is rebuilt by the oracle bit-for-bit, so
    // the APPROXIMATE path itself is hash-checked (estimates overcount,
    // never undercount — asserted in SketchSpec).
    "q93_countmin_shingles" -> ((s, dir) => {
      import graft.functions.TextFunctions.{tokens, shingles}
      import graft.operators.Sketch
      val sh = t(s, dir, "documents")
        .select(tokens(col("text")).as("tok"))
        .select(explode(shingles(col("tok"), 3)).as("sh"))
      val grid = Sketch.countMin(sh, "sh", depth = 4, width = 256)
      val top = sh.groupBy(col("sh")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("sh").asc).limit(20)
      Sketch.estimate(grid, top, "sh", depth = 4, width = 256)
        .join(top, Seq("sh"))
        .select(col("sh"), col("exact"), col("cm_est"))
        .orderBy(col("exact").desc, col("sh").asc)
    }),

    // PII scrub: deterministic synthetic emails/phones/IPs are seeded into
    // a doc_id-keyed subset (the corpus itself is PII-free word salad),
    // then detected and redacted by the codegen'd regex pass. Zero-shuffle
    // scan-transform; the only exchange is the declared ORDER BY.
    "q109_pii_redaction" -> ((s, dir) => {
      val seeded = Scrub.seedSyntheticPii(t(s, dir, "documents"))
      Scrub.redactPii(seeded, "text")
        .filter(col("n_email") + col("n_phone") + col("n_ipv4") > 0)
        .select(col("doc_id"),
          col("n_email").cast("long").as("n_email"),
          col("n_phone").cast("long").as("n_phone"),
          col("n_ipv4").cast("long").as("n_ipv4"),
          md5(col("text_redacted")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Pairwise source-vocabulary overlap: Jaccard of the distinct-token
    // sets of every source pair — the corpus-comparison readout ("are
    // these two dumps the same register?") beside q89's doc-level
    // overlap and q180's language confusion. One distinct (source,
    // token) pass; the pair join is bounded by sources² per token,
    // never doc-pairs.
    "q239_source_vocab_overlap" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val sv = t(s, dir, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .distinct()
      val sizes = sv.groupBy(col("source")).agg(count(lit(1)).as("v"))
      sv.as("a").join(sv.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("source").as("s1"), col("v").as("v1"))), Seq("s1"))
        .join(broadcast(sizes.select(col("source").as("s2"), col("v").as("v2"))), Seq("s2"))
        .select(col("s1"), col("s2"), col("inter"),
          expr("inter * 1000000 div (v1 + v2 - inter)").as("jaccard_ppm"))
        .orderBy(col("jaccard_ppm").desc, col("s1"), col("s2"))
        .limit(25)
    }),

    // Token burstiness: variance-to-mean of per-doc counts across ALL
    // docs (zeros contribute via the 1-row N attach, never materialized)
    // — separates bursty topical words from Poisson-ish function words;
    // the overdispersion readout beside q144's within-doc diversity and
    // q162's corpus-wide Zipf shape.
    "q229_token_burstiness" -> ((s, dir) =>
      TextAnalysis.tokenBurstiness(t(s, dir, "documents"), "doc_id", "text",
        k = 20)),

    // Neyman-optimal annotation-budget allocation: split 10,000 human
    // eval labels across sources by N_h·σ_h of the quality score —
    // high-variance dumps earn labels, homogeneous ones don't; the
    // proportional allocation rides along as the baseline. The
    // sample-DESIGN step ahead of q47's stratified draw.
    "q228_neyman_alloc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("source"))
        .select(col("doc_id"), col("quality_ppm"), col("source"))
      graft.operators.Sampling.neymanAllocation(
          scored, "source", "quality_ppm", budget = 10000L)
        .orderBy(col("source"))
    }),

    // Differentially private release of per-source doc counts: the
    // geometric mechanism at ε = ln 2 (dyadic-exact inverse-CDF
    // thresholds on the portable hash — identical noise in any engine
    // for a fixed seed), negative results clamped. The stats-release
    // gate beside q133's k-anonymity and q223's leak report.
    "q227_dp_counts" -> ((s, dir) =>
      Scrub.dpNoisedCounts(t(s, dir, "documents"), "source", seed = 55)
        .orderBy(col("source"))),

    // PII leak rate by source: per-source totals of each detector's hits
    // and the share of documents touched — "which dump leaks emails" is
    // the first question a scrub report answers (q109 is the per-doc
    // transform; this is its governance rollup). One scan, one keyed
    // aggregate.
    "q223_pii_by_source" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val seeded = Scrub.seedSyntheticPii(docs)
      Scrub.redactPii(seeded, "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email").cast("long")).as("n_email"),
          sum(col("n_phone").cast("long")).as("n_phone"),
          sum(col("n_ipv4").cast("long")).as("n_ipv4"),
          sum(when(col("n_email") + col("n_phone") + col("n_ipv4") > 0, 1L)
            .otherwise(0L)).as("n_docs_touched"))
        .select(col("source"), col("n_docs"), col("n_email"), col("n_phone"),
          col("n_ipv4"), col("n_docs_touched"),
          expr("n_docs_touched * 1000000 div n_docs").as("touched_ppm"))
        .orderBy(col("source"))
    }),

    // BM25 top-15 retrieval for a fixed query (one rare term for idf
    // contrast). Narrow per-row tf/dl, ONE 1-row corpus-stats aggregate
    // broadcast back, TakeOrdered top-k — no token explode, no full sort.
    "q113_bm25_topk" -> ((s, dir) => {
      TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          queryTerms = bm25Terms, k = 15)
        .orderBy(col("score_ppm").desc, col("doc_id"))
    }),

    // TextRank keywords: 10 integer-ppm PageRank iterations over the
    // token-adjacency graph (vocabulary-sized — per-iteration joins
    // broadcast; one job total, no per-round convergence check).
    "q114_textrank_keywords" -> ((s, dir) => {
      TextAnalysis.textRankKeywords(t(s, dir, "documents"), "doc_id", "text",
          iters = 10, k = 10)
        .orderBy(col("rank_ppm").desc, col("term"))
    }),

    // Score evaluation: Mann-Whitney AUC of the quality score against
    // the lang=en label — pair counting over the per-distinct-score
    // class histogram (integer-exact ties), never a per-row rank.
    "q116_score_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("lang"))
        .select(col("doc_id"), col("quality_ppm"), (col("lang") === "en").as("y"))
      graft.operators.Evaluate.binaryAuc(scored, col("y"), "quality_ppm")
    }),

    // Calibration table for the same score/label: 10 fixed-width ppm
    // bins, observed positive rate per bin — nBins output rows from one
    // map-side-combined groupBy.
    "q117_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("lang"))
        .select(col("doc_id"), col("quality_ppm"), (col("lang") === "en").as("y"))
      graft.operators.Evaluate.calibrationBins(scored, col("y"),
          "quality_ppm", lo = 0L, hi = 1000000L, nBins = 10)
        .orderBy(col("bin"))
    }),

    // Chi-squared independence test source × lang: exact integer/decimal
    // cell algebra (zero cells handled algebraically), one corpus
    // groupBy, category-sized everything after.
    "q118_chi2_independence" -> ((s, dir) => {
      graft.operators.Evaluate.chiSquared(t(s, dir, "documents"),
        "source", "lang")
    }),

    // Kolmogorov-Smirnov separation of the quality score between
    // classes: max CDF gap via exact cross-multiplied cumulative counts
    // over the distinct-score histogram; at_score is the natural cut.
    "q119_ks_separation" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("lang"))
        .select(col("doc_id"), col("quality_ppm"), (col("lang") === "en").as("y"))
      graft.operators.Evaluate.ksStatistic(scored, col("y"), "quality_ppm")
    }),

    // Full precision/recall/F1 operating-point table: one row per
    // distinct score threshold, all counts from descending cumulative
    // sums over the histogram — the threshold-choice artifact.
    "q120_threshold_sweep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("lang"))
        .select(col("doc_id"), col("quality_ppm"), (col("lang") === "en").as("y"))
      graft.operators.Evaluate.thresholdSweep(scored, col("y"), "quality_ppm")
        .orderBy(col("threshold"))
    }),

    // Leakage-free train/test split: the q34 hash rule keyed on the
    // near-dup COMPONENT label instead of the doc id, so every member of
    // a near-dup cluster lands in the same split — the split that keeps
    // paraphrase leakage out of the held-out set by construction (the
    // cross-split near-dup pair count is structurally zero; asserted in
    // SamplingSpec). Costs the q38 component labeling plus one groupBy.
    "q125_component_split" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val docs = t(s, dir, "documents")
      val comps = Dedup.nearDupGroups(Dedup.nearDupPairs(docs, "doc_id", "text"))
      docs.select(col("doc_id"))
        .join(comps, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("keep_id"), col("doc_id")).as("comp"))
        .withColumn("split",
          when(hash32(col("comp").cast("string"), 9) % 100 < 80, "train")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("comp")).as("n_components"))
        .orderBy(col("split"))
    }),

    // BPE merge training: the first 10 tokenizer merge rules learned
    // from the corpus — one corpus pass builds the word-frequency table,
    // then 10 vocabulary-sized iterations (pair-count groupBy + 1-row
    // argmax broadcast back as a single replace). Engine-exact: integer
    // pair counts, binary-collated tie-breaks, shared replace semantics.
    "q126_bpe_merges" -> ((s, dir) => {
      TextAnalysis.bpeMerges(t(s, dir, "documents"), "doc_id", "text",
          nMerges = 10)
        .orderBy(col("step"))
    }),

    // Corpus encoded under the learned merges: per-doc subword count vs
    // token/char counts — the token-cost measurement. Rules apply to the
    // DISTINCT-word table (vocab-sized string work); docs pay one
    // (doc, word) count and an integer join back.
    "q127_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = TextAnalysis.bpeMerges(docs, "doc_id", "text", nMerges = 10)
      TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }),

    // Cumulative gain / lift table: descending-score deciles (whole
    // distinct-score groups, deterministic under ties), per-bin positive
    // capture vs the global rate — the targeting/threshold-budget chart.
    "q130_cumulative_gain" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("lang"))
        .select(col("doc_id"), col("quality_ppm"), (col("lang") === "en").as("y"))
      graft.operators.Evaluate.cumulativeGain(scored, col("y"),
          "quality_ppm", nBins = 10)
        .orderBy(col("bin"))
    }),

    // Cohen's kappa of the n-gram language-ID prediction against the
    // true labels on the q40 holdout — multi-class chance-corrected
    // agreement, exact decimal marginal algebra.
    "q121_lang_kappa" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pred = TextAnalysis.languageId(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", "lang")
        .select(col("doc_id"), col("pred_lang"))
      val joined = pred.join(
        docs.select(col("doc_id"), col("lang")), "doc_id")
      graft.operators.Evaluate.cohenKappa(joined, "pred_lang", "lang")
    }),

    // Held-out bigram-LM scoring (the CCNet/KenLM-style perplexity gate):
    // Laplace-smoothed p(w2|w1) trained on the q40 train split, holdout
    // docs scored by mean + min transition probability in integer ppm.
    "q131_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramLmScore(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Tokenizer fertility by language: subwords/word and chars/subword —
    // the multilingual tokenizer-efficiency audit (which languages pay
    // more sequence length per word under this segmentation).
    "q137_tokenizer_fertility" -> ((s, dir) => {
      TextAnalysis.tokenizerFertility(t(s, dir, "documents"), "text", "lang")
        .withColumnRenamed("grp", "lang")
        .orderBy(col("lang"))
    }),

    // DSIR-style importance weights: every document scored by how
    // target-like (here: English-doc token distribution) its hashed
    // unigram buckets are — the published importance-resampling recipe
    // for domain-targeted pretraining selection, in exact integer form.
    "q136_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.importanceWeights(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Prefix-filtered EXACT Jaccard self-join (AllPairs/PPJoin): every
    // pair with shingle-set Jaccard >= 0.6, candidates generated only
    // from rarest-first prefixes of length s - ceil(0.6 s) + 1 — exact
    // recall (spec-proven vs brute force) with no banding probability
    // and no all-pairs stage; the scale path for HIGH thresholds where
    // prefixes are short. Complements q31 (MinHash, probabilistic) and
    // q33 (per-block all-shingles).
    "q140_prefix_jaccard" -> ((s, dir) => {
      Dedup.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          tauNum = 3, tauDen = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Directed containment (A ⊂ B) — the asymmetric dup test: catches a
    // snippet quoted whole inside a larger document, where symmetric
    // Jaccard is diluted by the size gap and q31/q140 never fire.
    "q148_containment_pairs" -> ((s, dir) => {
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
          tauNum = 4, tauDen = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Cross-source quantile normalization of the q41 quality score: each
    // source's score distribution is remapped onto the pooled global
    // distribution, so one per-corpus threshold means the same thing for
    // every source. No global sort — the position table comes from
    // value-ordered buckets + broadcast offsets (q112's rank machinery).
    "q151_quantile_normalize" -> ((s, dir) => {
      import graft.operators.Normalize
      val docs = t(s, dir, "documents")
      // round 13: source rides qualityScores' single pass (carry)
      val scored = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("source"))
        .select(col("doc_id"), col("source"), col("quality_ppm"))
      Normalize.quantileNormalize(scored, "doc_id", "source", "quality_ppm")
        .orderBy(col("doc_id"))
    }),

    // Duplication-aware loss weights: 1e6/|near-dup component| ppm per
    // doc — each semantic unit contributes equal training mass however
    // many copies exist. The soft companion to q79's hard survivor pick.
    "q152_dedup_weights" -> ((s, dir) => {
      Dedup.dedupWeights(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Per-doc n-gram novelty in crawl order: ppm of distinct shingles
    // first seen HERE — the marginal-content trend an incremental crawl
    // watches. First-owner is a min aggregate on the shingle hash (the
    // TF-IDF df-table shape), never a window over posting lists.
    "q153_ngram_novelty" -> ((s, dir) => {
      TextAnalysis.ngramNovelty(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition quality rules (token-occurrence analogs of
    // the char-fraction originals): top-unigram / top-bigram shares and
    // the duplicated-trigram share, with the combined pass verdict —
    // the repetition leg of the classic pre-training quality filter.
    "q241_repetition_rules" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Duplicated-span coverage per doc (exact substring-dedup readout,
    // Lee et al.): tokens inside word-8-grams shared with >= 2 distinct
    // docs, merged into maximal spans — the mass span-level dedup would
    // excise, where q30/q31 only score whole documents.
    "q242_repeated_spans" -> ((s, dir) => {
      Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
          k = 8, minDocs = 2)
        .orderBy(col("doc_id"))
    }),

    // Span EXCISION (the transform after q242's report): duplicated
    // spans removed, surviving tokens re-assembled in order — doc rows
    // preserved even when fully excised.
    "q244_span_excision" -> ((s, dir) => {
      Dedup.exciseRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
          k = 8, minDocs = 2)
        .orderBy(col("doc_id"))
    }),

    // Per-doc Shannon token entropy in fixed-point bits (q144's Simpson
    // diversity was the documented no-libm stand-in; the int64 log2
    // makes the real metric portable).
    "q250_token_entropy" -> ((s, dir) => {
      TextAnalysis.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Per-source distribution drift: KL(source || corpus) over unigram
    // rates in fixed-point log2 units — the ingest-mix monitor; exact
    // integer arithmetic end to end, so the oracle hash-checks it.
    "q249_source_drift" -> ((s, dir) => {
      graft.operators.Corpus.sourceDrift(t(s, dir, "documents"))
        .orderBy(col("source"))
    }),

    // CCNet-style LM quality filter (Wenzek et al. 2020): bigram
    // cross-entropy of the held-out 20% under an add-one bigram LM
    // trained on the other 80%, in fixed-point log2 units — the
    // perplexity-bucketing statistic, engine-exact via FixedPoint.
    "q248_lm_surprisal" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.lmSurprisal(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // DoReMi-style domain-mixture weights (Xie et al. 2023): the
    // exponentiated-gradient reweighting step over per-domain losses —
    // each source's held-out fold scored under the uniform-mixture
    // reference LM (q248's machinery), token-weighted mean loss in
    // fixed-point bits, min-shifted excess, w ∝ 2^(η·excess) via the
    // int64 exp2 primitive, ppm-normalized, smoothed toward uniform.
    // The fourth data-selection leg (q247 DSIR, q248/q255 CCNet, q254
    // GPT-3 filter) — and the whole chain, exp2 included, is replayed
    // bit-exactly by the oracle.
    "q260_domain_mix_weights" -> ((s, dir) => {
      graft.operators.Corpus.domainMixFromSurprisal(t(s, dir, "documents"))
        .orderBy(col("domain"))
    }),

    // The DoReMi loop COMPOSED (the full Xie et al. recipe): round 1 =
    // q260's exponentiated-gradient step under the uniform-mixture LM;
    // its weights set per-domain keep rates, a portable-hash Bernoulli
    // resamples the training mix, the LM RETRAINS on the resampled mix
    // and the step runs again. One row per (round, domain); the whole
    // two-round trajectory — both LM trainings included — is replayed
    // bit-exactly by the oracle.
    "q262_doremi_loop" -> ((s, dir) => {
      graft.operators.Corpus.doremiLoop(t(s, dir, "documents"), rounds = 2,
          seed = 18)
        .orderBy(col("round"), col("domain"))
    }),

    // RHO-LOSS data selection (Mindermann et al. 2022): per-candidate
    // reducible holdout loss — bits under the training-fold LM minus
    // bits under the disjoint holdout-fold LM — selecting the positive
    // tail (learnable, worth learning, not yet learnt). The fifth
    // data-selection leg; both surprisal chains and the verdict are
    // replayed bit-exactly by the oracle.
    "q261_rholoss_selection" -> ((s, dir) => {
      graft.operators.Corpus.rhoLossScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    // CCNet's head/middle/tail perplexity partition (Wenzek et al.
    // 2020 §4.3): every doc scored under the 80%-split bigram LM
    // (q248's machinery), then bucketed into thirds by WHOLE-BIN
    // boundary cuts over a bounded histogram — the mixing verdict
    // downstream samplers consume, with no document-level global sort.
    "q255_perplexity_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.perplexityBuckets(
          docs, docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // DSIR importance-resampling scores (Xie et al. 2023): hashed
    // unigram+bigram features, log-likelihood-ratio bucket weights via
    // the pure-int64 fixed-point log2 (engine-exact — no libm), per-doc
    // importance scores and the whole-bin top-20% selection. Target
    // "domain" = the doc_id % 7 == 0 slice; raw = the rest.
    "q247_dsir_scores" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Corpus.dsirScores(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          nBuckets = 4096, seed = 11, selectPct = 20)
        .orderBy(col("doc_id"))
    }),

    // GPT-3-style discriminative quality classifier (Brown et al. 2020
    // §A): linear scores over DSIR's hashed unigram+bigram buckets,
    // trained target-vs-raw by the batch perceptron — pure-integer
    // updates, so the ENTIRE training run (4 steps) is replayed by the
    // oracle as unrolled CTEs and the final margins hash-match. The
    // third data-selection leg next to q247 (generative LLR) and q248
    // (LM perplexity).
    "q254_quality_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Corpus.qualityPerceptron(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          nBuckets = 4096, seed = 11, steps = 4)
        .orderBy(col("doc_id"))
    }),

    // Held-out evaluation of the q254 filter — the GPT-3 acceptance test
    // is the classifier's RANKING power on documents the trainer never
    // saw, not its training margins: train on the doc_id % 3 != 0 fold
    // (target = % 7 == 0 within it), score the held-out third with the
    // streaming-legal scorer, Mann-Whitney AUC vs the true label. One
    // integer-exact summary row, hash-gated like q116. On this fixture
    // the reading is ~0.43 ≈ chance — CORRECT, not a defect: the % 7
    // label is content-independent by construction, so q254's clean
    // training margins are memorization and a held-out AUC near 0.5 is
    // exactly what an honest evaluation must report (the q254 scaladoc
    // cross-references this). What the gate certifies is the
    // train/score/evaluate split machinery, end to end; q259 runs the
    // same machinery on a CONTENT-derived label and is the ranking-power
    // acceptance number (AUC ≈ 0.99).
    "q257_classifier_heldout_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val w = graft.operators.Corpus.qualityPerceptronWeights(
        train.filter(col("doc_id") % 7 =!= 0),
        train.filter(col("doc_id") % 7 === 0),
        nBuckets = 4096, seed = 11, steps = 4)
      val held = docs.filter(col("doc_id") % 3 === 0)
      val scored = graft.operators.Corpus.perceptronScore(held, w)
        .join(held.select(col("doc_id"), (col("doc_id") % 7 === 0).as("y")),
          "doc_id")
      graft.operators.Evaluate.binaryAuc(scored, col("y"), "score")
    }),

    // q257's companion with a CONTENT-DERIVED label: the same train/
    // score/evaluate machinery, but the target is q41's quality band
    // (quality_ppm >= 700000 — the corpus median, so the classes are
    // balanced) instead of the content-independent doc_id % 7 fold.
    // Where q257's ≈0.5 AUC certifies the machinery (its label is
    // unlearnable by construction), THIS is the classifier's acceptance
    // number — the GPT-3 §A filter judged by ranking power on documents
    // the trainer never saw: hashed unigram+bigram features demonstrably
    // recover a length/stopword/token-shape label at AUC ≈ 0.99,
    // hash-gated end to end (the oracle replays training, scoring, the
    // label derivation AND the AUC).
    "q259_classifier_content_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lab = TextAnalysis.qualityScores(docs, "doc_id", "text")
        .select(col("doc_id"), (col("quality_ppm") >= 700000L).as("y"))
      val train = docs.join(lab, Seq("doc_id"))
        .filter(col("doc_id") % 3 =!= 0)
      val w = graft.operators.Corpus.qualityPerceptronWeights(
        train.filter(!col("y")), train.filter(col("y")),
        nBuckets = 4096, seed = 11, steps = 4)
      val held = docs.filter(col("doc_id") % 3 === 0)
      val scored = graft.operators.Corpus.perceptronScore(held, w)
        .join(lab, Seq("doc_id"))
      graft.operators.Evaluate.binaryAuc(scored, col("y"), "score")
    }),

    // Keep-one span excision (Lee et al. ExactSubstr semantics at the
    // gram grain): each duplicated 8-gram's lowest-id holder keeps its
    // occurrences, every other copy is excised — the corpus retains one
    // canonical copy of the content where q244 removes all of them.
    "q245_span_excision_keepone" -> ((s, dir) => {
      Dedup.exciseRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
          k = 8, minDocs = 2, keepOne = true)
        .orderBy(col("doc_id"))
    }),

    // Span-level decontamination (GPT-3/PaLM style): per training doc,
    // the maximal spans whose 8-grams collide with the held-out 20%
    // (q34's hash split), as span count / token mass / ppm — the excise
    // report behind q35's doc-level verdict.
    "q243_span_decontamination" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val docs = t(s, dir, "documents")
      val isTrain = hash32(col("doc_id").cast("string"), 9) % 100 < 80
      graft.operators.Decontaminate.spanContamination(
          docs.filter(isTrain), docs.filter(!isTrain), "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))
    }),

    // Decontamination EXCISION (the transform behind q243's report):
    // every training span colliding with the held-out 20% removed,
    // survivors re-assembled — the strict GPT-3/PaLM posture where any
    // surviving copy still leaks eval content into training.
    "q251_decontam_excision" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val docs = t(s, dir, "documents")
      val isTrain = hash32(col("doc_id").cast("string"), 9) % 100 < 80
      graft.operators.Decontaminate.exciseContaminatedSpans(
          docs.filter(isTrain), docs.filter(!isTrain), "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))
    }),

    // Keep-one decontamination excision: q245's canonical-copy policy
    // pointed at the eval collision set — each colliding 8-gram's
    // lowest-id training holder keeps its occurrences (the boilerplate-
    // collision case: licenses, famous quotes), every other copy is
    // excised.
    "q252_decontam_excision_keepone" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val docs = t(s, dir, "documents")
      val isTrain = hash32(col("doc_id").cast("string"), 9) % 100 < 80
      graft.operators.Decontaminate.exciseContaminatedSpans(
          docs.filter(isTrain), docs.filter(!isTrain), "doc_id", "text",
          n = 8, keepOne = true)
        .orderBy(col("doc_id"))
    }),

    // Round-5 curation capstone: exact-dedup winners, near-dup losers
    // and containment-dominated docs dropped, component loss weights,
    // quality cut on the cross-source quantile-normalized score, split
    // keyed on the component label. Every stage is the declared operator
    // behind q30/q31/q148/q152/q151/q125, composed.
    "q161_corpus_curate" -> ((s, dir) => {
      graft.operators.Corpus.curate(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    // 2D corpus map: fixed-bin (length × quality) occupancy grid — the
    // joint distribution a marginal histogram hides; cells merge across
    // shards/days by addition. All-integer, no stats pass.
    "q156_quality_length_grid" -> ((s, dir) => {
      import graft.operators.Histogram
      val docs = t(s, dir, "documents")
      val f = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("n_chars"))
        .select(col("doc_id"), col("n_chars"), col("quality_ppm"))
      Histogram.grid2d(f, "n_chars", 500L, 19, "quality_ppm", 100000L, 9)
        .orderBy(col("xb"), col("yb"))
    }),

    // Zipf/head-heaviness audit: vocab size, token mass, top-1 token
    // share, and the distinct-token counts covering 50/90/99% of all
    // occurrences. Corpus-sized work is one groupBy(token); the ordered
    // window runs over the vocabulary only.
    "q162_zipf_coverage" -> ((s, dir) =>
      TextAnalysis.zipfCoverage(t(s, dir, "documents"), "text")),

    // Exact heavy hitters (freq > N/200), two-pass: a Misra-Gries
    // TypedImperativeAggregate (199 counters, bounded map-side state,
    // guaranteed-superset candidates) + an exact broadcast recount of the
    // <= 199 candidates. The intermediate sketch is merge-order-dependent;
    // the recount makes the declared output exact and deterministic.
    "q163_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(t(s, dir, "documents"), "text", k = 200)
        .orderBy(col("cnt").desc, col("w"))),

    // Per-source token-budget curation: spend 30% of each source's token
    // mass on its quality-ranked best documents — integer boundary test,
    // one shuffle on the source key.
    "q164_budget_select" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val docs = t(s, dir, "documents")
      val base = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("quality_ppm"))
      graft.operators.Sampling.budgetSelect(base, "doc_id", "source",
          "n_tokens", "quality_ppm", budgetNum = 3, budgetDen = 10)
        .select(col("source"), col("doc_id"), col("quality_ppm"),
          col("n_tokens"), col("cum_weight"))
        .orderBy(col("source"), col("cum_weight"))
    }),

    // Phrase search driven by the corpus's own most frequent trigram
    // (ties -> lexicographically last): every document containing it,
    // with occurrence counts — the positional-retrieval primitive beside
    // q113's BM25 term ranking.
    "q165_phrase_hits" -> ((s, dir) =>
      TextAnalysis.phraseHits(t(s, dir, "documents"), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))),

    // Spearman rank correlation (tie-corrected, average ranks) between
    // document length and quality score — the monotone-association
    // companion to q110's Pearson matrix, built from distinct-value count
    // tables instead of a per-row global rank window.
    "q166_spearman_rank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val f = TextAnalysis.qualityScores(docs, "doc_id", "text",
          Seq("n_chars"))
        .select(col("doc_id"), col("n_chars"), col("quality_ppm"))
      graft.operators.Evaluate.spearman(f, "n_chars", "quality_ppm")
    }),

    // Dataset-card manifest: one governance row per source — doc/token
    // mass, language spread, mean quality, exact median length, and an
    // order-invariant content checksum (q129's discipline, per group).
    "q168_source_manifest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.{tokens, hash32}
      val docs = t(s, dir, "documents")
      val base = docs
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          size(tokens(col("text"))).cast("bigint").as("n_tokens"),
          hash32(concat_ws("\u001f", col("doc_id").cast("string"), col("text")), 7)
            .as("h"))
        .join(TextAnalysis.qualityScores(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality_ppm")), Seq("doc_id"))
      val byLen = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      val all = Window.partitionBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      base
        .withColumn("rn", row_number().over(byLen))
        .withColumn("cnt", count(lit(1)).over(all))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          expr("sum(quality_ppm) div count(1)").as("mean_quality_ppm"),
          min(when(col("rn") * 2 >= col("cnt"), col("n_chars"))).as("p50_chars"),
          sum(col("h").cast("decimal(38,0)")).cast("bigint").as("checksum"))
        .orderBy(col("source"))
    }),

    // Language-ID confusion matrix: q40's frequency-vote predictions
    // against the stored labels, one row per (true, predicted) pair with
    // the row-normalized ppm rate — WHERE the classifier fails, not just
    // how often (the per-pair view q121's single kappa collapses).
    "q180_lang_confusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val preds = TextAnalysis.languageId(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
      preds
        .join(docs.select(col("doc_id"), col("lang").as("true_lang")),
          Seq("doc_id"))
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("_tot",
          sum(col("n")).over(Window.partitionBy(col("true_lang"))))
        .select(col("true_lang"), col("pred_lang"), col("n"),
          expr("n * 1000000 div _tot").as("rate_ppm"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }),

    // Exactly-k-per-group deterministic sample: rank every doc inside its
    // source by portable hash (uniform, rerun-stable) and keep the first
    // 5 — the equal-allocation stratified draw q47's fraction rule can't
    // guarantee. The rank filter is the GroupedTopKRewrite shape, so the
    // per-group sort is a bounded map-side top-k, not a full window sort.
    "q181_exact_k_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.hash32
      val w = Window.partitionBy(col("source"))
        .orderBy(hash32(col("doc_id").cast("string"), 13), col("doc_id"))
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("source"), col("doc_id"), col("rn").cast("bigint").as("rn"))
        .orderBy(col("source"), col("rn"))
    }),

    // 3-gram frequency-of-frequency spectrum (Good-Turing counts): how
    // many distinct word-3-grams occur exactly k times (k ≤ 10, tail
    // pooled) — the vocabulary-growth statistic behind smoothing
    // estimates and dedup-threshold sizing (the singleton count IS the
    // novel-content mass). Two bounded groupBys; nothing after the first
    // is corpus-sized.
    "q182_token_spectrum" -> ((s, dir) => {
      import graft.functions.TextFunctions.{tokens, shingles}
      t(s, dir, "documents")
        .select(tokens(col("text")).as("tok"))
        .select(explode(shingles(col("tok"), 3)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .groupBy(when(col("cnt") <= 10, col("cnt")).otherwise(11L).as("k"))
        .agg(count(lit(1)).as("n_grams_with_k"),
          sum(col("cnt")).as("mass"))
        .orderBy(col("k"))
    }),

    // Near-dup component size distribution: how big do dup clusters get
    // (the long-tail view q152's per-doc weights and q38's labels imply
    // but never show) — one row per cluster size with cluster counts and
    // total docs bound up in them.
    "q185_component_size_dist" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.nearDupGroups(Dedup.nearDupPairs(docs, "doc_id", "text"))
        .groupBy(col("keep_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_components"),
          sum(col("sz")).as("n_docs"))
        .orderBy(col("sz"))
    }),

    // Near-dup provenance audit: q31's verified pair set classified by
    // whether the two docs share a source / a language — syndication vs
    // in-source duplication vs cross-lingual label noise, one row per
    // combination.
    "q170_dup_provenance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, minJaccard = 0.5)
      val dims = docs.select(col("doc_id"), col("source"), col("lang"))
      pairs
        .join(dims.select(col("doc_id").as("id_a"), col("source").as("src_a"),
          col("lang").as("lang_a")), Seq("id_a"))
        .join(dims.select(col("doc_id").as("id_b"), col("source").as("src_b"),
          col("lang").as("lang_b")), Seq("id_b"))
        .groupBy((col("src_a") === col("src_b")).as("same_source"),
          (col("lang_a") === col("lang_b")).as("same_lang"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("same_source"), col("same_lang"))
    }),
  )

  private val bm25Terms = Seq("dup", "spark", "vector", "merge")

  /** q113's BM25 scoring chain (same ppm fixed-point formula as
    * TextAnalysis.bm25TopK; DuckDB's `//` is floor division == Spark
    * `div` on the all-positive operands), ending in `sc(doc_id, dl,
    * score_ppm)` with `d` carrying per-term counts f0..fN. Shared by the
    * q113 ranking and the q204 fusion oracle. */
  private lazy val bm25ScoredCtes: String = {
    val fCols = bm25Terms.zipWithIndex.map { case (term, i) =>
      s"len(list_filter(tok, x -> x = '$term')) AS f$i"
    }.mkString(",\n  ")
    val dfCols = bm25Terms.indices.map(i =>
      s"sum(CASE WHEN f$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val scoreTerms = bm25Terms.indices.map(i =>
      s"""CASE WHEN f$i > 0 THEN
         |  (((n_docs * 1000000) // df$i) *
         |   ((f$i * (1000000 + 1200000) * 1000000) //
         |    (f$i * 1000000 + (1200000 * norm_ppm) // 1000000))) // 1000000
         |  ELSE 0 END""".stripMargin).mkString(" +\n")
    s"""d AS (SELECT doc_id, len(tok) AS dl,
       |  $fCols
       |FROM t),
       |s AS (SELECT count(*) AS n_docs, sum(dl) AS tot, $dfCols FROM d),
       |n AS (SELECT d.*, s.*,
       |  (dl * 1000000 * 1000000) // ((tot * 1000000) // n_docs) AS len_ppm
       |FROM d CROSS JOIN s),
       |m AS (SELECT *,
       |  1000000 - 750000 + (750000 * len_ppm) // 1000000 AS norm_ppm FROM n),
       |sc AS (SELECT doc_id, dl,
       |  $scoreTerms AS score_ppm
       |FROM m)""".stripMargin
  }

  // ---- shared SQL fragments -------------------------------------------

  private val normSql = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private val tokCte = s"t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents)"

  /** q41's quality-score chain ending in the (sc, y) per-doc table the
    * evaluation oracles (q119/q120) consume: score ppm + lang=en label. */
  private val scoredCte =
    s"""$tokCte,
       |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
       |g AS (SELECT doc_id, count(*) AS n_tokens,
       |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
       |        CAST(sum(length(w)) AS BIGINT) AS sum_len
       |      FROM tk GROUP BY doc_id),
       |p AS (SELECT doc_id,
       |        (n_stop * 1000000) // n_tokens AS stop_ppm,
       |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
       |        least(n_tokens * 10000, 1000000) AS tok_ppm
       |      FROM g),
       |q AS (SELECT doc_id,
       |        (tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10 AS sc
       |      FROM p),
       |s AS (SELECT sc, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |      FROM q JOIN documents d USING (doc_id))""".stripMargin

  /** BPE training oracle chain (no WITH prefix): word-frequency table,
    * double-space segmentations, ten unrolled pair-count → argmax (b1..
    * b10) → replace (w1..w10) steps. Shared by q126 (the rules) and
    * q127 (the corpus encoded under them). */
  private lazy val bpeRuleCtes: String = {
    val stepCtes = (1 to 10).map { k =>
      s"""px$k AS (SELECT string_split(trim(seg), '  ') AS sym, freq FROM w${k - 1}),
         |pu$k AS (SELECT sym, freq, unnest(range(1, len(sym))) AS i FROM px$k),
         |pc$k AS (SELECT sym[i] AS a, sym[i+1] AS b, sum(freq) AS cnt
         |         FROM pu$k GROUP BY 1, 2),
         |b$k AS (SELECT a, b, cnt FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
         |w$k AS (SELECT replace(seg, ' '||a||'  '||b||' ', ' '||a||b||' ') AS seg,
         |        freq FROM w${k - 1} CROSS JOIN b$k)""".stripMargin
    }.mkString(",\n")
    s"""$tokCte,
       |wf AS (SELECT w, count(*) AS freq
       |       FROM (SELECT unnest(tok) AS w FROM t) GROUP BY w),
       |w0 AS (SELECT ' ' || array_to_string(regexp_extract_all(w, '.'), '  ') || ' ' AS seg, freq FROM wf),
       |$stepCtes""".stripMargin
  }

  /** q38's MinHash-banding + Jaccard-verify + recursive-reachability
    * chain, ending in `comp0(doc_id, keep_id)` — the per-doc component
    * label for every doc that appears in a near-dup pair. Shared by the
    * q38 components oracle and the q125 component-split oracle. */
  private lazy val componentsCtes: String = {
    val sigCols = (0 until 8)
      .map(i => s"min(${graft.functions.TextFunctions.minhashPermSql(h32("s", 0), i)}) AS sig$i")
      .mkString(",\n  ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
    }.mkString("\n UNION ALL ")
    s"""WITH RECURSIVE $tokCte,
       |${shingleCte(3)},
       |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
       |band AS ($bandRows),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
       |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
       |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS ni
       |          FROM cand JOIN dsh a ON a.doc_id = id_a
       |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
       |          GROUP BY id_a, id_b),
       |p AS (SELECT id_a, id_b FROM inter
       |  JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
       |  WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.5),
       |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(n, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n),
       |comp0 AS (SELECT n AS doc_id, min(r) AS keep_id FROM reach GROUP BY n)""".stripMargin
  }

  private def shingleCte(n: Int): String = {
    val parts = (0 until n).map(j => if (j == 0) "tok[i]" else s"tok[i+$j]").mkString(" || ' ' || ")
    s"""sh AS (SELECT doc_id, unnest(CASE WHEN len(tok) >= $n THEN
       |  list_transform(range(1, len(tok) - ${n - 2}), i -> $parts) ELSE [] END) AS s FROM t)""".stripMargin
  }

  /** shingleCte with 0-based start positions (zipped unnest +
    * generate_subscripts — the q221 idiom), mirroring Spark's
    * posexplode(shingles(tok, n)). */
  private def posShingleCte(n: Int): String = {
    val parts = (0 until n).map(j => if (j == 0) "tok[i]" else s"tok[i+$j]").mkString(" || ' ' || ")
    s"""shp AS (SELECT doc_id, unnest(shl) AS s,
       |    generate_subscripts(shl, 1) - 1 AS pos
       |  FROM (SELECT doc_id, CASE WHEN len(tok) >= $n THEN
       |    list_transform(range(1, len(tok) - ${n - 2}), i -> $parts)
       |    ELSE [] END AS shl FROM t))""".stripMargin
  }

  /** Unrolled batch-perceptron training CTEs (shared by q254/q257, over
    * the caller's `t` token CTE): `g` = unigram+bigram grams of EVERY
    * document, `feat` = per-(doc, y) bucketed counts restricted to
    * `foldWhere`'s training fold, `w1..w4` = the four training steps
    * (step 1 is the all-mistakes shortcut — w = 0 makes every margin
    * non-positive; mistakes keyed on (doc_id, y) exactly as the
    * trainer's margin window, so the CTEs mirror the operator for ANY
    * labeling, not just the disjoint doc_id % 7 split). */
  private def perceptronCtesWhere(foldWhere: String,
      ySql: String = "CASE WHEN doc_id % 7 = 0 THEN 1 ELSE -1 END",
      featSrc: String = "g"): String = {
    def step(t: Int): String =
      s"""m$t AS (SELECT doc_id, y, CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS m
         |  FROM feat LEFT JOIN w${t - 1} USING (b) GROUP BY doc_id, y),
         |d$t AS (SELECT b, CAST(sum(y * c) AS BIGINT) AS dw FROM feat
         |  JOIN (SELECT doc_id, y FROM m$t WHERE y * m <= 0)
         |    USING (doc_id, y)
         |  GROUP BY b),
         |w$t AS (SELECT coalesce(a.b, dd.b) AS b,
         |    coalesce(a.w, 0) + coalesce(dd.dw, 0) AS w
         |  FROM w${t - 1} a FULL OUTER JOIN d$t dd ON a.b = dd.b)""".stripMargin
    s"""g AS (SELECT doc_id, unnest(tok) AS g FROM t
       |      UNION ALL
       |      SELECT doc_id, unnest(list_transform(range(1, len(tok)),
       |        i -> tok[i] || ' ' || tok[i + 1])) AS g FROM t),
       |feat AS (SELECT doc_id,
       |    $ySql AS y,
       |    ${h32("g", 11)} % 4096 AS b, CAST(count(*) AS BIGINT) AS c
       |  FROM $featSrc $foldWhere GROUP BY 1, 2, 3),
       |w1 AS (SELECT b, CAST(sum(y * c) AS BIGINT) AS w FROM feat GROUP BY b),
       |${step(2)},
       |${step(3)},
       |${step(4)}""".stripMargin
  }

  /** q41's quality chain reduced to a ±1 label CTE `lab(doc_id, y)` —
    * the content-derived target for q259 (y = +1 iff quality_ppm >=
    * `thresholdPpm`; 700000 ≈ the corpus median, balanced classes).
    * CTE names are q-prefixed to stay clear of the perceptron's `g`. */
  private def qualityLabelCte(thresholdPpm: Long): String =
    s"""qtk AS (SELECT doc_id, unnest(tok) AS w FROM t),
       |qg AS (SELECT doc_id, count(*) AS n_tokens,
       |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
       |        CAST(sum(length(w)) AS BIGINT) AS sum_len
       |      FROM qtk GROUP BY doc_id),
       |qp AS (SELECT doc_id,
       |        (n_stop * 1000000) // n_tokens AS stop_ppm,
       |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
       |        least(n_tokens * 10000, 1000000) AS tok_ppm
       |      FROM qg),
       |lab AS (SELECT doc_id,
       |        CASE WHEN (tok_ppm * 3 + (1000000 - stop_ppm) * 4
       |                   + len_ppm * 3) // 10 >= $thresholdPpm
       |             THEN 1 ELSE -1 END AS y FROM qp)""".stripMargin

  private lazy val perceptronCtes: String = perceptronCtesWhere("")

  /** q248's held-out bigram-LM surprisal chain (over the caller's `t`
    * token CTE), ending in per-doc `sc(doc_id, n_bigrams, bits_fp)` —
    * shared by q248 and the q260 domain-mixture rollup. LM trained on
    * the doc_id % 5 != 0 fold; scoring restricted to the held-out
    * % 5 == 0 fold; add-one ppb conditional, FixedPoint log2 surprisal
    * (1959352 = log2fp(1e9)), per-doc mean via integer div. */
  /** The shared per-doc bigram explode the surprisal chains read. */
  private val bgCte: String =
    """bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tok)),
      |        i -> tok[i] || ' ' || tok[i + 1])) AS bg FROM t)""".stripMargin

  /** One bigram-LM surprisal chain over `bg`: LM trained where
    * `trainWhere` holds, the `poolWhere` fold scored (default: q248's
    * % 5 == 0 held-out fold; reference `b.` for the bigram row), CTE
    * names prefixed with `p` so differently-trained chains (q261/q262)
    * can coexist. With p = "" and the % 5 != 0 fold this is exactly
    * q248's chain. The greatest(.., 1) floor mirrors the Spark side's
    * empty-LM guard (v = 0 would divide by zero; any non-empty LM has
    * v >= 1 and the floor is a bit-exact no-op). */
  private def lmChainCtes(trainWhere: String, p: String,
      poolWhere: String = "b.doc_id % 5 = 0"): String = {
    import graft.functions.FixedPoint.log2FpDuckSql
    s"""${p}lb AS (SELECT bg, count(*) AS c12 FROM bg WHERE $trainWhere GROUP BY bg),
       |${p}lp AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM ${p}lb GROUP BY 1),
       |${p}vs AS (SELECT count(DISTINCT w) AS v FROM (
       |        SELECT unnest(tok) AS w FROM t WHERE $trainWhere)),
       |${p}sur AS (SELECT doc_id,
       |          1959352 - ${log2FpDuckSql("p_ppb")} AS sur
       |        FROM (SELECT b.doc_id,
       |                (coalesce(c12, 0) + 1) * 1000000000
       |                  // greatest(coalesce(c1, 0) + v, 1) AS p_ppb
       |              FROM bg b LEFT JOIN ${p}lb USING (bg)
       |              LEFT JOIN ${p}lp ON ${p}lp.w1 = split_part(b.bg, ' ', 1)
       |              CROSS JOIN ${p}vs
       |              WHERE $poolWhere)),
       |${p}sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |         sum(sur) // count(*) AS bits_fp
       |       FROM ${p}sur GROUP BY doc_id)""".stripMargin
  }

  private lazy val lmSurprisalCtes: String =
    s"$bgCte,\n${lmChainCtes("doc_id % 5 <> 0", "")}"

  /** Mirrors Corpus.domainMixWeights over a surprisal chain's per-doc
    * `sc(doc_id, n_bigrams, bits_fp)` CTE: per-source token-weighted
    * int64 mean loss, min-shifted excess, η = 1 exponent capped at 20
    * bits, FixedPoint exp2 (DuckDB spelling), ppm normalization, the
    * c = 1000 ppm uniform smoothing — every step integer. HUGEINT sums
    * are cast back to BIGINT before the fixed-point ops (their
    * contract). Ends in `${p}w(domain, mass, loss_fp, excess_fp,
    * weight_ppm, smoothed_ppm)`; CTE names prefixed so the q262 loop
    * can run the chain once per round. */
  private def mixWeightCtes(sc: String, p: String): String = {
    import graft.functions.FixedPoint.exp2FpDuckSql
    s"""${p}dl AS (SELECT source AS domain,
       |         CAST(sum(n_bigrams) AS BIGINT) AS mass,
       |         CAST(CAST(sum(bits_fp * n_bigrams) AS BIGINT)
       |           // sum(n_bigrams) AS BIGINT) AS loss_fp
       |       FROM $sc JOIN documents USING (doc_id)
       |       GROUP BY source HAVING sum(n_bigrams) > 0),
       |${p}ex AS (SELECT domain, mass, loss_fp,
       |         loss_fp - (SELECT min(loss_fp) FROM ${p}dl) AS excess_fp
       |       FROM ${p}dl),
       |${p}sx AS (SELECT domain, mass, loss_fp, excess_fp,
       |         least((excess_fp * 1) // 1, 1310720) AS es FROM ${p}ex),
       |${p}rw AS (SELECT domain, mass, loss_fp, excess_fp,
       |         ${exp2FpDuckSql("es")} AS raw FROM ${p}sx),
       |${p}nm AS (SELECT domain, mass, loss_fp, excess_fp,
       |         CAST((raw * 1000000) // (SELECT CAST(sum(raw) AS BIGINT)
       |           FROM ${p}rw) AS BIGINT) AS weight_ppm
       |       FROM ${p}rw),
       |${p}w AS (SELECT domain, mass, loss_fp, excess_fp, weight_ppm,
       |         CAST(((1000000 - 1000) * weight_ppm) // 1000000
       |           + 1000 // (SELECT count(*) FROM ${p}rw) AS BIGINT)
       |           AS smoothed_ppm
       |       FROM ${p}nm)""".stripMargin
  }

  /** Mirrors Dedup.spanCoverage: duplicated k-gram start positions in
    * `dp(doc_id, pos)` → maximal interval-union spans → per-doc
    * `pd(doc_id, n_spans, dup_tokens)`. New span when the gap exceeds k;
    * union length = last − first + k. */
  private def spanRollupSql(k: Int): String =
    s"""il AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER (
       |    PARTITION BY doc_id ORDER BY pos) > $k THEN 1 ELSE 0 END AS ni
       |  FROM dp),
       |i2 AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl FROM il),
       |spn AS (SELECT doc_id, isl, min(pos) AS fp, max(pos) + ${k - 1} AS lp
       |  FROM i2 GROUP BY doc_id, isl),
       |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |    CAST(sum(lp - fp + 1) AS BIGINT) AS dup_tokens
       |  FROM spn GROUP BY doc_id)""".stripMargin

  private def h32(expr: String, seed: Int): String =
    s"CAST('0x' || substr(md5($expr || '#$seed'), 1, 8) AS BIGINT)"

  /** Shared q31/q147 oracle: MinHash(8)+LSH(4x2) banding, exact-Jaccard
    * verify at >= 0.5, reproduced in portable SQL. */
  private def minhashBandOracle(roundDp: Int, where: String = ""): String = {
    import graft.functions.TextFunctions.minhashPermSql
    val sigCols = (0 until 8)
      .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i").mkString(",\n  ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
    }.mkString("\n UNION ALL ")
    val srcCte = if (where.isEmpty) tokCte
      else tokCte.replace("FROM documents", s"FROM documents $where")
    s"""WITH $srcCte,
       |${shingleCte(3)},
       |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
       |band AS ($bandRows),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
       |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
       |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
       |inter AS (SELECT id_a, id_b, count(*) AS ni
       |          FROM cand JOIN dsh a ON a.doc_id = id_a
       |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
       |          GROUP BY id_a, id_b)
       |SELECT id_a, id_b,
       |  round(CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni), $roundDp) AS jaccard
       |FROM inter JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
       |WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // Reproduces Dedup.minhashCalibration: q31's banding chain, plus a
    // per-pair signature-agreement count and exact-Jaccard ppm, grouped
    // by agreement level.
    "q195_minhash_error" -> {
      import graft.functions.TextFunctions.minhashPermSql
      val sigCols = (0 until 8)
        .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i")
        .mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      val matchSum = (0 until 8)
        .map(i => s"CASE WHEN sa.sig$i = sb.sig$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b),
         |pair AS (SELECT c.id_a, c.id_b,
         |    CAST($matchSum AS BIGINT) AS n_match,
         |    CAST(coalesce(ni, 0) AS BIGINT) * 1000000 //
         |      (na.ns + nb.ns - CAST(coalesce(ni, 0) AS BIGINT)) AS ex_ppm
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b
         |  JOIN cnt na ON na.doc_id = c.id_a JOIN cnt nb ON nb.doc_id = c.id_b
         |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b)
         |SELECT n_match, n_match * 125000 AS est_ppm, count(*) AS n_pairs,
         |  CAST(sum(ex_ppm) AS BIGINT) // count(*) AS mean_exact_ppm,
         |  min(ex_ppm) AS min_exact_ppm, max(ex_ppm) AS max_exact_ppm,
         |  CAST(sum(abs(n_match * 125000 - ex_ppm)) AS BIGINT) // count(*)
         |    AS mean_abs_err_ppm
         |FROM pair GROUP BY n_match ORDER BY n_match""".stripMargin
    },

    // Mirrors q221: 1-based subscripts, clamped inclusive list slices.
    "q221_kwic" ->
      s"""WITH $tokCte,
         |u AS (SELECT doc_id, tok, unnest(tok) AS w,
         |        generate_subscripts(tok, 1) AS p1 FROM t),
         |h AS (SELECT doc_id, p1, tok FROM u WHERE w = 'vector')
         |SELECT doc_id, CAST(p1 - 1 AS BIGINT) AS pos,
         |  CASE WHEN p1 = 1 THEN ''
         |       ELSE coalesce(array_to_string(tok[GREATEST(p1 - 3, 1):p1 - 1], ' '), '')
         |  END AS left_ctx,
         |  coalesce(array_to_string(tok[p1 + 1:p1 + 3], ' '), '') AS right_ctx
         |FROM h ORDER BY doc_id, pos LIMIT 50""".stripMargin,

    // Reproduces q216: distinct (source, shingle-hash) set, min-source
    // owner, per-source totals vs owned mass.
    "q216_source_novelty" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |ss AS (SELECT DISTINCT d.source, ${h32("s", 0)} AS h
         |       FROM sh JOIN documents d USING (doc_id)),
         |own AS (SELECT source, count(*) AS n_distinct_shingles
         |        FROM ss GROUP BY 1),
         |fo AS (SELECT h, min(source) AS owner FROM ss GROUP BY h),
         |nv AS (SELECT owner AS source, count(*) AS n_novel FROM fo GROUP BY 1)
         |SELECT own.source, n_distinct_shingles,
         |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(coalesce(n_novel, 0) AS BIGINT) * 1000000
         |    // n_distinct_shingles AS novel_ppm
         |FROM own LEFT JOIN nv ON nv.source = own.source
         |ORDER BY own.source""".stripMargin,

    // Reproduces q215: q31's verified-pair chain for the dup set, q41's
    // integer quality chain for the bands.
    "q215_quality_dup_rate" -> {
      import graft.functions.TextFunctions.minhashPermSql
      val sigCols = (0 until 8)
        .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i")
        .mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b),
         |vp AS (SELECT id_a, id_b FROM inter
         |  JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |  WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.5),
         |dup AS (SELECT DISTINCT doc_id FROM
         |         (SELECT id_a AS doc_id FROM vp
         |          UNION ALL SELECT id_b FROM vp)),
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |pq AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM g),
         |qq AS (SELECT doc_id,
         |        (tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10 AS sc
         |      FROM pq),
         |j AS (SELECT qq.doc_id, least(sc // 100000, 9) AS band,
         |        CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup
         |      FROM qq LEFT JOIN dup ON dup.doc_id = qq.doc_id)
         |SELECT band, count(*) AS n_docs,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
         |  CAST(sum(is_dup) AS BIGINT) * 1000000 // count(*) AS dup_ppm
         |FROM j GROUP BY band ORDER BY band""".stripMargin
    },

    // Reproduces Dedup.thresholdSweep: q31's banding chain, conditional
    // cross-multiplied counts per Jaccard tenth.
    "q206_dedup_threshold_sweep" -> {
      import graft.functions.TextFunctions.minhashPermSql
      val sigCols = (0 until 8)
        .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i")
        .mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      val sweeps = Seq(3, 5, 7, 8, 9).map(t =>
        s"""CAST(sum(CASE WHEN ni * 10 >= (nab - ni) * $t THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_ge_${t}0""".stripMargin).mkString(",\n  ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b),
         |pair AS (SELECT CAST(coalesce(ni, 0) AS BIGINT) AS ni,
         |    na.ns + nb.ns AS nab
         |  FROM cand c
         |  JOIN cnt na ON na.doc_id = c.id_a JOIN cnt nb ON nb.doc_id = c.id_b
         |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b)
         |SELECT count(*) AS n_candidates,
         |  $sweeps
         |FROM pair""".stripMargin
    },

    // Reproduces Dedup.goldenRecord: q38's component closure + per-field
    // majority votes (row_number argmax) + longest-member survivor.
    "q208_golden_record" ->
      s"""$componentsCtes,
         |tl AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok FROM t),
         |mem AS (SELECT c.doc_id, c.keep_id AS comp, d.lang, d.source,
         |          CAST(d.n_chars AS BIGINT) AS len, tl.n_tok
         |        FROM comp0 c JOIN documents d USING (doc_id)
         |        JOIN tl ON tl.doc_id = c.doc_id),
         |base AS (SELECT comp, count(*) AS n_members, max(len) AS max_len,
         |           CAST(sum(n_tok) AS BIGINT) AS total_tokens
         |         FROM mem GROUP BY comp),
         |lid AS (SELECT comp, doc_id AS longest_doc_id FROM
         |         (SELECT comp, doc_id, row_number() OVER
         |            (PARTITION BY comp ORDER BY len DESC, doc_id) AS rn
         |          FROM mem) WHERE rn = 1),
         |lc AS (SELECT comp, lang, count(*) AS c FROM mem GROUP BY 1, 2),
         |lv AS (SELECT comp, lang FROM
         |         (SELECT comp, lang, row_number() OVER
         |            (PARTITION BY comp ORDER BY c DESC, lang) AS rn FROM lc)
         |       WHERE rn = 1),
         |sc2 AS (SELECT comp, source, count(*) AS c FROM mem GROUP BY 1, 2),
         |sv AS (SELECT comp, source FROM
         |         (SELECT comp, source, row_number() OVER
         |            (PARTITION BY comp ORDER BY c DESC, source) AS rn FROM sc2)
         |       WHERE rn = 1)
         |SELECT base.comp, n_members, longest_doc_id, max_len, total_tokens,
         |       lv.lang, sv.source
         |FROM base JOIN lid USING (comp) JOIN lv USING (comp)
         |     JOIN sv USING (comp)
         |ORDER BY comp""".stripMargin,

    // Reproduces Dedup.dedupSavings: exact keepers by canonical-text md5,
    // near-dup survivors from q38's recursive component closure, token
    // masses folded per source.
    "q198_dedup_savings" ->
      s"""$componentsCtes,
         |tl AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok FROM t),
         |ex AS (SELECT doc_id, source, md5($normSql) AS ck FROM documents),
         |exk AS (SELECT ck, min(doc_id) AS ex_keep FROM ex GROUP BY ck),
         |fl AS (SELECT e.source, tl.n_tok,
         |         (e.doc_id = exk.ex_keep) AS is_ex,
         |         (coalesce(c.keep_id, e.doc_id) = e.doc_id) AS is_nd
         |       FROM ex e JOIN exk USING (ck)
         |       JOIN tl ON tl.doc_id = e.doc_id
         |       LEFT JOIN comp0 c ON c.doc_id = e.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS tokens_total,
         |  CAST(sum(CASE WHEN is_ex THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tokens_after_exact,
         |  CAST(sum(CASE WHEN is_ex AND is_nd THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tokens_after_near,
         |  (CAST(sum(n_tok) AS BIGINT)
         |    - CAST(sum(CASE WHEN is_ex THEN n_tok ELSE 0 END) AS BIGINT))
         |    * 1000000 // CAST(sum(n_tok) AS BIGINT) AS saved_exact_ppm,
         |  (CAST(sum(n_tok) AS BIGINT)
         |    - CAST(sum(CASE WHEN is_ex AND is_nd THEN n_tok ELSE 0 END) AS BIGINT))
         |    * 1000000 // CAST(sum(n_tok) AS BIGINT) AS saved_near_ppm
         |FROM fl GROUP BY source ORDER BY source""".stripMargin,

    // Mirrors TextAnalysis.simpsonDiversity: per-type counts, then the
    // exact integer Simpson ppm Σc(c−1)·10^6 div n(n−1).
    "q144_token_diversity" ->
      s"""WITH $tokCte,
         |w AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
         |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |        count(*) AS n_types, CAST(sum(c * (c - 1)) AS BIGINT) AS r2
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_types,
         |  CASE WHEN n_tokens > 1
         |       THEN r2 * 1000000 // (n_tokens * (n_tokens - 1))
         |       ELSE 0 END AS simpson_ppm
         |FROM g ORDER BY doc_id""".stripMargin,

    "q30_exact_dedup" ->
      s"""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM documents GROUP BY md5($normSql) ORDER BY keep_id""".stripMargin,

    "q31_minhash_neardup" -> minhashBandOracle(roundDp = 4),

    // The STREAMING near-dup operator run in batch mode computes the same
    // banded pair set (first-colliding-band emission is output-invariant),
    // so the state-machine code itself sits under the driver's hash gate —
    // the q107 discipline applied to dedup.
    "q147_streaming_neardup_batch" ->
      minhashBandOracle(roundDp = 6, where = "WHERE doc_id % 4 = 0"),

    // Full banding recompute restricted to delta-touching pairs — the
    // equivalence IncrementalDedupSpec proves operationally.
    "q74_incremental_neardup" -> {
      import graft.functions.TextFunctions.minhashPermSql
      val sigCols = (0 until 8)
        .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i").mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b)
         |SELECT id_a, id_b,
         |  round(CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni), 4) AS jaccard
         |FROM inter JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.2
         |  AND (id_a % 10 >= 8 OR id_b % 10 >= 8)
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q32_simhash_pairs" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |tf AS (SELECT doc_id, w, count(*) AS c, ${h32("w", 0)} AS h0, ${h32("w", 1)} AS h1
         |       FROM tk GROUP BY doc_id, w),
         |bits AS (SELECT doc_id, b.b,
         |    sum(CASE WHEN (h0 >> b.b) & 1 = 1 THEN c ELSE -c END) AS v0,
         |    sum(CASE WHEN (h1 >> b.b) & 1 = 1 THEN c ELSE -c END) AS v1
         |  FROM tf CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b GROUP BY doc_id, b.b),
         |sh64 AS (SELECT doc_id,
         |    sum(CASE WHEN v0 > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS lo,
         |    sum(CASE WHEN v1 > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS hi
         |  FROM bits GROUP BY doc_id),
         |blk AS (SELECT doc_id, lo, hi, j.j,
         |    CASE WHEN j.j < 2 THEN (lo >> (j.j * 16)) & 65535
         |         ELSE (hi >> ((j.j - 2) * 16)) & 65535 END AS bv
         |  FROM sh64 CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         |    x.lo AS lo_a, x.hi AS hi_a, y.lo AS lo_b, y.hi AS hi_b
         |  FROM blk x JOIN blk y
         |    ON x.j = y.j AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b,
         |  CAST(bit_count(CAST(xor(lo_a, lo_b) AS BIGINT))
         |     + bit_count(CAST(xor(hi_a, hi_b) AS BIGINT)) AS BIGINT) AS hd
         |FROM cand
         |WHERE bit_count(CAST(xor(lo_a, lo_b) AS BIGINT))
         |    + bit_count(CAST(xor(hi_a, hi_b) AS BIGINT)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "q33_same_source_jaccard" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |      FROM documents a JOIN documents b
         |        ON a.source = b.source AND a.doc_id < b.doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM p JOIN dsh a ON a.doc_id = id_a
         |                 JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b)
         |SELECT id_a, id_b,
         |  round(CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni), 4) AS jaccard
         |FROM inter JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "q34_train_split" ->
      s"""SELECT CASE WHEN ${h32("CAST(doc_id AS VARCHAR)", 9)} % 100 < 80
         |  THEN 'train' ELSE 'test' END AS split, lang, count(*) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q35_decontamination" ->
      s"""WITH $tokCte,
         |${shingleCte(4)},
         |hs AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS h FROM sh),
         |r AS (SELECT doc_id, h, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY h) AS rk FROM hs),
         |fp AS (SELECT doc_id, h FROM r WHERE rk <= 5),
         |sp AS (SELECT doc_id,
         |       ${h32("CAST(doc_id AS VARCHAR)", 9)} % 100 < 80 AS is_train
         |       FROM documents)
         |SELECT te.doc_id AS test_id, tr.doc_id AS train_id, count(*) AS n_shared
         |FROM fp te JOIN sp ste ON te.doc_id = ste.doc_id AND NOT ste.is_train
         |JOIN fp tr ON te.h = tr.h
         |JOIN sp str ON tr.doc_id = str.doc_id AND str.is_train
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY test_id, train_id""".stripMargin,

    "q36_token_distribution" ->
      s"""WITH n AS (SELECT lang, len(string_split($normSql, ' ')) AS nt FROM documents)
         |SELECT lang, CAST(min(nt) AS BIGINT) AS min_tokens,
         |  round(quantile_cont(nt, 0.5), 4) AS p50_tokens,
         |  round(quantile_cont(nt, 0.9), 4) AS p90_tokens,
         |  CAST(max(nt) AS BIGINT) AS max_tokens
         |FROM n GROUP BY lang ORDER BY lang""".stripMargin,

    "q38_neardup_components" ->
      s"""$componentsCtes
         |SELECT doc_id, keep_id FROM comp0 ORDER BY doc_id""".stripMargin,

    // q38's component labeling + the q34 hash split rule keyed on the
    // component label (singletons label themselves).
    "q125_component_split" ->
      s"""$componentsCtes,
         |lab AS (SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS comp
         |        FROM documents d LEFT JOIN comp0 c USING (doc_id))
         |SELECT CASE WHEN ${h32("CAST(comp AS VARCHAR)", 9)} % 100 < 80
         |    THEN 'train' ELSE 'test' END AS split,
         |  count(*) AS n_docs, count(DISTINCT comp) AS n_components
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    "q79_component_representatives" -> {
      val sigCols = (0 until 8)
        .map(i => s"min(${graft.functions.TextFunctions.minhashPermSql(h32("s", 0), i)}) AS sig$i")
        .mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH RECURSIVE $tokCte,
         |${shingleCte(3)},
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b),
         |p AS (SELECT id_a, id_b FROM inter
         |  JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |  WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.5),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
         |reach(n, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n),
         |complbl AS (SELECT n AS doc_id, min(r) AS comp FROM reach GROUP BY n),
         |labeled AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
         |            FROM documents d LEFT JOIN complbl c ON d.doc_id = c.doc_id),
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS nt,
         |        count(*) FILTER (w IN ('a', 'the')) AS ns,
         |        CAST(sum(length(w)) AS BIGINT) AS sl
         |      FROM tk GROUP BY doc_id),
         |qual AS (SELECT doc_id,
         |  (least(nt * 10000, 1000000) * 3
         |   + (1000000 - (ns * 1000000) // nt) * 4
         |   + least((sl * 1000000) // (8 * nt), 1000000) * 3) // 10 AS quality_ppm
         |  FROM g),
         |scored AS (SELECT l.comp, l.doc_id, qual.quality_ppm
         |           FROM labeled l JOIN qual ON l.doc_id = qual.doc_id),
         |ranked AS (SELECT comp, doc_id, quality_ppm, row_number() OVER (
         |  PARTITION BY comp ORDER BY quality_ppm DESC, doc_id ASC) AS rn FROM scored),
         |m AS (SELECT comp, count(*) AS n_members FROM scored GROUP BY comp)
         |SELECT r.comp, r.doc_id AS rep_id, r.quality_ppm AS rep_quality_ppm, m.n_members
         |FROM ranked r JOIN m ON r.comp = m.comp
         |WHERE rn = 1 ORDER BY r.comp""".stripMargin
    },

    "q37_corpus_prepare" -> {
      val sigCols = (0 until 8)
        .map(i => s"min(${graft.functions.TextFunctions.minhashPermSql(h32("s", 0), i)}) AS sig$i")
        .mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents
         |               GROUP BY md5($normSql)),
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b),
         |near_losers AS (SELECT DISTINCT id_b AS doc_id FROM inter
         |  JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |  WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.5),
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS nt,
         |        count(*) FILTER (w IN ('a', 'the')) AS ns,
         |        CAST(sum(length(w)) AS BIGINT) AS sl
         |      FROM tk GROUP BY doc_id),
         |qd AS (SELECT doc_id,
         |  (least(nt * 10000, 1000000) * 3
         |   + (1000000 - (ns * 1000000) // nt) * 4
         |   + least((sl * 1000000) // (8 * nt), 1000000) * 3) // 10 AS qppm
         |  FROM g)
         |SELECT d.doc_id, CASE WHEN ${h32("CAST(d.doc_id AS VARCHAR)", 9)} % 100 < 80
         |    THEN 'train' ELSE 'test' END AS split,
         |  CAST(qppm AS DOUBLE) / 1000000.0 AS quality
         |FROM documents d
         |JOIN exact_keep ek ON d.doc_id = ek.doc_id
         |LEFT JOIN near_losers nl ON d.doc_id = nl.doc_id
         |JOIN qd ON d.doc_id = qd.doc_id
         |WHERE nl.doc_id IS NULL AND qppm >= 650000
         |ORDER BY d.doc_id""".stripMargin
    },

    "q40_lang_id" ->
      s"""WITH tr AS (SELECT lang, unnest(string_split($normSql, ' ')) AS w
         |            FROM documents WHERE doc_id % 5 <> 0),
         |freq AS (SELECT lang, w, count(*) AS freq FROM tr GROUP BY lang, w),
         |tot AS (SELECT lang, count(*) AS total FROM tr GROUP BY lang),
         |rate AS (SELECT lang, w, (freq * 1000000) // total AS rate
         |         FROM freq JOIN tot USING (lang)),
         |te AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
         |       FROM documents WHERE doc_id % 5 = 0),
         |sc AS (SELECT doc_id, lang, sum(rate) AS score
         |       FROM te JOIN rate USING (w) GROUP BY doc_id, lang),
         |r AS (SELECT doc_id, lang, score, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM sc)
         |SELECT doc_id, lang AS pred_lang, CAST(score AS BIGINT) AS score
         |FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,

    "q41_quality_score" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |p AS (SELECT doc_id, n_tokens, n_stop, sum_len,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM g)
         |SELECT doc_id, n_tokens,
         |  CAST((n_stop * 2000000 + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1000000.0 AS stop_ratio,
         |  CAST((sum_len * 2000000 + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1000000.0 AS avg_token_len,
         |  CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10 AS BIGINT) AS quality_ppm,
         |  CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10 AS DOUBLE) / 1000000.0 AS quality
         |FROM p ORDER BY doc_id""".stripMargin,

    "q42_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subword,
         |  CAST(len(list_distinct(string_split($normSql, ' '))) AS BIGINT) AS n_distinct
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q43_fingerprint" ->
      s"""WITH $tokCte,
         |${shingleCte(4)},
         |hs AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS h FROM sh),
         |r AS (SELECT doc_id, h, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY h) AS rk FROM hs)
         |SELECT doc_id, rk, h FROM r WHERE rk <= 5
         |ORDER BY doc_id, rk""".stripMargin,

    // Mirrors Corpus.tokenBudgetMix + proportionalBudgets: the q41 quality
    // CTEs feed (source, quality_ppm) bins; cumulative bin tokens against
    // a 40%-of-source budget pick whole bins best-first.
    "q83_token_budget_mix" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |p AS (SELECT doc_id, n_tokens,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM g),
         |s AS (SELECT p.doc_id, d.source, p.n_tokens,
         |        CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10
         |          AS BIGINT) AS quality_ppm
         |      FROM p JOIN documents d USING (doc_id)),
         |b AS (SELECT source, quality_ppm, sum(n_tokens) AS bin_tokens
         |      FROM s GROUP BY source, quality_ppm),
         |bud AS (SELECT source, CAST(sum(n_tokens) * 40 // 100 AS BIGINT) AS token_budget
         |        FROM s GROUP BY source),
         |k AS (SELECT source, quality_ppm FROM (
         |        SELECT b.source, b.quality_ppm, token_budget,
         |          sum(bin_tokens) OVER (PARTITION BY b.source
         |            ORDER BY b.quality_ppm DESC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |        FROM b JOIN bud USING (source))
         |      WHERE cum <= token_budget)
         |SELECT s.doc_id, s.source, s.quality_ppm, s.n_tokens
         |FROM s JOIN k USING (source, quality_ppm)
         |ORDER BY source, quality_ppm DESC, doc_id""".stripMargin,

    // Mirrors Dedup.longestSharedSpan over Dedup.nearDupPairs: q31's
    // minhash CTEs produce the pairs; zipped-unnest token positions meet
    // on the word, and islands of consecutive pos_a per diagonal
    // (pos_a - pos_b) give the longest shared run.
    "q84_shared_span" -> {
      import graft.functions.TextFunctions.minhashPermSql
      val sigCols = (0 until 8)
        .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i").mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN band y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b),
         |pr AS (SELECT id_a, id_b
         |       FROM inter JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |       WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.5),
         |pos AS (SELECT doc_id, unnest(range(1, len(tok) + 1)) AS i, unnest(tok) AS w FROM t),
         |m AS (SELECT p.id_a, p.id_b, a.i AS ia, b.i AS ib
         |      FROM pr p JOIN pos a ON a.doc_id = p.id_a
         |                JOIN pos b ON b.doc_id = p.id_b AND a.w = b.w),
         |isl AS (SELECT id_a, id_b, ia - ib AS d,
         |          ia - row_number() OVER (PARTITION BY id_a, id_b, ia - ib ORDER BY ia) AS g
         |        FROM m),
         |runs AS (SELECT id_a, id_b, count(*) AS run FROM isl GROUP BY id_a, id_b, d, g)
         |SELECT id_a, id_b, max(run) AS max_span
         |FROM runs GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin
    },

    // Mirrors Dedup.sourceOverlap: distinct (source, shingle-hash) set,
    // per-hash pair expansion, integer-ppm containment.
    "q89_source_overlap" ->
      s"""WITH td AS (SELECT d.source, string_split($normSql, ' ') AS tok
         |            FROM documents d),
         |shs AS (SELECT source, unnest(CASE WHEN len(tok) >= 3 THEN
         |    list_transform(range(1, len(tok) - 1),
         |      i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]) ELSE [] END) AS s
         |  FROM td),
         |ss AS (SELECT DISTINCT source, ${h32("s", 0)} AS h FROM shs),
         |cnt AS (SELECT source, count(*) AS ns FROM ss GROUP BY source),
         |ov AS (SELECT x.source AS source_a, y.source AS source_b,
         |         count(*) AS n_shared
         |       FROM ss x JOIN ss y ON x.h = y.h AND x.source < y.source
         |       GROUP BY x.source, y.source)
         |SELECT source_a, source_b, n_shared,
         |  n_shared * 1000000 // least(na.ns, nb.ns) AS containment_ppm
         |FROM ov JOIN cnt na ON source_a = na.source
         |        JOIN cnt nb ON source_b = nb.source
         |ORDER BY source_a, source_b""".stripMargin,

    // Mirrors Sketch.countMin / Sketch.estimate: ONE md5 digest per
    // shingle, the four hash rows taken from its four independent
    // 32-bit slots, grid and estimates rebuilt cell-for-cell.
    "q93_countmin_shingles" -> {
      def slot32(e: String, d: Int): String =
        s"CAST('0x' || substr(md5($e || '#0'), ${1 + 8 * d}, 8) AS BIGINT)"
      val cmRows = (0 until 4).map { d =>
        s"SELECT $d AS d, ${slot32("s", d)} % 256 AS b, count(*) AS c FROM sh GROUP BY 2"
      }.mkString("\n UNION ALL ")
      val probeJoins = (0 until 4).map { d =>
        s"JOIN cm c$d ON c$d.d = $d AND c$d.b = ${slot32("ex.sh", d)} % 256"
      }.mkString("\n        ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |cm AS ($cmRows),
         |ex AS (SELECT s AS sh, count(*) AS exact FROM sh
         |       GROUP BY s ORDER BY exact DESC, sh ASC LIMIT 20)
         |SELECT ex.sh, ex.exact, least(c0.c, c1.c, c2.c, c3.c) AS cm_est
         |FROM ex
         |        $probeJoins
         |ORDER BY exact DESC, sh ASC""".stripMargin
    },

    "q106_token_cooccurrence" ->
      s"""WITH $tokCte,
         |d AS (SELECT doc_id, unnest(list_distinct(tok)) AS w FROM t)
         |SELECT a.w AS w1, b.w AS w2, count(*) AS n_docs
         |FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.w < b.w
         |GROUP BY 1, 2
         |HAVING count(*) * 5 >= (SELECT count(*) FROM documents)
         |ORDER BY n_docs DESC, w1, w2""".stripMargin,

    // Mirrors Dedup.crossNearDupPairs over the q35 split: each side's
    // band rows from the shared sig CTE, candidates from the banded
    // cross-boundary join, exact Jaccard on candidates only.
    "q102_fuzzy_decontaminate" -> {
      import graft.functions.TextFunctions.minhashPermSql
      val sigCols = (0 until 8)
        .map(i => s"min(${minhashPermSql(h32("s", 0), i)}) AS sig$i").mkString(",\n  ")
      val bandRows = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS b, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS v FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |sp AS (SELECT doc_id,
         |         ${h32("CAST(doc_id AS VARCHAR)", 9)} % 100 < 80 AS is_train
         |       FROM documents),
         |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |band AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM band x JOIN sp px ON x.doc_id = px.doc_id AND NOT px.is_train
         |              JOIN band y ON x.b = y.b AND x.v = y.v
         |              JOIN sp py ON y.doc_id = py.doc_id AND py.is_train),
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |cnt AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS ni
         |          FROM cand JOIN dsh a ON a.doc_id = id_a
         |                    JOIN dsh b ON b.doc_id = id_b AND a.s = b.s
         |          GROUP BY id_a, id_b)
         |SELECT id_a AS test_id, id_b AS train_id,
         |  round(CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni), 4) AS jaccard
         |FROM inter JOIN cnt na ON id_a = na.doc_id JOIN cnt nb ON id_b = nb.doc_id
         |WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= 0.3
         |ORDER BY test_id, train_id""".stripMargin
    },

    // Mirrors Sketch.kmvDistinct: distinct (source, hash), rank-k window,
    // order-statistic estimate in integer arithmetic.
    "q94_kmv_distinct" ->
      s"""WITH td AS (SELECT d.source, string_split($normSql, ' ') AS tok
         |            FROM documents d),
         |shs AS (SELECT source, unnest(CASE WHEN len(tok) >= 3 THEN
         |    list_transform(range(1, len(tok) - 1),
         |      i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]) ELSE [] END) AS s
         |  FROM td),
         |hs AS (SELECT DISTINCT source, ${h32("s", 0)} AS h FROM shs),
         |rk AS (SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs),
         |km AS (SELECT source, max(CASE WHEN rn = 64 THEN h END) AS hk,
         |         count(*) AS nk
         |       FROM rk WHERE rn <= 64 GROUP BY source),
         |ex AS (SELECT source, count(*) AS exact_distinct FROM hs GROUP BY source)
         |SELECT source,
         |  CASE WHEN nk < 64 THEN nk
         |       ELSE (63 * 4294967296) // hk END AS est_distinct,
         |  exact_distinct
         |FROM km JOIN ex USING (source) ORDER BY source""".stripMargin,

    "q109_pii_redaction" -> {
      import graft.operators.Scrub
      val counts = Scrub.defaultPatterns
        .map(p => s"CAST(${Scrub.countSql("text", p)} AS BIGINT) AS n_${p.name}")
        .mkString(",\n  ")
      s"""WITH seeded AS (SELECT doc_id, ${Scrub.seedSql} AS text FROM documents),
         |scrubbed AS (SELECT doc_id,
         |  $counts,
         |  md5(${Scrub.redactSql("text")}) AS redacted_md5
         |FROM seeded)
         |SELECT * FROM scrubbed
         |WHERE n_email + n_phone + n_ipv4 > 0
         |ORDER BY doc_id""".stripMargin
    },

    // Mirrors q239: same distinct (source, token) sets, same integer
    // Jaccard, same (ppm desc, pair) cut.
    "q239_source_vocab_overlap" ->
      s"""WITH $tokCte,
         |sv AS (SELECT DISTINCT d.source, u.w
         |       FROM t JOIN documents d USING (doc_id),
         |            unnest(t.tok) AS u(w)),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS v
         |       FROM sv GROUP BY source),
         |p AS (SELECT a.source AS s1, b.source AS s2,
         |        CAST(count(*) AS BIGINT) AS inter
         |      FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT s1, s2, inter,
         |  inter * 1000000 // (za.v + zb.v - inter) AS jaccard_ppm
         |FROM p JOIN sz za ON za.source = s1 JOIN sz zb ON zb.source = s2
         |ORDER BY jaccard_ppm DESC, s1, s2 LIMIT 25""".stripMargin,

    // Mirrors q229: zeros enter through N only; same integer VMR.
    "q229_token_burstiness" ->
      s"""WITH $tokCte,
         |tf AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |c AS (SELECT doc_id, w, count(*) AS c FROM tf GROUP BY doc_id, w),
         |pt AS (SELECT w, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(c) AS BIGINT) AS total,
         |         CAST(sum(c * c) AS BIGINT) AS ss
         |       FROM c GROUP BY w),
         |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents)
         |SELECT w, n_docs, total,
         |  CAST((nd * ss - total * total) * 1000000 // (nd * total) AS BIGINT)
         |    AS vmr_ppm
         |FROM pt, n ORDER BY total DESC, w LIMIT 20""".stripMargin,

    // Mirrors q228: q41's quality CTEs, the exact N·Σx²−(Σx)² integer
    // under one IEEE sqrt, floor-divided integer allocations.
    "q228_neyman_alloc" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |gg AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |p AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM gg),
         |q AS (SELECT p.doc_id, d.source,
         |        CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3)
         |          // 10 AS DECIMAL(38,0)) AS x
         |      FROM p JOIN documents d USING (doc_id)),
         |g AS (SELECT source, count(*) AS n_h, sum(x) AS s, sum(x * x) AS ss
         |      FROM q GROUP BY source),
         |v AS (SELECT source, n_h,
         |        CAST(n_h AS DECIMAL(38,0)) * ss - s * s AS varnum FROM g),
         |w AS (SELECT source, CAST(n_h AS BIGINT) AS n_h,
         |        CAST(floor(sqrt(CAST(varnum AS DOUBLE))) AS BIGINT) AS w_h
         |      FROM v)
         |SELECT source, n_h, w_h,
         |  CAST(10000 * w_h // (SELECT sum(w_h) FROM w) AS BIGINT) AS alloc_n,
         |  CAST(10000 * n_h // (SELECT sum(n_h) FROM w) AS BIGINT) AS prop_n
         |FROM w ORDER BY source""".stripMargin,

    // Mirrors q227: same hash, same dyadic geometric thresholds.
    "q227_dp_counts" -> {
      val noise = graft.operators.Scrub.geometricNoiseSql(h32("source", 55))
      s"""SELECT source,
         |  greatest(CAST(count(*) AS BIGINT) + ($noise), 0) AS noised_count
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },

    "q223_pii_by_source" -> {
      import graft.operators.Scrub
      val counts = Scrub.defaultPatterns
        .map(p => s"CAST(${Scrub.countSql("text", p)} AS BIGINT) AS n_${p.name}")
        .mkString(",\n  ")
      s"""WITH seeded AS (SELECT doc_id, source, ${Scrub.seedSql} AS text
         |               FROM documents),
         |c AS (SELECT source, $counts FROM seeded)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_email) AS BIGINT) AS n_email,
         |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
         |  CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
         |  CAST(sum(CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_docs_touched,
         |  CAST(sum(CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000000 // count(*) AS touched_ppm
         |FROM c GROUP BY source ORDER BY source""".stripMargin
    },

    "q113_bm25_topk" ->
      s"""WITH $tokCte,
         |$bm25ScoredCtes
         |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
         |       CAST(score_ppm AS BIGINT) AS score_ppm
         |FROM sc WHERE score_ppm > 0
         |ORDER BY score_ppm DESC, doc_id LIMIT 15""".stripMargin,

    // Reciprocal-rank fusion of two independent retrieval rankings (BM25
    // and raw query-term frequency) with the precomputed 1e6//(60+rank)
    // integer weight — no libm on either engine.
    "q204_rrf_fusion" ->
      s"""WITH $tokCte,
         |$bm25ScoredCtes,
         |ra AS (SELECT doc_id, row_number() OVER
         |         (ORDER BY score_ppm DESC, doc_id) AS rank_bm25
         |       FROM sc WHERE score_ppm > 0
         |       ORDER BY score_ppm DESC, doc_id LIMIT 30),
         |tfs AS (SELECT doc_id, ${bm25Terms.indices.map(i => s"f$i").mkString(" + ")} AS tf
         |        FROM d),
         |rb AS (SELECT doc_id, row_number() OVER
         |         (ORDER BY tf DESC, doc_id) AS rank_tf
         |       FROM tfs WHERE tf > 0
         |       ORDER BY tf DESC, doc_id LIMIT 30),
         |fused AS (SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         |    CAST(coalesce(ra.rank_bm25, 0) AS BIGINT) AS rank_bm25,
         |    CAST(coalesce(rb.rank_tf, 0) AS BIGINT) AS rank_tf,
         |    coalesce(1000000 // (60 + ra.rank_bm25), 0)
         |      + coalesce(1000000 // (60 + rb.rank_tf), 0) AS rrf_ppm
         |  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
         |SELECT doc_id, rank_bm25, rank_tf, CAST(rrf_ppm AS BIGINT) AS rrf_ppm
         |FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 10""".stripMargin,

    "q114_textrank_keywords" -> {
      // 10 fixed power iterations as chained CTEs; `//` == Spark `div`
      // on the all-positive ppm fixed-point operands
      val iterCtes = (1 to 10).map { i =>
        s"""r$i AS (SELECT v AS node,
           |  150000 + (850000 * sum((pr * w) // wu)) // 1000000 AS pr
           |FROM sym JOIN r${i - 1} ON sym.u = r${i - 1}.node
           |         JOIN deg ON sym.u = deg.u
           |GROUP BY v)""".stripMargin
      }.mkString(",\n")
      s"""WITH $tokCte,
         |p AS (SELECT unnest(CASE WHEN len(tok) >= 2 THEN
         |  list_transform(range(1, len(tok)),
         |                 i -> struct_pack(a := tok[i], b := tok[i + 1]))
         |  ELSE [] END) AS pr FROM t),
         |pp AS (SELECT pr.a AS a, pr.b AS b FROM p WHERE pr.a <> pr.b),
         |e AS (SELECT least(a, b) AS u, greatest(a, b) AS v, count(*) AS w
         |      FROM pp GROUP BY 1, 2),
         |sym AS (SELECT u, v, w FROM e UNION ALL SELECT v, u, w FROM e),
         |deg AS (SELECT u, sum(w) AS wu FROM sym GROUP BY u),
         |r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |$iterCtes
         |SELECT node AS term, CAST(pr AS BIGINT) AS rank_ppm FROM r10
         |ORDER BY pr DESC, node LIMIT 10""".stripMargin
    },

    "q116_score_auc" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |p AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM g),
         |q AS (SELECT doc_id,
         |        (tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10 AS sc
         |      FROM p),
         |s AS (SELECT q.sc, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
         |      FROM q JOIN documents d USING (doc_id)),
         |h AS (SELECT sc, sum(y) AS np, count(*) - sum(y) AS nn
         |      FROM s GROUP BY sc),
         |c AS (SELECT sc, np, nn,
         |        coalesce(sum(nn) OVER (ORDER BY sc
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS negs_below
         |      FROM h),
         |agg AS (SELECT sum(np) AS n_pos, sum(nn) AS n_neg,
         |          sum(np * negs_below) AS concordant, sum(np * nn) AS tied
         |        FROM c)
         |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
         |  CAST(concordant AS BIGINT) AS concordant, CAST(tied AS BIGINT) AS tied,
         |  CAST(((2 * concordant + tied) * 1000000) // (2 * n_pos * n_neg)
         |       AS BIGINT) AS auc_ppm,
         |  CAST(CAST(((2 * concordant + tied) * 1000000) // (2 * n_pos * n_neg)
         |       AS BIGINT) AS DOUBLE) / 1000000.0 AS auc
         |FROM agg""".stripMargin,

    "q117_calibration" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |p AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM g),
         |q AS (SELECT doc_id,
         |        (tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10 AS sc
         |      FROM p),
         |s AS (SELECT least(9, (sc * 10) // 1000000) AS bin,
         |        CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
         |      FROM q JOIN documents d USING (doc_id)
         |      WHERE sc BETWEEN 0 AND 1000000)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
         |  CAST(sum(y) AS BIGINT) AS n_pos,
         |  CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
         |FROM s GROUP BY bin ORDER BY bin""".stripMargin,

    "q118_chi2_independence" ->
      """WITH cells AS (SELECT source AS a, lang AS b, count(*) AS o
        |               FROM documents GROUP BY 1, 2),
        |rt AS (SELECT a, sum(o) AS r FROM cells GROUP BY a),
        |ct AS (SELECT b, sum(o) AS c FROM cells GROUP BY b),
        |nt AS (SELECT sum(o) AS n_total FROM cells),
        |j AS (SELECT o, r, c, n_total
        |      FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN nt),
        |agg AS (SELECT max(n_total) AS n, count(*) AS n_cells,
        |  sum(((CAST(o AS HUGEINT) * n_total - CAST(r AS HUGEINT) * c)
        |       * (CAST(o AS HUGEINT) * n_total - CAST(r AS HUGEINT) * c)
        |       * 1000000)
        |      // (CAST(n_total AS HUGEINT) * r * c)) AS obs_ppm,
        |  sum((CAST(r AS HUGEINT) * c * 1000000) // n_total) AS obs_exp_ppm
        |  FROM j)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
        |  CAST(obs_ppm + n * 1000000 - obs_exp_ppm AS BIGINT) AS chi2_ppm,
        |  CAST(CAST(obs_ppm + n * 1000000 - obs_exp_ppm AS BIGINT) AS DOUBLE)
        |    / 1000000.0 AS chi2
        |FROM agg""".stripMargin,

    // Mirrors TextAnalysis.bpeMerges: same double-space segmentation
    // encoding, same pair-count/argmax/replace step, unrolled 10x (the
    // TextRank fixed-iteration precedent).
    "q126_bpe_merges" -> {
      val unions = (1 to 10).map { k =>
        s"SELECT $k AS step, a AS lhs, b AS rhs, CAST(cnt AS BIGINT) AS pair_count FROM b$k"
      }.mkString("\nUNION ALL ")
      s"""WITH $bpeRuleCtes
         |$unions
         |ORDER BY step""".stripMargin
    },

    // Mirrors TextAnalysis.bpeEncode over the q126 rules: per-doc seg
    // strings (three-space word gaps), the ten replaces chained via
    // 1-row cross joins, subword counts off the final segmentation.
    "q127_bpe_encode" -> {
      val docCtes = (1 to 10).map { k =>
        s"""d$k AS (SELECT doc_id, tok, replace(seg, ' '||a||'  '||b||' ',
           |        ' '||a||b||' ') AS seg FROM d${k - 1} CROSS JOIN b$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $bpeRuleCtes,
         |d0 AS (SELECT doc_id, tok,
         |    ' ' || array_to_string(list_transform(tok, w ->
         |      ' ' || array_to_string(regexp_extract_all(w, '.'), '  ') || ' '),
         |      ' ') || ' ' AS seg FROM t),
         |$docCtes
         |SELECT doc_id, n_tokens, n_chars, n_subwords,
         |  CAST((n_subwords * 1000000) // nullif(n_chars, 0) AS BIGINT)
         |    AS subwords_per_char_ppm
         |FROM (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
         |    CAST(length(array_to_string(tok, '')) AS BIGINT) AS n_chars,
         |    CAST(CASE WHEN len(tok) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(seg), ' +')) END AS BIGINT)
         |      AS n_subwords
         |  FROM d10)
         |ORDER BY doc_id""".stripMargin
    },

    "q119_ks_separation" ->
      s"""WITH $scoredCte,
         |g2 AS (SELECT sc, CAST(sum(y) AS BIGINT) AS np,
         |         CAST(count(*) - sum(y) AS BIGINT) AS nn FROM s GROUP BY sc),
         |c AS (SELECT sc,
         |        sum(np) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cp,
         |        sum(nn) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cn,
         |        sum(np) OVER () AS tp, sum(nn) OVER () AS tn
         |      FROM g2),
         |d AS (SELECT sc, tp, tn,
         |        (abs(CAST(cp AS HUGEINT) * tn - CAST(cn AS HUGEINT) * tp)
         |         * 1000000) // (CAST(tp AS HUGEINT) * tn) AS d_ppm
         |      FROM c),
         |m AS (SELECT max(d_ppm) AS ks_ppm FROM d)
         |SELECT CAST(max(tp) AS BIGINT) AS n_pos,
         |  CAST(max(tn) AS BIGINT) AS n_neg,
         |  CAST(max(d.d_ppm) AS BIGINT) AS ks_ppm,
         |  CAST(min(sc) FILTER (d.d_ppm = m.ks_ppm) AS BIGINT) AS at_score,
         |  CAST(max(d.d_ppm) AS DOUBLE) / 1000000.0 AS ks
         |FROM d CROSS JOIN m""".stripMargin,

    "q120_threshold_sweep" ->
      s"""WITH $scoredCte,
         |g2 AS (SELECT sc AS threshold, CAST(sum(y) AS BIGINT) AS np,
         |         CAST(count(*) - sum(y) AS BIGINT) AS nn FROM s GROUP BY sc),
         |c AS (SELECT threshold,
         |        sum(np) OVER (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING) AS tp,
         |        sum(nn) OVER (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING) AS fp,
         |        sum(np) OVER ()
         |          - sum(np) OVER (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING) AS fn
         |      FROM g2)
         |SELECT CAST(threshold AS BIGINT) AS threshold, CAST(tp AS BIGINT) AS tp,
         |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
         |  CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_ppm,
         |  CAST((tp * 1000000) // (tp + fn) AS BIGINT) AS recall_ppm,
         |  CAST((2 * tp * 1000000) // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
         |FROM c ORDER BY threshold""".stripMargin,

    "q130_cumulative_gain" ->
      s"""WITH $scoredCte,
         |g2 AS (SELECT sc, count(*) AS n, CAST(sum(y) AS BIGINT) AS np
         |       FROM s GROUP BY sc),
         |c AS (SELECT sc, n, np,
         |        coalesce(sum(n) OVER (ORDER BY sc DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         |        sum(n) OVER () AS nt, sum(np) OVER () AS pt
         |      FROM g2),
         |b AS (SELECT (cum_before * 10) // nt AS bin,
         |        sum(n) AS n, sum(np) AS n_pos, max(nt) AS nt, max(pt) AS pt
         |      FROM c GROUP BY 1),
         |f AS (SELECT bin, n, n_pos,
         |        sum(n_pos) OVER (ORDER BY bin
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         |        nt, pt FROM b)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
         |  CAST(n_pos AS BIGINT) AS n_pos, CAST(cum_pos AS BIGINT) AS cum_pos,
         |  CAST((CAST(cum_pos AS HUGEINT) * 1000000) // nullif(pt, 0) AS BIGINT)
         |    AS gain_ppm,
         |  CAST((CAST(n_pos AS HUGEINT) * nt * 1000000)
         |    // nullif(CAST(n AS HUGEINT) * pt, 0) AS BIGINT) AS lift_ppm
         |FROM f ORDER BY bin""".stripMargin,

    "q121_lang_kappa" ->
      s"""WITH tr AS (SELECT lang, unnest(string_split($normSql, ' ')) AS w
         |            FROM documents WHERE doc_id % 5 <> 0),
         |freq AS (SELECT lang, w, count(*) AS freq FROM tr GROUP BY lang, w),
         |tot AS (SELECT lang, count(*) AS total FROM tr GROUP BY lang),
         |rate AS (SELECT lang, w, (freq * 1000000) // total AS rate
         |         FROM freq JOIN tot USING (lang)),
         |te AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
         |       FROM documents WHERE doc_id % 5 = 0),
         |sc AS (SELECT doc_id, lang, sum(rate) AS score
         |       FROM te JOIN rate USING (w) GROUP BY doc_id, lang),
         |r AS (SELECT doc_id, lang, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM sc),
         |j AS (SELECT r.lang AS a, d.lang AS b
         |      FROM r JOIN documents d USING (doc_id) WHERE rn = 1),
         |cells AS (SELECT a, b, count(*) AS o FROM j GROUP BY a, b),
         |rt AS (SELECT a AS k, sum(o) AS r FROM cells GROUP BY a),
         |ct AS (SELECT b AS k, sum(o) AS c FROM cells GROUP BY b),
         |ch AS (SELECT sum(CAST(coalesce(r, 0) AS HUGEINT) * coalesce(c, 0)) AS sum_rc
         |       FROM rt FULL OUTER JOIN ct USING (k)),
         |ob AS (SELECT CAST(sum(o) AS HUGEINT) AS n,
         |        CAST(coalesce(sum(o) FILTER (a = b), 0) AS HUGEINT) AS n_agree
         |       FROM cells)
         |SELECT CAST(n AS BIGINT) AS n, CAST(n_agree AS BIGINT) AS n_agree,
         |  CAST(CASE WHEN n * n - sum_rc = 0 THEN NULL
         |       ELSE ((n * n_agree - sum_rc) * 1000000) // (n * n - sum_rc)
         |       END AS BIGINT) AS kappa_ppm,
         |  CAST(CAST(CASE WHEN n * n - sum_rc = 0 THEN NULL
         |       ELSE ((n * n_agree - sum_rc) * 1000000) // (n * n - sum_rc)
         |       END AS BIGINT) AS DOUBLE) / 1000000.0 AS kappa
         |FROM ob CROSS JOIN ch""".stripMargin,

    // Multiple unnests in one SELECT zip positionally in DuckDB, so the
    // (w1, w2) bigram stream is the two shifted list slices zipped —
    // exactly zip_with(slice, slice) on the Spark side.
    "q131_lm_score" ->
      s"""WITH $tokCte,
         |trb AS (SELECT unnest(tok[1:len(tok)-1]) AS w1,
         |          unnest(tok[2:len(tok)]) AS w2
         |        FROM t WHERE doc_id % 5 <> 0),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM trb GROUP BY 1, 2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
         |vs AS (SELECT count(DISTINCT w) AS v FROM (
         |         SELECT unnest(tok) AS w FROM t WHERE doc_id % 5 <> 0)),
         |hob AS (SELECT doc_id, unnest(tok[1:len(tok)-1]) AS w1,
         |          unnest(tok[2:len(tok)]) AS w2
         |        FROM t WHERE doc_id % 5 = 0),
         |sc AS (SELECT doc_id,
         |         ((coalesce(c12, 0) + 1) * 1000000) // (coalesce(c1, 0) + v)
         |           AS ppm
         |       FROM hob LEFT JOIN c12 USING (w1, w2)
         |       LEFT JOIN c1 USING (w1) CROSS JOIN vs)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST((2 * sum(ppm) + count(*)) // (2 * count(*)) AS BIGINT) AS avg_ppm,
         |  CAST(min(ppm) AS BIGINT) AS min_ppm
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q137_tokenizer_fertility" ->
      s"""WITH g AS (SELECT lang,
         |  CAST(len(string_split($normSql, ' ')) AS BIGINT) AS nw,
         |  CAST(len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ns,
         |  CAST(length(replace($normSql, ' ', '')) AS BIGINT) AS nc
         |FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(nw) AS BIGINT) AS n_words,
         |  CAST(sum(ns) AS BIGINT) AS n_subwords,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST((sum(ns) * 1000000) // sum(nw) AS BIGINT) AS fertility_ppm,
         |  CAST((sum(nc) * 1000000) // greatest(sum(ns), 1) AS BIGINT)
         |    AS chars_per_subword_ppm
         |FROM g GROUP BY lang ORDER BY lang""".stripMargin,

    // Mirrors TextAnalysis.importanceWeights: same md5 bucket hash, same
    // add-1-smoothed HUGEINT cross products and truncating division, same
    // round-half-up per-doc ratio mean.
    "q136_dsir_weights" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |bk AS (SELECT doc_id, ${h32("w", 7)} % 1024 AS b FROM tk),
         |tb AS (SELECT b, count(*) AS ct FROM bk
         |       JOIN documents d USING (doc_id) WHERE d.lang = 'en' GROUP BY b),
         |rb AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
         |ttot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tb),
         |rtot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM rb),
         |rt AS (SELECT rb.b,
         |         CAST((CAST(coalesce(ct, 0) + 1 AS HUGEINT) * (nr + 1024) * 1000000)
         |           // (CAST(cr + 1 AS HUGEINT) * (nt + 1024)) AS BIGINT) AS r_ppm
         |       FROM rb LEFT JOIN tb USING (b) CROSS JOIN ttot CROSS JOIN rtot),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        CAST(sum(r_ppm) AS BIGINT) AS s
         |      FROM bk JOIN rt USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  (2 * s + n_tokens) // (2 * n_tokens) AS weight_ppm,
         |  ((2 * s + n_tokens) // (2 * n_tokens)) >= 1000000 AS target_like
         |FROM g ORDER BY doc_id""".stripMargin,

    // Mirrors Dedup.prefixJaccardPairs: distinct hashed shingle sets,
    // global rarest-first prefix of length ns - ceil(3 ns / 5) + 1, prefix
    // equi-join with the integer length filter, exact set-intersection
    // verify with the integer threshold 5·ni >= 3·(na+nb-ni). Shingles are
    // compared by the portable 32-bit hash exactly like the engine.
    "q140_prefix_jaccard" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |sz AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |dfc AS (SELECT s, count(*) AS df FROM dsh GROUP BY s),
         |pf AS (SELECT r.doc_id, r.s, sz.ns FROM (
         |         SELECT doc_id, s, row_number() OVER (
         |           PARTITION BY doc_id ORDER BY dfc.df, s) AS rn
         |         FROM dsh JOIN dfc USING (s)) r JOIN sz USING (doc_id)
         |       WHERE r.rn <= sz.ns - (sz.ns * 3 + 4) // 5 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM pf a JOIN pf b ON a.s = b.s AND a.doc_id < b.doc_id
         |           AND a.ns * 3 <= b.ns * 5 AND b.ns * 3 <= a.ns * 5),
         |i AS (SELECT id_a, id_b, count(*) AS ni
         |      FROM cand JOIN dsh x ON x.doc_id = id_a
         |           JOIN dsh y ON y.doc_id = id_b AND y.s = x.s
         |      GROUP BY id_a, id_b)
         |SELECT id_a, id_b, ni, na.ns + nb.ns - ni AS nu,
         |  round(CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni), 6) AS jaccard
         |FROM i JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
         |WHERE ni * 5 >= (na.ns + nb.ns - ni) * 3
         |ORDER BY id_a, id_b""".stripMargin,

    // Mirrors Dedup.containmentPairs: asymmetric prefix filter (probe A's
    // df-rarest p = ns − ⌈0.8·ns⌉ + 1 shingles into the FULL posting
    // table), exact set-intersection verify, all-integer threshold.
    "q148_containment_pairs" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |sz AS (SELECT doc_id, count(*) AS ns FROM dsh GROUP BY doc_id),
         |dfc AS (SELECT s, count(*) AS df FROM dsh GROUP BY s),
         |pf AS (SELECT r.doc_id, r.s, sz.ns FROM (
         |         SELECT doc_id, s, row_number() OVER (
         |           PARTITION BY doc_id ORDER BY dfc.df, s) AS rn
         |         FROM dsh JOIN dfc USING (s)) r JOIN sz USING (doc_id)
         |       WHERE r.rn <= sz.ns - (sz.ns * 4 + 4) // 5 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM pf a JOIN dsh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |              JOIN sz nb ON nb.doc_id = b.doc_id
         |         WHERE nb.ns * 5 >= a.ns * 4),
         |i AS (SELECT id_a, id_b, count(*) AS ni
         |      FROM cand JOIN dsh x ON x.doc_id = id_a
         |           JOIN dsh y ON y.doc_id = id_b AND y.s = x.s
         |      GROUP BY id_a, id_b)
         |SELECT id_a, id_b, na.ns AS na, ni,
         |  ni * 1000000 // na.ns AS containment_ppm
         |FROM i JOIN sz na ON na.doc_id = id_a
         |WHERE ni * 5 >= na.ns * 4
         |ORDER BY id_a, id_b""".stripMargin,

    // Mirrors Normalize.quantileNormalize over the q41 quality score: the
    // oracle uses the global windows the operator's bucketed machinery
    // avoids — positions and the integer index rule are identical.
    "q151_quantile_normalize" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |gq AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |pq AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM gq),
         |q AS (SELECT d.doc_id, d.source,
         |        CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10
         |          AS BIGINT) AS quality_ppm
         |      FROM documents d JOIN pq ON pq.doc_id = d.doc_id),
         |g AS (SELECT doc_id, source, quality_ppm,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY quality_ppm, doc_id) AS r,
         |        count(*) OVER (PARTITION BY source) AS ng FROM q),
         |p2 AS (SELECT quality_ppm AS gv, row_number() OVER (
         |         ORDER BY quality_ppm, doc_id) AS gpos FROM q),
         |t2 AS (SELECT count(*) AS n FROM q)
         |SELECT g.doc_id, g.source, g.quality_ppm, p2.gv AS norm_quality_ppm
         |FROM g CROSS JOIN t2 JOIN p2 ON p2.gpos =
         |  CASE WHEN g.ng > 1 THEN 1 + (g.r - 1) * (t2.n - 1) // (g.ng - 1)
         |       ELSE (t2.n + 1) // 2 END
         |ORDER BY g.doc_id""".stripMargin,

    // Mirrors Histogram.grid2d over (n_chars, q41 quality): fixed-width
    // integer bins, corpus-share ppm.
    "q156_quality_length_grid" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |gq AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |pq AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM gq),
         |q AS (SELECT d.doc_id, d.n_chars,
         |        CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10
         |          AS BIGINT) AS quality_ppm
         |      FROM documents d JOIN pq ON pq.doc_id = d.doc_id),
         |g2 AS (SELECT least(n_chars // 500, 19) AS xb,
         |         least(quality_ppm // 100000, 9) AS yb FROM q),
         |c AS (SELECT xb, yb, count(*) AS n FROM g2 GROUP BY 1, 2),
         |t2 AS (SELECT sum(n) AS tot FROM c)
         |SELECT xb, yb, n, CAST(n * 1000000 // tot AS BIGINT) AS share_ppm
         |FROM c CROSS JOIN t2
         |ORDER BY xb, yb""".stripMargin,

    // Mirrors TextAnalysis.ngramNovelty: distinct shingle hashes,
    // first-owner min aggregate, integer ppm readout.
    // Mirrors TextAnalysis.repetitionStats: one unioned gram stream per
    // order (token / bigram / trigram, hashed like the Spark side), the
    // same (doc, order, gram) count → (doc, order) rollup → pivot, the
    // same floor-div ppm and thresholds.
    "q241_repetition_rules" ->
      s"""WITH $tokCte,
         |gr AS (
         |  SELECT doc_id, 1 AS ng, ${h32("s", 0)} AS g
         |  FROM (SELECT doc_id, unnest(tok) AS s FROM t)
         |  UNION ALL
         |  SELECT doc_id, 2, ${h32("s", 0)}
         |  FROM (SELECT doc_id, unnest(CASE WHEN len(tok) >= 2 THEN
         |    list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])
         |    ELSE [] END) AS s FROM t)
         |  UNION ALL
         |  SELECT doc_id, 3, ${h32("s", 0)}
         |  FROM (SELECT doc_id, unnest(CASE WHEN len(tok) >= 3 THEN
         |    list_transform(range(1, len(tok) - 1),
         |      i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
         |    ELSE [] END) AS s FROM t)),
         |c AS (SELECT doc_id, ng, g, count(*) AS c FROM gr GROUP BY doc_id, ng, g),
         |st AS (SELECT doc_id, ng, CAST(max(c) AS BIGINT) AS mx,
         |         CAST(coalesce(sum(c) FILTER (c >= 2), 0) AS BIGINT) AS dup,
         |         CAST(sum(c) AS BIGINT) AS tot
         |       FROM c GROUP BY doc_id, ng),
         |w AS (SELECT doc_id,
         |   max(CASE WHEN ng = 1 THEN mx END) AS max1,
         |   max(CASE WHEN ng = 1 THEN tot END) AS tot1,
         |   max(CASE WHEN ng = 2 THEN mx END) AS max2,
         |   max(CASE WHEN ng = 2 THEN tot END) AS tot2,
         |   max(CASE WHEN ng = 3 THEN dup END) AS dup3,
         |   max(CASE WHEN ng = 3 THEN tot END) AS tot3
         | FROM st GROUP BY doc_id)
         |SELECT doc_id, tot1 AS n_tokens,
         |  max1 * 1000000 // tot1 AS top1_ppm,
         |  CAST(coalesce(max2 * 1000000 // tot2, 0) AS BIGINT) AS top2_ppm,
         |  CAST(coalesce(dup3 * 1000000 // tot3, 0) AS BIGINT) AS dup3_ppm,
         |  (max1 * 1000000 // tot1 <= 200000
         |   AND coalesce(max2 * 1000000 // tot2, 0) <= 180000
         |   AND coalesce(dup3 * 1000000 // tot3, 0) <= 300000) AS passes
         |FROM w ORDER BY doc_id""".stripMargin,

    // Mirrors Dedup.repeatedSpans: positional 8-grams, duplicated =
    // >= 2 distinct docs, spanRollupSql interval union, ppm readout.
    "q242_repeated_spans" ->
      s"""WITH $tokCte,
         |${posShingleCte(8)},
         |gh AS (SELECT doc_id, pos, ${h32("s", 0)} AS g FROM shp),
         |dg AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM gh)
         |  GROUP BY g HAVING count(*) >= 2),
         |dp AS (SELECT doc_id, pos FROM gh JOIN dg USING (g)),
         |${spanRollupSql(8)},
         |ln AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens FROM t)
         |SELECT ln.doc_id, n_tokens,
         |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_dup_spans,
         |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(CASE WHEN n_tokens > 0 THEN
         |    coalesce(dup_tokens, 0) * 1000000 // n_tokens ELSE 0 END
         |    AS BIGINT) AS dup_ppm
         |FROM ln LEFT JOIN pd USING (doc_id) ORDER BY ln.doc_id""".stripMargin,

    // Mirrors Dedup.exciseRepeatedSpans: q242's dp + spn interval CTEs,
    // tokens kept iff no span covers their position, string_agg rebuild.
    "q244_span_excision" ->
      s"""WITH $tokCte,
         |${posShingleCte(8)},
         |gh AS (SELECT doc_id, pos, ${h32("s", 0)} AS g FROM shp),
         |dg AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM gh)
         |  GROUP BY g HAVING count(*) >= 2),
         |dp AS (SELECT doc_id, pos FROM gh JOIN dg USING (g)),
         |${spanRollupSql(8)},
         |u AS (SELECT doc_id, generate_subscripts(tok, 1) - 1 AS p,
         |  unnest(tok) AS w FROM t),
         |kept AS (SELECT u.* FROM u WHERE NOT EXISTS (SELECT 1 FROM spn s
         |  WHERE s.doc_id = u.doc_id AND u.p BETWEEN s.fp AND s.lp)),
         |kc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(w, ' ' ORDER BY p) AS cleaned_text
         |  FROM kept GROUP BY doc_id),
         |ln AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens FROM t)
         |SELECT ln.doc_id, n_tokens,
         |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(cleaned_text, '') AS cleaned_text
         |FROM ln LEFT JOIN kc USING (doc_id) ORDER BY ln.doc_id""".stripMargin,

    // Mirrors TextAnalysis.tokenEntropy: per-(doc, token) counts joined
    // with the per-doc total, FixedPoint log2 terms, integer-div mean.
    "q250_token_entropy" -> {
      import graft.functions.FixedPoint.log2FpDuckSql
      s"""WITH tk AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
         |            FROM documents),
         |dc AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_distinct
         |       FROM dc GROUP BY doc_id),
         |tm AS (SELECT dc.doc_id,
         |         c * (${log2FpDuckSql("n_tokens")} - ${log2FpDuckSql("c")}) AS term
         |       FROM dc JOIN dl USING (doc_id))
         |SELECT dl.doc_id, n_tokens, n_distinct,
         |  CAST(CAST(sum(term) AS BIGINT) // n_tokens AS BIGINT) AS entropy_fp
         |FROM tm JOIN dl USING (doc_id)
         |GROUP BY dl.doc_id, n_tokens, n_distinct ORDER BY dl.doc_id""".stripMargin
    },

    // Mirrors Corpus.sourceDrift: (source, word) counts, global rollup,
    // ppb rates, FixedPoint log2 KL terms, per-source integer-div mean.
    // Carries the fits-ppb branch only (the sf corpus total is far below
    // 10⁹); the scale-free wide branch past the ceiling is gated by
    // CorpusSpec against the JVM fixed-point reference.
    "q249_source_drift" -> {
      import graft.functions.FixedPoint.log2FpDuckSql
      s"""WITH tk AS (SELECT source, unnest(string_split($normSql, ' ')) AS w
         |            FROM documents),
         |sw AS (SELECT source, w, count(*) AS c FROM tk GROUP BY source, w),
         |gw AS (SELECT w, sum(c) AS cg FROM sw GROUP BY w),
         |ts AS (SELECT source, sum(c) AS ts FROM sw GROUP BY source),
         |tg AS (SELECT sum(cg) AS tg FROM gw),
         |r AS (SELECT source, ts, c,
         |        (c * 1000000000) // ts AS p_ppb,
         |        (cg * 1000000000) // tg AS q_ppb
         |      FROM sw JOIN gw USING (w) JOIN ts USING (source) CROSS JOIN tg),
         |k AS (SELECT source, ts, c,
         |        c * (${log2FpDuckSql("p_ppb")} - ${log2FpDuckSql("q_ppb")}) AS kl_term
         |      FROM r)
         |SELECT source, CAST(max(ts) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(CAST(sum(kl_term) AS BIGINT) // max(ts) AS BIGINT) AS kl_fp
         |FROM k GROUP BY source ORDER BY source""".stripMargin
    },

    // Mirrors TextAnalysis.lmSurprisal: LM bigram/prefix counts on the
    // 80% split, add-one ppb conditional probability, FixedPoint log2
    // surprisal (1959352 = log2fp(1e9)), per-doc mean via integer div.
    // Carries the fits-ppb branch only (every sf prefix mass is far
    // below 10⁹); the wide branch is gated by TextAnalysisSpec against
    // the JVM fixed-point reference.
    "q248_lm_surprisal" ->
      s"""WITH $tokCte,
         |$lmSurprisalCtes
         |SELECT t.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
         |  CAST(coalesce(bits_fp, 0) AS BIGINT) AS bits_fp
         |FROM t LEFT JOIN sc USING (doc_id)
         |WHERE t.doc_id % 5 = 0 ORDER BY t.doc_id""".stripMargin,

    // Mirrors Corpus.domainMixFromSurprisal + domainMixWeights: q248's
    // per-doc held-out surprisal rolled up per source (token-weighted
    // int64 mean), min-shifted excess, η = 1 exponent capped at 20 bits,
    // FixedPoint exp2 (the same Q28 constant-product fold, DuckDB
    // spelling), ppm normalization and the c = 1000 ppm uniform
    // smoothing — every step integer, bit-identical. HUGEINT sums are
    // cast back to BIGINT before the fixed-point ops (their contract).
    "q260_domain_mix_weights" ->
      s"""WITH $tokCte,
         |$lmSurprisalCtes,
         |${mixWeightCtes("sc", "")}
         |SELECT domain, mass, loss_fp, excess_fp, weight_ppm, smoothed_ppm
         |FROM w ORDER BY domain""".stripMargin,

    // Mirrors Corpus.doremiLoop (rounds = 2, seed = 18, splitSeed = 13):
    // folds split by the PORTABLE id-hash (hash % 5 — a modulo fold
    // aliases with the fixtures' id-periodic source assignment, see the
    // operator's scaladoc); round 1 is the q260 exponentiated-gradient
    // chain under the uniform-mixture LM; its smoothed weights set
    // per-domain keep rates smoothed_ppm / max(smoothed_ppm), the
    // q57-style hash Bernoulli (seed 18 + 1 = 19) draws the round-2
    // training mix, the LM retrains on THAT mix, rescoring the same
    // held-out fold, and the step runs again — the paper's full
    // reweight→resample→retrain trajectory, every stage integer and
    // bit-replayed.
    "q262_doremi_loop" -> {
      val hold = s"${h32("CAST(doc_id AS VARCHAR)", 13)} % 5"
      val holdB = s"${h32("CAST(b.doc_id AS VARCHAR)", 13)} % 5 = 0"
      s"""WITH $tokCte,
         |$bgCte,
         |${lmChainCtes(s"$hold <> 0", "r1", holdB)},
         |${mixWeightCtes("r1sc", "r1")},
         |r1mx AS (SELECT max(smoothed_ppm) AS mx FROM r1w),
         |r1rt AS (SELECT domain, (smoothed_ppm * 1000000) // mx AS keep_ppm
         |         FROM r1w CROSS JOIN r1mx),
         |r1kp AS (SELECT d.doc_id FROM documents d
         |         JOIN r1rt ON d.source = r1rt.domain
         |         WHERE ${h32("CAST(d.doc_id AS VARCHAR)", 13)} % 5 <> 0
         |           AND ${h32("CAST(d.doc_id AS VARCHAR)", 19)} * 1000000
         |             < keep_ppm * 4294967296),
         |${lmChainCtes("doc_id IN (SELECT doc_id FROM r1kp)", "r2", holdB)},
         |${mixWeightCtes("r2sc", "r2")}
         |SELECT 1 AS round, domain, mass, loss_fp, excess_fp, weight_ppm,
         |  smoothed_ppm FROM r1w
         |UNION ALL
         |SELECT 2 AS round, domain, mass, loss_fp, excess_fp, weight_ppm,
         |  smoothed_ppm FROM r2w
         |ORDER BY round, domain""".stripMargin
    },

    // Mirrors Corpus.rhoLossScores: TWO q248 surprisal chains over the
    // shared bigram explode — the current-model LM on the % 5 in {2,3,4}
    // folds, the holdout LM on % 5 = 1 — both scoring the % 5 = 0 pool;
    // rho = train bits − holdout bits, selected when positive. Pool docs
    // with no bigrams coalesce to 0 bits on both sides (never selected).
    "q261_rholoss_selection" ->
      s"""WITH $tokCte,
         |$bgCte,
         |${lmChainCtes("doc_id % 5 >= 2", "tr")},
         |${lmChainCtes("doc_id % 5 = 1", "ho")}
         |SELECT p.doc_id, CAST(coalesce(tr.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(tr.bits_fp, 0) AS BIGINT) AS train_bits_fp,
         |  CAST(coalesce(ho.bits_fp, 0) AS BIGINT) AS holdout_bits_fp,
         |  CAST(coalesce(tr.bits_fp, 0) - coalesce(ho.bits_fp, 0) AS BIGINT)
         |    AS rho_fp,
         |  coalesce(tr.bits_fp, 0) - coalesce(ho.bits_fp, 0) > 0 AS is_selected
         |FROM (SELECT doc_id FROM t WHERE doc_id % 5 = 0) p
         |LEFT JOIN trsc tr USING (doc_id)
         |LEFT JOIN hosc ho USING (doc_id)
         |ORDER BY p.doc_id""".stripMargin,

    // Mirrors Corpus.dsirScores: unigram+bigram hashed buckets, add-one
    // ppb rates, FixedPoint log2 weights (same int64 shift-square fold,
    // DuckDB spelling), per-doc sums, bin-256 whole-bin top-20% cut.
    // Rates are staged as NAMED columns (w0) before the log, mirroring
    // the Spark-side staging — log2FpDuckSql inlines its input ~90x, so
    // it takes short column references only (its contract). The sf
    // corpus sits far inside ppb resolution, so this mirror carries the
    // fits-ppb branch only; the wide-log branch past 10⁹ totals is
    // gated by CorpusSpec against the JVM fixed-point reference.
    "q247_dsir_scores" -> {
      import graft.functions.FixedPoint.log2FpDuckSql
      s"""WITH $tokCte,
         |g AS (SELECT doc_id, unnest(tok) AS g FROM t
         |      UNION ALL
         |      SELECT doc_id, unnest(list_transform(range(1, len(tok)),
         |        i -> tok[i] || ' ' || tok[i + 1])) AS g FROM t),
         |gb AS (SELECT doc_id, ${h32("g", 11)} % 4096 AS b FROM g),
         |tc AS (SELECT b, count(*) AS ct FROM gb WHERE doc_id % 7 = 0 GROUP BY b),
         |db AS (SELECT doc_id, b, count(*) AS c FROM gb WHERE doc_id % 7 <> 0
         |       GROUP BY doc_id, b),
         |rc AS (SELECT b, sum(c) AS cr FROM db GROUP BY b),
         |st AS (SELECT (SELECT sum(ct) FROM tc) AS tt,
         |              (SELECT sum(cr) FROM rc) AS tr),
         |w0 AS (SELECT b, ((ct + 1) * 1000000000) // (tt + 4096) AS rt,
         |         ((cr + 1) * 1000000000) // (tr + 4096) AS rr
         |       FROM (SELECT coalesce(tc.b, rc.b) AS b, coalesce(ct, 0) AS ct,
         |               coalesce(cr, 0) AS cr
         |             FROM tc FULL OUTER JOIN rc USING (b)) CROSS JOIN st),
         |w AS (SELECT b, ${log2FpDuckSql("rt")} - ${log2FpDuckSql("rr")} AS w
         |      FROM w0),
         |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
         |         CAST(sum(c * w) AS BIGINT) AS dsir_fp
         |       FROM db JOIN w USING (b) GROUP BY doc_id),
         |s2 AS (SELECT *, dsir_fp // n_feats AS dsir_mean_fp FROM sc),
         |nd AS (SELECT count(*) AS nd FROM s2),
         |hb AS (SELECT dsir_mean_fp // 256 AS bin, count(*) AS n
         |       FROM s2 GROUP BY 1),
         |sel AS (SELECT bin FROM (SELECT bin, sum(n) OVER (ORDER BY bin DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |        FROM hb) CROSS JOIN nd WHERE cum <= (nd * 20) // 100)
         |SELECT s2.doc_id, n_feats, dsir_fp, dsir_mean_fp,
         |  (sel.bin IS NOT NULL) AS is_selected
         |FROM s2 LEFT JOIN sel ON s2.dsir_mean_fp // 256 = sel.bin
         |ORDER BY s2.doc_id""".stripMargin
    },

    // Mirrors TextAnalysis.perplexityBuckets: q248's LM-surprisal CTEs
    // scoring ALL docs (no %5 filter on the scored side; the LM still
    // trains on the 80%), then the whole-bin histogram walk placing
    // the 1/3 and 2/3 cuts at bin granularity.
    "q255_perplexity_buckets" -> {
      import graft.functions.FixedPoint.log2FpDuckSql
      s"""WITH $tokCte,
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tok)),
         |        i -> tok[i] || ' ' || tok[i + 1])) AS bg FROM t),
         |lb AS (SELECT bg, count(*) AS c12 FROM bg WHERE doc_id % 5 <> 0 GROUP BY bg),
         |lp AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM lb GROUP BY 1),
         |vs AS (SELECT count(DISTINCT w) AS v FROM (
         |        SELECT unnest(tok) AS w FROM t WHERE doc_id % 5 <> 0)),
         |sur AS (SELECT doc_id,
         |          1959352 - ${log2FpDuckSql("p_ppb")} AS sur
         |        FROM (SELECT b.doc_id,
         |                (coalesce(c12, 0) + 1) * 1000000000
         |                  // (coalesce(c1, 0) + v) AS p_ppb
         |              FROM bg b LEFT JOIN lb USING (bg)
         |              LEFT JOIN lp ON lp.w1 = split_part(b.bg, ' ', 1)
         |              CROSS JOIN vs)),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |         sum(sur) // count(*) AS bits_fp
         |       FROM sur GROUP BY doc_id),
         |s2 AS (SELECT t.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
         |         CAST(coalesce(bits_fp, 0) AS BIGINT) AS bits_fp
         |       FROM t LEFT JOIN sc USING (doc_id)),
         |nd AS (SELECT count(*) AS nd FROM s2),
         |hb AS (SELECT bits_fp // 256 AS bin, count(*) AS n FROM s2 GROUP BY 1),
         |cb AS (SELECT bin, sum(n) OVER (ORDER BY bin
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |       FROM hb),
         |bk AS (SELECT bin, CASE WHEN cum <= nd // 3 THEN 'head'
         |         WHEN cum <= (2 * nd) // 3 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |       FROM cb CROSS JOIN nd)
         |SELECT s.doc_id, s.n_bigrams, s.bits_fp, bk.bucket,
         |  bk.bucket <> 'tail' AS kept
         |FROM s2 s JOIN bk ON s.bits_fp // 256 = bk.bin
         |ORDER BY s.doc_id""".stripMargin
    },

    // Mirrors Corpus.qualityPerceptron: the full batch-perceptron
    // training run (4 steps) as unrolled integer CTEs — step 1 is the
    // all-mistakes shortcut (w = 0 makes y·margin = 0 ≤ 0 for every
    // doc), steps 2..4 the generic margin → mistakes → Σ y·c update,
    // then the final margins. All int64 sums — bit-identical. The
    // mistake set is keyed on (doc_id, y) exactly as the trainer's
    // margin window, so the oracle mirrors the operator for ANY
    // labeling, not just q254's disjoint doc_id % 7 split.
    "q254_quality_classifier" ->
      s"""WITH $tokCte,
         |$perceptronCtes
         |SELECT doc_id, CAST(y AS INTEGER) AS y, n_feats, score,
         |  score > 0 AS pred
         |FROM (SELECT f.doc_id, y, CAST(sum(c) AS BIGINT) AS n_feats,
         |        CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS score
         |      FROM feat f LEFT JOIN w4 USING (b) GROUP BY f.doc_id, y)
         |ORDER BY doc_id""".stripMargin,

    // Mirrors Corpus.qualityPerceptronWeights on the doc_id % 3 != 0
    // fold + perceptronScore on the held-out third + Evaluate.binaryAuc:
    // the same unrolled-CTE training, the score as Σ w(b) over each
    // held-out doc's gram occurrences (unseen buckets coalesce to 0),
    // then q116's class-histogram AUC.
    "q257_classifier_heldout_auc" ->
      s"""WITH $tokCte,
         |${perceptronCtesWhere("WHERE doc_id % 3 <> 0")}
         |, hg AS (SELECT doc_id, ${h32("g", 11)} % 4096 AS b FROM g
         |    WHERE doc_id % 3 = 0),
         |sc AS (SELECT doc_id, CAST(sum(coalesce(w, 0)) AS BIGINT) AS score
         |       FROM hg LEFT JOIN w4 USING (b) GROUP BY doc_id),
         |s AS (SELECT score AS scv,
         |        CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS y FROM sc),
         |h AS (SELECT scv, sum(y) AS np, count(*) - sum(y) AS nn
         |      FROM s GROUP BY scv),
         |c AS (SELECT scv, np, nn,
         |        coalesce(sum(nn) OVER (ORDER BY scv
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS negs_below
         |      FROM h),
         |agg AS (SELECT sum(np) AS n_pos, sum(nn) AS n_neg,
         |          sum(np * negs_below) AS concordant, sum(np * nn) AS tied
         |        FROM c)
         |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
         |  CAST(concordant AS BIGINT) AS concordant, CAST(tied AS BIGINT) AS tied,
         |  CAST(((2 * concordant + tied) * 1000000) // (2 * n_pos * n_neg)
         |       AS BIGINT) AS auc_ppm,
         |  CAST(CAST(((2 * concordant + tied) * 1000000) // (2 * n_pos * n_neg)
         |       AS BIGINT) AS DOUBLE) / 1000000.0 AS auc
         |FROM agg""".stripMargin,

    // q259: q257's evaluation chain with the CONTENT label — the q41
    // quality band at 700000 ppm replayed as `lab`, training restricted
    // to the doc_id % 3 != 0 fold via a lab join, the held-out third
    // scored against w4, then the same class-histogram AUC. Entirely
    // int64 — bit-identical.
    "q259_classifier_content_auc" ->
      s"""WITH $tokCte,
         |${qualityLabelCte(700000L)},
         |${perceptronCtesWhere("WHERE doc_id % 3 <> 0", "y", "g JOIN lab USING (doc_id)")}
         |, hg AS (SELECT doc_id, ${h32("g", 11)} % 4096 AS b FROM g
         |    WHERE doc_id % 3 = 0),
         |sc AS (SELECT doc_id, CAST(sum(coalesce(w, 0)) AS BIGINT) AS score
         |       FROM hg LEFT JOIN w4 USING (b) GROUP BY doc_id),
         |s AS (SELECT score AS scv,
         |        CASE WHEN y = 1 THEN 1 ELSE 0 END AS y
         |      FROM sc JOIN lab USING (doc_id)),
         |h AS (SELECT scv, sum(y) AS np, count(*) - sum(y) AS nn
         |      FROM s GROUP BY scv),
         |c AS (SELECT scv, np, nn,
         |        coalesce(sum(nn) OVER (ORDER BY scv
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS negs_below
         |      FROM h),
         |agg AS (SELECT sum(np) AS n_pos, sum(nn) AS n_neg,
         |          sum(np * negs_below) AS concordant, sum(np * nn) AS tied
         |        FROM c)
         |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
         |  CAST(concordant AS BIGINT) AS concordant, CAST(tied AS BIGINT) AS tied,
         |  CAST(((2 * concordant + tied) * 1000000) // (2 * n_pos * n_neg)
         |       AS BIGINT) AS auc_ppm,
         |  CAST(CAST(((2 * concordant + tied) * 1000000) // (2 * n_pos * n_neg)
         |       AS BIGINT) AS DOUBLE) / 1000000.0 AS auc
         |FROM agg""".stripMargin,

    // Mirrors exciseRepeatedSpans(keepOne = true): q244's pipeline, but
    // dg carries min(doc_id) ownership and dp drops the owner's rows.
    "q245_span_excision_keepone" ->
      s"""WITH $tokCte,
         |${posShingleCte(8)},
         |gh AS (SELECT doc_id, pos, ${h32("s", 0)} AS g FROM shp),
         |dg AS (SELECT g, min(doc_id) AS own
         |  FROM (SELECT DISTINCT doc_id, g FROM gh)
         |  GROUP BY g HAVING count(*) >= 2),
         |dp AS (SELECT doc_id, pos FROM gh JOIN dg USING (g)
         |  WHERE gh.doc_id <> dg.own),
         |${spanRollupSql(8)},
         |u AS (SELECT doc_id, generate_subscripts(tok, 1) - 1 AS p,
         |  unnest(tok) AS w FROM t),
         |kept AS (SELECT u.* FROM u WHERE NOT EXISTS (SELECT 1 FROM spn s
         |  WHERE s.doc_id = u.doc_id AND u.p BETWEEN s.fp AND s.lp)),
         |kc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(w, ' ' ORDER BY p) AS cleaned_text
         |  FROM kept GROUP BY doc_id),
         |ln AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens FROM t)
         |SELECT ln.doc_id, n_tokens,
         |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(cleaned_text, '') AS cleaned_text
         |FROM ln LEFT JOIN kc USING (doc_id) ORDER BY ln.doc_id""".stripMargin,

    // Mirrors Decontaminate.spanContamination over q34's hash split:
    // train positions probed against the distinct held-out 8-gram set,
    // then the same spanRollupSql interval union.
    "q243_span_decontamination" ->
      s"""WITH $tokCte,
         |${posShingleCte(8)},
         |sp0 AS (SELECT doc_id,
         |  ${h32("CAST(doc_id AS VARCHAR)", 9)} % 100 < 80 AS is_train
         |  FROM documents),
         |gh AS (SELECT shp.doc_id, pos, ${h32("s", 0)} AS h, is_train
         |  FROM shp JOIN sp0 ON shp.doc_id = sp0.doc_id),
         |th AS (SELECT DISTINCT h FROM gh WHERE NOT is_train),
         |dp AS (SELECT doc_id, pos FROM gh JOIN th USING (h) WHERE is_train),
         |${spanRollupSql(8)},
         |ln AS (SELECT t.doc_id, CAST(len(tok) AS BIGINT) AS n_tokens
         |  FROM t JOIN sp0 ON t.doc_id = sp0.doc_id WHERE is_train)
         |SELECT ln.doc_id, n_tokens,
         |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_contam_spans,
         |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS contam_tokens,
         |  CAST(CASE WHEN n_tokens > 0 THEN
         |    coalesce(dup_tokens, 0) * 1000000 // n_tokens ELSE 0 END
         |    AS BIGINT) AS contam_ppm
         |FROM ln LEFT JOIN pd USING (doc_id) ORDER BY ln.doc_id""".stripMargin,

    // Mirrors Decontaminate.exciseContaminatedSpans (strict): q243's
    // train-position probe against the held-out gram set, then q244's
    // interval union + token anti-join + string_agg rebuild, restricted
    // to training docs.
    "q251_decontam_excision" ->
      s"""WITH $tokCte,
         |${posShingleCte(8)},
         |sp0 AS (SELECT doc_id,
         |  ${h32("CAST(doc_id AS VARCHAR)", 9)} % 100 < 80 AS is_train
         |  FROM documents),
         |gh AS (SELECT shp.doc_id, pos, ${h32("s", 0)} AS h, is_train
         |  FROM shp JOIN sp0 ON shp.doc_id = sp0.doc_id),
         |th AS (SELECT DISTINCT h FROM gh WHERE NOT is_train),
         |dp AS (SELECT doc_id, pos FROM gh JOIN th USING (h) WHERE is_train),
         |${spanRollupSql(8)},
         |u AS (SELECT t.doc_id, generate_subscripts(tok, 1) - 1 AS p,
         |  unnest(tok) AS w FROM t JOIN sp0 ON t.doc_id = sp0.doc_id
         |  WHERE is_train),
         |kept AS (SELECT u.* FROM u WHERE NOT EXISTS (SELECT 1 FROM spn s
         |  WHERE s.doc_id = u.doc_id AND u.p BETWEEN s.fp AND s.lp)),
         |kc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(w, ' ' ORDER BY p) AS cleaned_text
         |  FROM kept GROUP BY doc_id),
         |ln AS (SELECT t.doc_id, CAST(len(tok) AS BIGINT) AS n_tokens
         |  FROM t JOIN sp0 ON t.doc_id = sp0.doc_id WHERE is_train)
         |SELECT ln.doc_id, n_tokens,
         |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(cleaned_text, '') AS cleaned_text
         |FROM ln LEFT JOIN kc USING (doc_id) ORDER BY ln.doc_id""".stripMargin,

    // Mirrors exciseContaminatedSpans(keepOne = true): q251's pipeline,
    // but each colliding gram carries its min-training-doc owner and dp
    // drops the owner's rows.
    "q252_decontam_excision_keepone" ->
      s"""WITH $tokCte,
         |${posShingleCte(8)},
         |sp0 AS (SELECT doc_id,
         |  ${h32("CAST(doc_id AS VARCHAR)", 9)} % 100 < 80 AS is_train
         |  FROM documents),
         |gh AS (SELECT shp.doc_id, pos, ${h32("s", 0)} AS h, is_train
         |  FROM shp JOIN sp0 ON shp.doc_id = sp0.doc_id),
         |th AS (SELECT DISTINCT h FROM gh WHERE NOT is_train),
         |ow AS (SELECT h, min(doc_id) AS own
         |  FROM (SELECT DISTINCT doc_id, h FROM gh WHERE is_train)
         |  JOIN th USING (h) GROUP BY h),
         |dp AS (SELECT doc_id, pos FROM gh JOIN ow USING (h)
         |  WHERE is_train AND gh.doc_id <> ow.own),
         |${spanRollupSql(8)},
         |u AS (SELECT t.doc_id, generate_subscripts(tok, 1) - 1 AS p,
         |  unnest(tok) AS w FROM t JOIN sp0 ON t.doc_id = sp0.doc_id
         |  WHERE is_train),
         |kept AS (SELECT u.* FROM u WHERE NOT EXISTS (SELECT 1 FROM spn s
         |  WHERE s.doc_id = u.doc_id AND u.p BETWEEN s.fp AND s.lp)),
         |kc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  string_agg(w, ' ' ORDER BY p) AS cleaned_text
         |  FROM kept GROUP BY doc_id),
         |ln AS (SELECT t.doc_id, CAST(len(tok) AS BIGINT) AS n_tokens
         |  FROM t JOIN sp0 ON t.doc_id = sp0.doc_id WHERE is_train)
         |SELECT ln.doc_id, n_tokens,
         |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(cleaned_text, '') AS cleaned_text
         |FROM ln LEFT JOIN kc USING (doc_id) ORDER BY ln.doc_id""".stripMargin,

    "q153_ngram_novelty" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |dsh AS (SELECT DISTINCT doc_id, ${h32("s", 0)} AS s FROM sh),
         |f AS (SELECT s, min(doc_id) AS first_doc FROM dsh GROUP BY s)
         |SELECT dsh.doc_id, count(*) AS n_shingles,
         |  CAST(count(*) FILTER (first_doc = dsh.doc_id) AS BIGINT) AS n_novel,
         |  count(*) FILTER (first_doc = dsh.doc_id) * 1000000 // count(*)
         |    AS novelty_ppm
         |FROM dsh JOIN f USING (s) GROUP BY dsh.doc_id
         |ORDER BY dsh.doc_id""".stripMargin,

    // Mirrors Corpus.curate: componentsCtes supplies the pair graph +
    // labels; the containment, quantile-normalize and split fragments are
    // the q148/q151/q125 oracles inlined over the SAME shingle tables.
    "q161_corpus_curate" ->
      s"""$componentsCtes,
         |lab AS (SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS comp
         |        FROM documents d LEFT JOIN comp0 c USING (doc_id)),
         |szc AS (SELECT comp, count(*) AS comp_size FROM lab GROUP BY comp),
         |wt AS (SELECT lab.doc_id, lab.comp, 1000000 // szc.comp_size AS weight_ppm
         |       FROM lab JOIN szc USING (comp)),
         |ek AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5($normSql)),
         |nl AS (SELECT DISTINCT id_b FROM p),
         |dfc AS (SELECT s, count(*) AS df FROM dsh GROUP BY s),
         |cpf AS (SELECT r.doc_id, r.s, cnt.ns FROM (
         |         SELECT doc_id, s, row_number() OVER (
         |           PARTITION BY doc_id ORDER BY dfc.df, s) AS rn
         |         FROM dsh JOIN dfc USING (s)) r JOIN cnt USING (doc_id)
         |       WHERE r.rn <= cnt.ns - (cnt.ns * 9 + 9) // 10 + 1),
         |ccand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM cpf a JOIN dsh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |               JOIN cnt nb ON nb.doc_id = b.doc_id
         |          WHERE nb.ns * 10 >= a.ns * 9),
         |ci AS (SELECT id_a, id_b, count(*) AS ni
         |       FROM ccand JOIN dsh x ON x.doc_id = id_a
         |            JOIN dsh y ON y.doc_id = id_b AND y.s = x.s
         |       GROUP BY id_a, id_b),
         |cp2 AS (SELECT ci.id_a, ci.id_b FROM ci JOIN cnt na ON na.doc_id = ci.id_a
         |        WHERE ci.ni * 10 >= na.ns * 9),
         |cdom AS (SELECT DISTINCT pp.id_a AS doc_id FROM cp2 pp
         |         LEFT JOIN cp2 m ON m.id_a = pp.id_b AND m.id_b = pp.id_a
         |         WHERE m.id_a IS NULL OR pp.id_a > pp.id_b),
         |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
         |gq AS (SELECT doc_id, count(*) AS n_tokens,
         |        count(*) FILTER (w IN ('a', 'the')) AS n_stop,
         |        CAST(sum(length(w)) AS BIGINT) AS sum_len
         |      FROM tk GROUP BY doc_id),
         |pq AS (SELECT doc_id,
         |        (n_stop * 1000000) // n_tokens AS stop_ppm,
         |        least((sum_len * 1000000) // (8 * n_tokens), 1000000) AS len_ppm,
         |        least(n_tokens * 10000, 1000000) AS tok_ppm
         |      FROM gq),
         |qual AS (SELECT d.doc_id, d.source,
         |        CAST((tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) // 10
         |          AS BIGINT) AS quality_ppm
         |      FROM documents d JOIN pq ON pq.doc_id = d.doc_id),
         |gg AS (SELECT doc_id, source, quality_ppm,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY quality_ppm, doc_id) AS r,
         |        count(*) OVER (PARTITION BY source) AS ng FROM qual),
         |pos AS (SELECT quality_ppm AS gv, row_number() OVER (
         |         ORDER BY quality_ppm, doc_id) AS gpos FROM qual),
         |tot AS (SELECT count(*) AS n FROM qual),
         |nq AS (SELECT gg.doc_id, pos.gv AS norm_quality_ppm
         |       FROM gg CROSS JOIN tot JOIN pos ON pos.gpos =
         |         CASE WHEN gg.ng > 1 THEN 1 + (gg.r - 1) * (tot.n - 1) // (gg.ng - 1)
         |              ELSE (tot.n + 1) // 2 END)
         |SELECT d.doc_id,
         |  CASE WHEN ${h32("CAST(wt.comp AS VARCHAR)", 9)} % 100 < 80
         |       THEN 'train' ELSE 'test' END AS split,
         |  wt.comp, wt.weight_ppm, nq.norm_quality_ppm
         |FROM documents d
         |JOIN ek ON ek.keep_id = d.doc_id
         |JOIN wt ON wt.doc_id = d.doc_id
         |JOIN nq ON nq.doc_id = d.doc_id
         |WHERE d.doc_id NOT IN (SELECT id_b FROM nl)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM cdom)
         |  AND nq.norm_quality_ppm >= 500000
         |ORDER BY d.doc_id""".stripMargin,

    // q38's component labeling + per-component size → ppm weight.
    "q152_dedup_weights" ->
      s"""$componentsCtes,
         |lab AS (SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS comp
         |        FROM documents d LEFT JOIN comp0 c ON c.doc_id = d.doc_id),
         |sz2 AS (SELECT comp, count(*) AS comp_size FROM lab GROUP BY comp)
         |SELECT lab.doc_id, lab.comp, sz2.comp_size,
         |  1000000 // sz2.comp_size AS weight_ppm
         |FROM lab JOIN sz2 USING (comp)
         |ORDER BY lab.doc_id""".stripMargin,

    "q162_zipf_coverage" ->
      s"""WITH $tokCte,
         |tk AS (SELECT unnest(tok) AS w FROM t),
         |vf AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w),
         |tot AS (SELECT count(*) AS n_vocab,
         |        CAST(sum(cnt) AS BIGINT) AS n_tokens FROM vf),
         |r AS (SELECT cnt, w,
         |    row_number() OVER (ORDER BY cnt DESC, w) AS rk,
         |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM vf)
         |SELECT max(n_vocab) AS n_vocab, max(n_tokens) AS n_tokens,
         |  max(CASE WHEN rk = 1 THEN (cnt * 1000000) // n_tokens END) AS top1_ppm,
         |  min(CASE WHEN cum * 2 >= n_tokens THEN rk END) AS k50,
         |  min(CASE WHEN cum * 10 >= n_tokens * 9 THEN rk END) AS k90,
         |  min(CASE WHEN cum * 100 >= n_tokens * 99 THEN rk END) AS k99
         |FROM r, tot""".stripMargin,

    "q163_heavy_hitters" ->
      s"""WITH $tokCte,
         |tk AS (SELECT unnest(tok) AS w FROM t),
         |tot AS (SELECT count(*) AS n_tokens FROM tk),
         |c AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w)
         |SELECT w, cnt, n_tokens FROM c, tot
         |WHERE cnt * 200 > n_tokens
         |ORDER BY cnt DESC, w""".stripMargin,

    "q164_budget_select" ->
      s"""WITH $scoredCte,
         |b AS (SELECT d.source, q.doc_id, q.sc AS quality_ppm, g.n_tokens
         |      FROM q JOIN g USING (doc_id) JOIN documents d USING (doc_id)),
         |w AS (SELECT *,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY quality_ppm DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_weight,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT)
         |      AS group_weight
         |  FROM b)
         |SELECT source, doc_id, quality_ppm, n_tokens, cum_weight
         |FROM w WHERE cum_weight * 10 <= group_weight * 3
         |ORDER BY source, cum_weight""".stripMargin,

    "q165_phrase_hits" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |cnt AS (SELECT s, count(*) AS cnt FROM sh GROUP BY s),
         |top AS (SELECT s, cnt FROM cnt ORDER BY cnt DESC, s DESC LIMIT 1)
         |SELECT doc_id, sh.s AS phrase, count(*) AS n_hits,
         |  top.cnt AS phrase_count
         |FROM sh JOIN top ON sh.s = top.s
         |GROUP BY doc_id, sh.s, top.cnt
         |ORDER BY doc_id""".stripMargin,

    "q166_spearman_rank" ->
      s"""WITH $scoredCte,
         |f AS (SELECT d.n_chars AS x, q.sc AS y
         |      FROM q JOIN documents d USING (doc_id)),
         |cx AS (SELECT x, count(*) AS c FROM f GROUP BY x),
         |rx AS (SELECT x, 2 * coalesce(CAST(sum(c) OVER (ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         |    + c + 1 AS r2 FROM cx),
         |cy AS (SELECT y, count(*) AS c FROM f GROUP BY y),
         |ry AS (SELECT y, 2 * coalesce(CAST(sum(c) OVER (ORDER BY y
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         |    + c + 1 AS r2 FROM cy),
         |j AS (SELECT rx.r2 AS a, ry.r2 AS b
         |      FROM f JOIN rx USING (x) JOIN ry USING (y)),
         |m AS (SELECT count(*) AS n,
         |    sum(CAST(a AS DECIMAL(38,0))) AS sx,
         |    sum(CAST(b AS DECIMAL(38,0))) AS sy,
         |    sum(CAST(a AS DECIMAL(38,0)) * CAST(a AS DECIMAL(38,0))) AS sxx,
         |    sum(CAST(b AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))) AS syy,
         |    sum(CAST(a AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))) AS sxy
         |  FROM j),
         |d AS (SELECT n,
         |    CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS num,
         |    CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS dx,
         |    CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS dy
         |  FROM m)
         |SELECT n, CASE WHEN dx > 0 AND dy > 0 THEN
         |    round(CAST(num AS DOUBLE) /
         |      sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6)
         |  END AS spearman
         |FROM d""".stripMargin,

    "q168_source_manifest" ->
      s"""WITH $scoredCte,
         |base AS (SELECT d.source, d.doc_id, d.lang, d.n_chars,
         |    g.n_tokens, q.sc AS quality_ppm,
         |    ${h32("CAST(d.doc_id AS VARCHAR) || chr(31) || d.text", 7)} AS h
         |  FROM documents d JOIN g USING (doc_id) JOIN q USING (doc_id)),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS cnt
         |  FROM base)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(sum(quality_ppm) AS BIGINT) // count(*) AS mean_quality_ppm,
         |  min(CASE WHEN rn * 2 >= cnt THEN n_chars END) AS p50_chars,
         |  CAST(sum(h) AS BIGINT) AS checksum
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q182_token_spectrum" ->
      s"""WITH $tokCte,
         |${shingleCte(3)},
         |c AS (SELECT s AS w, count(*) AS cnt FROM sh GROUP BY s)
         |SELECT CASE WHEN cnt <= 10 THEN cnt ELSE 11 END AS k,
         |  count(*) AS n_grams_with_k, CAST(sum(cnt) AS BIGINT) AS mass
         |FROM c GROUP BY 1 ORDER BY k""".stripMargin,

    "q185_component_size_dist" ->
      s"""$componentsCtes,
         |g AS (SELECT keep_id, count(*) AS sz FROM comp0 GROUP BY keep_id)
         |SELECT sz, count(*) AS n_components,
         |  CAST(sum(sz) AS BIGINT) AS n_docs
         |FROM g GROUP BY sz ORDER BY sz""".stripMargin,

    "q180_lang_confusion" ->
      s"""WITH tr AS (SELECT lang, unnest(string_split($normSql, ' ')) AS w
         |            FROM documents WHERE doc_id % 5 <> 0),
         |freq AS (SELECT lang, w, count(*) AS freq FROM tr GROUP BY lang, w),
         |tot AS (SELECT lang, count(*) AS total FROM tr GROUP BY lang),
         |rate AS (SELECT lang, w, (freq * 1000000) // total AS rate
         |         FROM freq JOIN tot USING (lang)),
         |te AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
         |       FROM documents WHERE doc_id % 5 = 0),
         |sc AS (SELECT doc_id, lang, sum(rate) AS score
         |       FROM te JOIN rate USING (w) GROUP BY doc_id, lang),
         |r AS (SELECT doc_id, lang, score, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM sc),
         |p AS (SELECT r.doc_id, d.lang AS true_lang, r.lang AS pred_lang
         |      FROM r JOIN documents d USING (doc_id) WHERE rn = 1),
         |c AS (SELECT true_lang, pred_lang, count(*) AS n
         |      FROM p GROUP BY 1, 2),
         |tt AS (SELECT true_lang, CAST(sum(n) AS BIGINT) AS tot
         |       FROM c GROUP BY true_lang)
         |SELECT true_lang, pred_lang, n, (n * 1000000) // tot AS rate_ppm
         |FROM c JOIN tt USING (true_lang)
         |ORDER BY true_lang, pred_lang""".stripMargin,

    "q181_exact_k_sample" ->
      s"""WITH r AS (SELECT source, doc_id, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY ${h32("CAST(doc_id AS VARCHAR)", 13)}, doc_id) AS rn
         |  FROM documents)
         |SELECT source, doc_id, rn FROM r WHERE rn <= 5
         |ORDER BY source, rn""".stripMargin,

    "q170_dup_provenance" ->
      s"""$componentsCtes
         |SELECT a.source = b.source AS same_source,
         |  a.lang = b.lang AS same_lang, count(*) AS n_pairs
         |FROM p JOIN documents a ON a.doc_id = p.id_a
         |       JOIN documents b ON b.doc_id = p.id_b
         |GROUP BY 1, 2 ORDER BY same_source, same_lang""".stripMargin,
  )
}
