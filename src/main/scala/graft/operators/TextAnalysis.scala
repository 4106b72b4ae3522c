package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators (LLM-data-pipeline extension): language ID,
  * quality scoring, token statistics, document fingerprinting.
  *
  * Determinism discipline: scores that feed verdicts are integers (language
  * ID uses per-million integer rates) or single IEEE divisions of integers,
  * so results are bit-identical across engines — no float-accumulation
  * order dependence anywhere.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq("a", "the")

  /** Frequency-vote language ID. Training split supplies per-language token
    * frequencies, converted to integer per-million rates; a document's
    * score for a language is the sum of rates over its token occurrences;
    * prediction is the argmax (ties → lexicographically first language).
    *
    * The rate table is tiny (vocab x languages) → broadcast join; the big
    * side streams. */
  def languageId(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, langCol: String): DataFrame = {
    val trainTok = train.select(col(langCol).as("lang"), explode(tokens(col(textCol))).as("w"))
    val freq = trainTok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("freq"))
    // per-language totals derive exactly from the (much smaller) freq
    // table — Σ freq per lang ≡ token count — saving a second full
    // explode+shuffle over the training corpus
    val tot = freq.groupBy(col("lang")).agg(sum(col("freq")).as("total"))
    val rate = freq.join(tot, "lang")
      .select(col("lang"), col("w"), expr("(freq * 1000000) div total").as("rate"))
    val testTok = test.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
    val scores = testTok.join(broadcast(rate), "w")
      .groupBy(col("doc_id"), col("lang")).agg(sum(col("rate")).as("score"))
    // per-doc argmax (score DESC, lang ASC) as ONE map-side-combined
    // aggregate (round 12) — the retired row_number window paid an
    // exchange + sort over the whole (doc, lang) score table; the
    // min_by ordering (-score, lang) is unique per row (lang is in it),
    // so the pick is deterministic and identical
    scores.groupBy(col("doc_id"))
      .agg(min_by(struct(col("lang"), col("score")),
        struct((-col("score")).as("s"), col("lang").as("l"))).as("m"))
      .select(col("doc_id"), col("m.lang").as("pred_lang"), col("m.score").as("score"))
  }

  /** CCNet-style language-model quality filter (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): per-document cross-entropy under a reference-corpus bigram
    * LM — low bits/token ≈ fluent reference-like text, high ≈ boilerplate
    *, gibberish or the wrong domain; CCNet buckets the crawl by exactly
    * this score (they use a 5-gram KenLM; the bigram form is the same
    * decision statistic at shuffle-join scale). Complements
    * [[bigramLmScore]] — the earlier probability-ppm readout that avoided
    * transcendentals before the fixed-point log2 existed; this is the
    * log-domain (bits/bigram) form CCNet actually buckets on.
    *
    * Engine-exact: p(w2|w1) = (c(w1w2)+1) / (c(w1·)+V) in add-one
    * smoothing, carried as a parts-per-billion integer, and the ONLY
    * transcendental — the log — is [[graft.functions.FixedPoint]]'s
    * pure-int64 fixed-point log2: per-bigram surprisal_fp =
    * log2fp(10⁹) − log2fp(p_ppb) = −log2(p)·2^16 (+ quantization ≤
    * ~1.5e-5 bits), so the whole filter hash-matches the DuckDB oracle.
    * p_ppb ∈ [1, 10⁹] by construction (c12 ≤ c1 and V ≥ 1), so the
    * surprisal is non-negative and the log2fp domain holds. Prefixes
    * whose mass exceeds ppb resolution (c1 + V > 10⁹ — reference
    * corpora at the 100 TB scale this filter targets) switch per-row to
    * the scale-free wide-log form log2w(c1+V) − log2w(c12+1), exact at
    * any int64 count; rows within ppb keep the round-8 arithmetic
    * verbatim.
    *
    * Output, one row per doc (including docs with < 2 tokens):
    * (doc_id, n_bigrams, bits_fp) — bits_fp = mean surprisal per bigram
    * in 2^-16 log2 units (≈ bits/token · 65536); 0 when no bigrams.
    *
    * Scale shape: the LM side is two map-side-combined aggregates over
    * the reference corpus (bigram counts + their prefix rollup) and a
    * 1-row vocab stat; scoring is one explode + two equi-joins on the
    * gram string (broadcast while the LM vocabulary fits, shuffle-hash
    * beyond) + one per-doc rollup. Nothing is quadratic; nothing sorts
    * globally. */
  def lmSurprisal(docs: DataFrame, lmCorpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    import graft.functions.FixedPoint.log2FpSparkSql
    val lmTok = lmCorpus.select(tokens(col(textCol)).as("tok"))
    val lmBi = lmTok.select(explode(shingles(col("tok"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val lmPrefix = lmBi
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vStat = lmTok.select(explode(col("tok")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
    val scoredDocs = toks
      .select(col("doc_id"), explode(shingles(col("tok"), 2)).as("bg"))
      .join(lmBi, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(lmPrefix, Seq("w1"), "left")
      .crossJoin(broadcast(vStat))
      // greatest(..., 1): an EMPTY LM corpus has v = 0 and no prefixes,
      // so c1v would be 0 and the ppb quotient divides by zero (an ANSI
      // error, not a NULL, under Spark 4 defaults). The guard floors it
      // at 1 -> p_ppb = 1e9 -> surprisal 0 bits: "an empty model prices
      // nothing". For any non-empty LM v >= 1 and the guard is a
      // bit-exact no-op; the DuckDB chains carry the same floor.
      .selectExpr("doc_id",
        "coalesce(c12, 0) + 1 AS c12p",
        "greatest(coalesce(c1, 0) + v, CAST(1 AS BIGINT)) AS c1v")
      .transform(surprisalFromCounts)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sur")).as("_ss"))
      .withColumn("bits_fp", expr("_ss div n_bigrams"))
    toks.select(col("doc_id")).join(scoredDocs, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bits_fp"), lit(0L)).as("bits_fp"))
  }

  /** The per-bigram surprisal term of [[lmSurprisal]] from staged
    * (doc_id, c12p = c12+1, c1v = c1+V) count columns — factored so the
    * branch past the ppb ceiling is unit-testable with fabricated
    * counts. Within ppb resolution (c1v ≤ 10⁹): VERBATIM the round-8
    * quotient arithmetic, sur = log2fp(10⁹) − log2fp(p_ppb). Past it
    * (round 8 failed loudly there — exactly the 100 TB reference-corpus
    * scale this filter targets), the rate scale cancels out of −log2(p),
    * so the term switches per-row to the scale-free wide-log difference
    * log2w(c1v) − log2w(c12p), exact at any int64 prefix mass. */
  private[graft] def surprisalFromCounts(staged: DataFrame): DataFrame = {
    import graft.functions.FixedPoint._
    staged
      .selectExpr("doc_id", "c1v <= 1000000000 AS _fits",
        "CASE WHEN c1v <= 1000000000 THEN (c12p * 1000000000) div c1v ELSE 1 END AS p_ppb",
        s"${wideShiftSparkSql("c12p")} AS c12p_s",
        s"${wideMantissaSparkSql("c12p")} AS c12p_m",
        s"${wideShiftSparkSql("c1v")} AS c1v_s",
        s"${wideMantissaSparkSql("c1v")} AS c1v_m")
      .selectExpr("doc_id",
        s"""CASE WHEN _fits THEN 1959352 - ${log2FpSparkSql("p_ppb")}
           | ELSE ${wideFromStagedSparkSql("c1v_s", "c1v_m")}
           |    - ${wideFromStagedSparkSql("c12p_s", "c12p_m")}
           | END AS sur""".stripMargin.replaceAll("\n", " "))
  }

  /** CCNet's perplexity-bucket partition (Wenzek et al. 2020 §4.3): the
    * corpus split into head / middle / tail thirds by LM surprisal —
    * head = the most-fluent-under-the-LM third — which downstream
    * mixing samples at different rates (CCNet keeps head+middle by
    * default; `kept` records that verdict).
    *
    * Boundaries are WHOLE-BIN at `binWidth` fixed-point units
    * ([[graft.operators.Corpus.dsirScores]]'s top-slice discipline): the
    * per-doc scores histogram into a bounded bin table (bits_fp spans
    * ~0..2²¹ at width 256 → ≤ 8k bins), the cumulative walk over THAT
    * table places the ⅓ and ⅔ cuts, and every doc in a boundary bin
    * gets the boundary bin's bucket — deterministic, bin-granular, and
    * no document-level global sort anywhere (an `ntile` over the corpus
    * would be a single-partition sort — the thing this shape exists to
    * avoid at 100 TB).
    *
    * Output, one row per doc: (doc_id, n_bigrams, bits_fp, bucket,
    * kept). Scale shape: [[lmSurprisal]]'s linear passes, the per-doc
    * score table checkpointed once (scoped; doc-count-sized), one
    * bounded-bin histogram + broadcast joins. */
  def perplexityBuckets(docs: DataFrame, lmCorpus: DataFrame,
      idCol: String, textCol: String, binWidth: Int = 256): DataFrame = {
    require(binWidth > 0)
    val scored = lmSurprisal(docs, lmCorpus, idCol, textCol)
      .localCheckpoint(eager = true) // three consumers: count, bins, readout
    val nDocs = scored.agg(count(lit(1)).as("nd"))
    val bins = scored
      .groupBy(expr(s"bits_fp div $binWidth").as("_bin"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_cum", sum(col("_n")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_bin"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .crossJoin(broadcast(nDocs))
      .select(col("_bin"),
        when(col("_cum") <= expr("nd div 3"), lit("head"))
          .when(col("_cum") <= expr("(2 * nd) div 3"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
    scored
      .join(broadcast(bins), expr(s"bits_fp div $binWidth") === col("_bin"))
      .select(col("doc_id"), col("n_bigrams"), col("bits_fp"),
        col("bucket"), (col("bucket") =!= "tail").as("kept"))
  }

  /** Length/stopword/word-shape quality heuristics + a [0,1] composite.
    * Entirely narrow (array expressions per row) — zero shuffles, scales
    * embarrassingly.
    *
    * All scoring is integer parts-per-million arithmetic: `round(double,6)`
    * is NOT portable at the half boundary (Spark rounds the shortest
    * decimal repr half-up, DuckDB rounds in binary float math — they
    * disagree when a ratio of small integers lands exactly on ...5, seen
    * at sf0.1). Integer `div` and the `(2a+b) div 2b` half-up trick give
    * bit-identical results in every engine; the exposed doubles are a
    * single exact division by 10^6. */
  def qualityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityScores(docs, idCol, textCol, Nil)

  /** [[qualityScores]] with pass-through columns: `carry` columns ride
    * the same single narrow pass, so a caller needing (score, source) or
    * (score, n_chars) does NOT pay a corpus self-join on the id to
    * re-attach them (round 13, §3 join elimination — ~10 declared
    * queries joined docs back onto this output for one column). Rows and
    * score values are identical to the carry-free form by construction
    * (same projection, same tokenless-doc filter). */
  def qualityScores(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String]): DataFrame = {
    docs
      .select(Seq(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
        ++ carry.map(col): _*)
      // Tokenless docs carry no quality signal and are EXCLUDED, by an
      // explicit rule shared with the oracle: a NULL text tokenizes to a
      // NULL array here but to zero `unnest` rows in the SQL mirror —
      // without this filter the Spark side would emit a NULL-stats row
      // (size(NULL) → NULL, every ppm NULL via div) that the oracle
      // never sees (round-11 ADVICE, the q259 AUC denominator). A
      // whitespace-only text is NOT this case: it tokenizes to one
      // empty token in both engines and scores normally.
      .filter(size(col("tok")) > 0)
      .select(
        Seq(col("doc_id"),
          size(col("tok")).cast("bigint").as("n_tokens"),
          graft.internal.Bridge.column(graft.functions.StopCount(
            graft.internal.Bridge.expression(col("tok")), stopwords)).as("n_stop"),
          graft.internal.Bridge.column(graft.functions.SumTokenLengths(
            graft.internal.Bridge.expression(col("tok")))).as("sum_len"))
          ++ carry.map(col): _*)
      .withColumn("stop_ppm", expr("(n_stop * 1000000) div n_tokens"))
      .withColumn("len_ppm",
        least(expr("(sum_len * 1000000) div (8 * n_tokens)"), lit(1000000L)))
      .withColumn("tok_ppm", least(col("n_tokens") * 10000L, lit(1000000L)))
      .withColumn("quality_ppm",
        expr("(tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) div 10"))
      .select(
        Seq(col("doc_id"), col("n_tokens"),
          (expr("(n_stop * 2000000 + n_tokens) div (2 * n_tokens)")
            .cast("double") / 1000000.0).as("stop_ratio"),
          (expr("(sum_len * 2000000 + n_tokens) div (2 * n_tokens)")
            .cast("double") / 1000000.0).as("avg_token_len"),
          col("quality_ppm"),
          (col("quality_ppm").cast("double") / 1000000.0).as("quality"))
          ++ carry.map(col): _*)
  }

  /** Whitespace token count, subword-ish segment count, distinct tokens. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("bigint").as("n_ws_tokens"),
      subwordCount(col(textCol)).as("n_subword"),
      size(array_distinct(tokens(col(textCol)))).cast("bigint").as("n_distinct"))

  /** Winnowing-style fingerprint: the `k` smallest distinct 32-bit hashes
    * of word `n`-gram shingles, ascending. Documents shorter than `n`
    * tokens produce no row. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, k: Int = 5): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), n)).as("sh"))
      .select(col("doc_id"), hash32(col("sh"), 0).as("h"))
      .groupBy(col("doc_id"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("fingerprint"))

  /** [[fingerprints]] in exploded scalar form: one row per (doc, rank),
    * rank 1..k over the ascending distinct hashes. Array-free output for
    * engines/verifiers that only order scalar cells. */
  def fingerprintRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, k: Int = 5): DataFrame =
    fingerprints(docs, idCol, textCol, n, k)
      .select(col("doc_id"), posexplode(col("fingerprint")).as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).cast("bigint").as("rk"), col("h"))

  /** TF-IDF top-`k` terms per document with engine-exact integer scoring:
    * idf is the per-million integer rate `(N · 10^6) div df` and the score
    * is `tf · idfRate` (bigint) — argmax is bit-identical everywhere, the
    * same trick as [[languageId]]. Ties break lexicographically.
    *
    * Shape: two shuffles (per-doc tf, corpus df), df table broadcast back —
    * the classic scalable TF-IDF dataflow. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
    val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfc = tok.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfc), "w")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * expr("(n_docs * 1000000) div df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("bigint").as("rk"),
        col("w").as("term"), col("score"))
  }

  /** Context-window chunking — split documents into token chunks of
    * `chunkSize` with `overlap` tokens carried between consecutive chunks
    * (what a pretraining pipeline does before packing samples into fixed
    * windows). Chunk i covers tokens [i·stride, i·stride + chunkSize),
    * stride = chunkSize − overlap; the tail chunk may be short. Entirely
    * narrow (per-row array expressions, zero shuffles), and the chunk
    * hash is md5-portable, so chunk identity is stable across engines —
    * chunk-level dedup composes directly with [[Dedup.exactGroups]].
    * Output: (doc_id, chunk_idx, n_chunk_tokens, chunk_hash). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), col("tok"),
        expr(s"1 + (size(tok) - 1) div $stride").as("n_chunks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1),
          s => slice(col("tok"), s * stride + 1, lit(chunkSize)))).as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("bigint").as("chunk_idx"),
        size(col("chunk")).cast("bigint").as("n_chunk_tokens"),
        hash32(array_join(col("chunk"), " "), 0).as("chunk_hash"))
  }

  /** Boilerplate mining — repeated-passage detection across the corpus
    * (the C4/RefinedWeb step that strips shared headers, footers, and
    * template text): chunk every document ([[chunkTokens]]), then find
    * chunk hashes appearing in at least `minDocs` DISTINCT documents.
    * One shuffle on the 8-byte chunk hash; the distinct-doc count is a
    * partial-aggregating groupBy. Returns (chunk_hash, n_docs,
    * first_doc_id) — join back on the hash to strip or down-weight the
    * passages. */
  def boilerplateChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 0, minDocs: Int = 2): DataFrame =
    chunkTokens(docs, idCol, textCol, chunkSize, overlap)
      .groupBy(col("chunk_hash"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc_id"))
      .filter(col("n_docs") >= minDocs)

  /** Rule-based document filter (the Gopher/C4 pre-training gate): each
    * document gets one boolean per rule plus the combined verdict, so a
    * pipeline can either hard-filter (`verdict`) or audit per-rule drop
    * rates. Rules: token-count bounds, mean-word-length bounds [3,10],
    * stopword presence, duplicate-bigram fraction <= 10%, distinct-token
    * fraction >= 50% (reference rule set: Rae et al., Gopher App. A).
    *
    * Every threshold is an integer cross-multiplication (`sum_len >= 3*n`
    * instead of `sum_len/n >= 3.0`) — no division, no floats, bit-identical
    * verdicts in any engine. Zero shuffles: one narrow pass. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 20, maxTokens: Long = 100000): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), col("tok"), shingles(col("tok"), 2).as("sh"))
      .select(
        col("doc_id"),
        size(col("tok")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("tok"))).cast("bigint").as("n_distinct_tok"),
        size(filter(col("tok"), w => array_contains(stopArr, w))).cast("bigint").as("n_stop"),
        aggregate(col("tok"), lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
        size(col("sh")).cast("bigint").as("n_bigrams"),
        size(array_distinct(col("sh"))).cast("bigint").as("n_distinct_bg"))
      .withColumn("pass_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("pass_word_len",
        col("sum_len") >= col("n_tokens") * 3L && col("sum_len") <= col("n_tokens") * 10L)
      .withColumn("pass_stop", col("n_stop") >= 1L)
      .withColumn("pass_rep",
        col("n_bigrams") === 0L ||
          (col("n_bigrams") - col("n_distinct_bg")) * 10L <= col("n_bigrams"))
      .withColumn("pass_distinct", col("n_distinct_tok") * 2L >= col("n_tokens"))
      .withColumn("verdict",
        col("pass_len") && col("pass_word_len") && col("pass_stop") &&
          col("pass_rep") && col("pass_distinct"))
      .select(col("doc_id"), col("n_tokens"), col("pass_len"),
        col("pass_word_len"), col("pass_stop"), col("pass_rep"),
        col("pass_distinct"), col("verdict"))
  }

  /** Repeated-passage removal — the transform half of [[boilerplateChunks]]
    * (C4/RefinedWeb: strip template headers/footers shared across pages).
    * Chunks every document (non-overlapping, `chunkSize` tokens), finds
    * chunk hashes present in >= `minDocs` DISTINCT documents, and removes
    * those chunks; per document it reports chunk counts and the portable
    * hash of the cleaned text (kept chunks re-joined in chunk order).
    *
    * Scale shape: one narrow chunking pass; the hot-chunk table is tiny by
    * construction (only passages shared across documents) so the marking
    * join broadcasts; one groupBy on doc_id. Chunk order is restored with
    * `array_sort` over (chunk_idx, chunk) structs — `collect_list` order is
    * not deterministic across shuffles, the sort is what makes the cleaned
    * hash engine-exact. */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 32, minDocs: Int = 2): DataFrame = {
    require(chunkSize > 0 && minDocs >= 2, s"chunkSize=$chunkSize minDocs=$minDocs")
    val chunks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), col("tok"),
        expr(s"1 + (size(tok) - 1) div $chunkSize").as("n_chunks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1),
          st => array_join(slice(col("tok"), st * chunkSize + 1, lit(chunkSize)), " ")))
          .as(Seq("chunk_idx", "chunk_str")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_str"),
        size(split(col("chunk_str"), " ")).cast("bigint").as("n_chunk_tokens"),
        hash32(col("chunk_str"), 0).as("chunk_hash"))
    val hot = chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("chunk_hash"), lit(true).as("is_boiler"))
    chunks
      .join(broadcast(hot), Seq("chunk_hash"), "left")
      .withColumn("keep", col("is_boiler").isNull)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("keep"), col("n_chunk_tokens")).otherwise(0L)).as("n_tokens_kept"),
        // null structs (removed chunks) are skipped by collect_list — the
        // sorted survivor list is exactly the kept chunks in chunk order
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("chunk_idx"), col("chunk_str"))))),
            s => s.getField("chunk_str")),
          " ").as("clean_text"))
      .select(col("doc_id"), col("n_chunks"), col("n_removed"),
        col("n_tokens_kept"), hash32(col("clean_text"), 0).as("clean_hash"))
  }

  /** Corpus-frequency fluency proxy (the shape of n-gram LM perplexity
    * filtering, CCNet-style, with engine-exact arithmetic): train word-bigram
    * frequencies on the corpus itself, score each document by the mean
    * per-million corpus rate of its bigrams — low scores mark atypical
    * (garbled or off-domain) text. True log-perplexity would sum
    * `ln(p)` floats whose libm values differ across engines; the rate mean
    * ranks documents the same way for filtering and is bit-identical
    * everywhere (integer half-up mean, single exact final division).
    *
    * Scale shape: two aggregations (bigram counts; per-doc score); the rate
    * table is left to AQE — broadcast while the bigram vocabulary is small,
    * shuffle-hash once it isn't (at web scale the Zipf tail can be truncated
    * upstream by a `cnt >= k` filter without moving the ranking).
    * Documents with fewer than 2 tokens have no bigrams and produce no row. */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), 2)).as("bg"))
    val freq = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    // corpus total derives from the (much smaller) freq table, same trick
    // as languageId — no second pass over the exploded corpus
    val tot = freq.agg(sum(col("cnt")).as("total"))
    val rate = freq.crossJoin(broadcast(tot))
      .select(col("bg"), expr("(cnt * 1000000) div total").as("rate_ppm"))
    bg.join(rate, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("rate_ppm")).as("sum_rate"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(2 * sum_rate + n_bigrams) div (2 * n_bigrams)").as("fluency_ppm"))
      .withColumn("fluency", col("fluency_ppm").cast("double") / 1000000.0)
  }

  /** Frequency-ranked vocabulary: tokens with corpus frequency >= `minFreq`,
    * id = rank under (freq desc, token asc), 1-based (0 is reserved for
    * UNK). Broadcast-sized by contract — it is the mapping table of
    * [[vocabTokenIds]] and the static side of streaming tokenization. */
  def vocabulary(docs: DataFrame, textCol: String, minFreq: Long): DataFrame = {
    val freq = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
    val rankW = Window.orderBy(col("cnt").desc, col("w").asc)
    freq.withColumn("id", row_number().over(rankW).cast("bigint"))
      .select(col("w"), col("id"))
  }

  /** Frequency-ranked vocabulary + token→id mapping (the tokenize-to-ids
    * step before packing): vocabulary = tokens with corpus frequency >=
    * `minFreq`, id = rank under (freq desc, token asc), id 0 reserved for
    * UNK. Per document: token count, UNK count, and the portable hash of
    * the comma-joined id sequence in token order — the id stream's identity,
    * checkable against any other engine's tokenization of the same corpus.
    *
    * The ranking window runs over the *aggregated* vocabulary, which is
    * orders of magnitude smaller than the corpus (and must fit broadcast
    * anyway for the mapping join) — a single-partition sort there is the
    * standard, correct trade. The corpus itself sees one narrow pass plus
    * one groupBy on doc_id. */
  def vocabTokenIds(docs: DataFrame, idCol: String, textCol: String,
      minFreq: Long = 2): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    tok.join(broadcast(vocabulary(docs, textCol, minFreq)), Seq("w"), "left")
      .withColumn("tid", coalesce(col("id"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_unk"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("tid")))),
            s => s.getField("tid").cast("string")),
          ",").as("ids_str"))
      .select(col("doc_id"), col("n_tokens"), col("n_unk"),
        hash32(col("ids_str"), 0).as("ids_hash"))
  }

  /** Repetition scoring (a Gopher-style quality rule): fraction of
    * duplicate word `n`-grams per document. Zero-shuffle narrow
    * computation — the whole signal is array expressions per row. The
    * ratio is integer half-up to 6 decimals ((2a+b) div 2b), not
    * round(double, 6) — the half-boundary portability rule
    * ([[qualityScores]]). */
  def repetitionScores(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), shingles(col("tok"), n).as("sh"))
      .select(
        col("doc_id"),
        size(col("sh")).cast("bigint").as("n_ngrams"),
        size(array_distinct(col("sh"))).cast("bigint").as("n_distinct"))
      .withColumn("rep_ratio",
        when(col("n_ngrams") > 0,
          expr("((n_ngrams - n_distinct) * 2000000 + n_ngrams) div (2 * n_ngrams)")
            .cast("double") / 1000000.0)
          .otherwise(lit(0.0)))

  /** Token-diversity (Simpson) concentration per document, the no-libm
    * complement to entropy: the unbiased Simpson index
    * `D = Σ c_i(c_i−1) / (n(n−1))` is the probability two tokens drawn
    * without replacement are the same type — 0 for all-distinct text,
    * →1 for one token repeated. Pure integer rational arithmetic carried
    * in ppm (entropy needs `log`, whose libm rounding differs across
    * engines; Simpson is exact everywhere), so the oracle hash-matches
    * bit-for-bit. One narrow pass: per-doc token counts aggregate to the
    * two moments (n, Σc²) without materializing the count vector. */
  /** Per-document n-gram novelty: the share (ppm) of a doc's distinct
    * shingles whose FIRST corpus occurrence (lowest doc id = crawl order)
    * is this doc — the marginal-content diagnostic for an incremental
    * crawl: a feed whose novelty decays is re-collecting what the corpus
    * already holds, however the per-doc dedup verdicts look. One shuffle
    * keyed on the shingle hash (the TF-IDF df-table shape: first-owner is
    * a min aggregate, never a window over the posting list) plus the
    * per-doc readout groupBy; all-integer output. Docs with < n tokens
    * have no shingles and no row. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = docs
      // materialize tok first: the shingles() lambda references it ~3n
      // times and a Generate input is outside codegen CSE, so the inline
      // form re-runs the regex split per reference (see shingles scaladoc)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), n)).as("s0"))
      .select(col("doc_id"), hash32(col("s0"), 0).as("s"))
      .distinct()
    val first = sh.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_shingles"))
  }

  /** Gopher-style repetition quality rules, token-occurrence analogs of
    * the char-fraction originals (Rae et al. 2021 §A1.1: a document is
    * low-quality when one n-gram dominates or long n-grams repeat): per
    * doc, the most-frequent token's share of token occurrences
    * (`top1_ppm`), the most-frequent bigram's share of bigram positions
    * (`top2_ppm`), the share of trigram positions whose trigram occurs
    * more than once (`dup3_ppm`), and the combined pass verdict under
    * the given thresholds. Integer ppm everywhere — engine-exact.
    *
    * Scale shape: ONE explode emits all three gram orders tagged (n, g)
    * — grams travel as 32-bit hashes (the [[Dedup.shingleJaccard]]
    * discipline: 8-byte shuffle keys, per-doc collisions negligible) —
    * then one (doc, n, gram)-keyed count, one (doc, n) rollup, and a
    * conditional-aggregate pivot to one row per doc. Two map-side-
    * combinable shuffles total, both keyed by doc id; nothing corpus-
    * global. Sub-bigram/trigram docs coalesce those stats to 0. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      maxTop1Ppm: Long = 200000L, maxTop2Ppm: Long = 180000L,
      maxDup3Ppm: Long = 300000L): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
    val grams = toks.select(col("doc_id"), explode(concat(
        transform(shingles(col("tok"), 1), g => struct(lit(1).as("n"), g.as("g"))),
        transform(shingles(col("tok"), 2), g => struct(lit(2).as("n"), g.as("g"))),
        transform(shingles(col("tok"), 3), g => struct(lit(3).as("n"), g.as("g")))))
        .as("x"))
      .select(col("doc_id"), col("x.n").as("ng"), hash32(col("x.g"), 0).as("g"))
    val stats = grams
      .groupBy(col("doc_id"), col("ng"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("ng"))
      .agg(max(col("c")).as("mx"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"),
        sum(col("c")).as("tot"))
    stats.groupBy(col("doc_id")).agg(
        max(when(col("ng") === 1, col("mx"))).as("max1"),
        max(when(col("ng") === 1, col("tot"))).as("tot1"),
        max(when(col("ng") === 2, col("mx"))).as("max2"),
        max(when(col("ng") === 2, col("tot"))).as("tot2"),
        max(when(col("ng") === 3, col("dup"))).as("dup3"),
        max(when(col("ng") === 3, col("tot"))).as("tot3"))
      .select(col("doc_id"), col("tot1").as("n_tokens"),
        expr("max1 * 1000000 div tot1").as("top1_ppm"),
        coalesce(expr("max2 * 1000000 div tot2"), lit(0L)).as("top2_ppm"),
        coalesce(expr("dup3 * 1000000 div tot3"), lit(0L)).as("dup3_ppm"))
      .withColumn("passes",
        col("top1_ppm") <= maxTop1Ppm && col("top2_ppm") <= maxTop2Ppm &&
          col("dup3_ppm") <= maxDup3Ppm)
  }

  /** Per-document Shannon token entropy in fixed-point log2 units
    * (2^-16 bits/token) — the information-density quality signal
    * (boilerplate and keyword-stuffed docs sit far below fluent prose of
    * the same length, and entropy tracks the burstiness the Gopher
    * repetition rules threshold piecewise). [[simpsonDiversity]] was
    * this metric's explicitly-documented no-libm stand-in; the pure-int64
    * fixed-point log2 ([[graft.functions.FixedPoint]]) makes the real
    * thing portable: H = Σ (c/n)·log2(n/c) computed as the exact integer
    * Σ c·(log2fp(n) − log2fp(c)) div n (counts are the log inputs — no
    * rate scaling needed, and c ≤ n < 2^31 keeps the domain).
    *
    * Output: (doc_id, n_tokens, n_distinct, entropy_fp); single-token
    * docs land at 0 exactly (log2fp is exact at c = n). Scale shape:
    * one explode, one (doc, token) count, one per-doc rollup — the q42
    * token-count shape with a log attached. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.FixedPoint.log2FpSparkSql
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        collect_list(col("c")).as("_cs"))
      // log2fp(n_tokens) is constant per doc — hoist it into a column so
      // the per-element lambda evaluates one fold per DISTINCT token,
      // not two (log2FpSparkSql is a ~60-node expression)
      .selectExpr("doc_id", "n_tokens", "n_distinct", "_cs",
        s"${log2FpSparkSql("n_tokens")} AS _ln")
      .selectExpr("doc_id", "n_tokens", "n_distinct",
        s"""aggregate(_cs, CAST(0 AS BIGINT),
           | (acc, c) -> acc + c * (_ln -
           |   ${log2FpSparkSql("c")})) div n_tokens AS entropy_fp"""
          .stripMargin.replaceAll("\n", " "))
  }

  def simpsonDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * (col("c") - 1)).as("_rep2"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        when(col("n_tokens") > 1,
          expr("_rep2 * 1000000 div (n_tokens * (n_tokens - 1))"))
          .otherwise(lit(0L)).as("simpson_ppm"))

  /** Token burstiness (Church-Gale overdispersion): per token, the
    * variance-to-mean ratio of its per-document count ACROSS ALL docs —
    * zero-occurrence docs included, which is what separates bursty
    * topical words (VMR >> 1: absent almost everywhere, repeated where
    * present) from Poisson-ish function words (VMR ~ 1). The zeros never
    * materialize: over N docs with per-doc counts c,
    *
    *   VMR = ((N·Σc² − (Σc)²)·10^6) div (N·Σc)
    *
    * needs only the nonzero (token, doc) rows plus the 1-row corpus doc
    * count. Top-`k` tokens by total occurrences (ties by token) keep the
    * output bounded.
    *
    * Scale shape: one (token, doc) groupBy (map-combined), one
    * vocabulary-sized token rollup, a broadcast 1-row N attach, and a
    * TakeOrderedAndProject for the top-k — never a corpus-wide sort.
    * Magnitudes: N·Σc² fits int64 to ~10^9 docs of ~10^5-occurrence
    * tokens; past that lift to decimal(38,0). */
  def tokenBurstiness(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val perToken = tf.groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("_ss"))
    val n = docs.agg(countDistinct(col(idCol)).as("_n"))
    perToken.crossJoin(broadcast(n))
      .select(col("w"), col("n_docs"), col("total"),
        expr("(_n * _ss - total * total) * 1000000 div (_n * total)")
          .as("vmr_ppm"))
      .orderBy(col("total").desc, col("w"))
      .limit(k)
  }

  /** BM25 batch retrieval: top-`k` documents for a fixed query-term set,
    * Okapi scoring with the repo's engine-exact integer discipline. The
    * true Okapi idf is `ln((N-df+0.5)/(df+0.5))` — a libm float that
    * differs across engines; here idf is the per-million inverse rate
    * `(N·10^6) div df` (the [[tfidfTopTerms]] trick), which preserves the
    * rare-term weighting BM25 needs while staying bit-identical anywhere.
    * The tf saturation and length normalization are the real Okapi forms,
    * carried in ppm fixed-point:
    *
    *   len_ppm  = dl·10^12 div avgdl_ppm,  avgdl_ppm = tot·10^6 div N
    *   norm_ppm = 10^6 − b_ppm + (b_ppm·len_ppm) div 10^6
    *   tfc_ppm  = f·(10^6+k1_ppm)·10^6 div (f·10^6 + (k1_ppm·norm_ppm) div 10^6)
    *   score    = Σ_t (idf_ppm(t) · tfc_ppm(t)) div 10^6        (f > 0 only)
    *
    * Scale shape: per-row term counts and document length are narrow array
    * expressions (no token explode, no shuffle); corpus stats (N, Σdl, df
    * per query term) are ONE map-side-combined row broadcast back; global
    * top-k is Spark's TakeOrderedAndProject — never a full sort. The only
    * wide stage in the whole plan is the 1-row stats aggregate.
    * Magnitudes: dl·10^12 and tot·10^6 must fit in int64 — fine to ~10^6
    * avg tokens/doc and ~10^12 corpus tokens; past that, lift the two
    * products to decimal(38,0). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1Ppm: Long = 1200000L, bPpm: Long = 750000L): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.forall(_.matches("[^'\\\\]+")), "terms must be plain words")
    val S = 1000000L
    val withTf = queryTerms.zipWithIndex.foldLeft(
      docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
        .withColumn("dl", size(col("tok")).cast("bigint"))) {
      case (d, (term, i)) =>
        d.withColumn(s"_f$i",
          size(filter(col("tok"), x => x === lit(term))).cast("bigint"))
    }.drop("tok")
    val statCols =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_tokens")) ++
        queryTerms.indices.map(i =>
          sum(when(col(s"_f$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val normed = withTf
      .crossJoin(broadcast(stats))
      .withColumn("len_ppm",
        expr(s"(dl * $S * $S) div ((tot_tokens * $S) div n_docs)"))
      .withColumn("norm_ppm",
        expr(s"$S - $bPpm + ($bPpm * len_ppm) div $S"))
    val termScore = queryTerms.indices.map { i =>
      expr(s"""CASE WHEN _f$i > 0 THEN
        (((n_docs * $S) div _df$i) *
         ((_f$i * ($S + $k1Ppm) * $S) div
          (_f$i * $S + ($k1Ppm * norm_ppm) div $S))) div $S
        ELSE 0 END""")
    }.reduce(_ + _)
    normed.withColumn("score_ppm", termScore.cast("bigint"))
      .filter(col("score_ppm") > 0)
      .orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("dl"), col("score_ppm"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the token-adjacency graph — undirected edges between consecutive
    * tokens, weighted by corpus co-occurrence count — a fixed number of
    * power iterations, damping d. The float PageRank recurrence is
    * carried in ppm fixed-point (`pr` starts at 10^6; per-edge
    * contribution `(pr·w) div W_u`; update `(1−d) + d·Σcontrib` as
    * `150000 + (850000·Σ) div 10^6`), so every iteration is pure integer
    * arithmetic — bit-identical ranks in any engine, no libm, no
    * convergence-test nondeterminism.
    *
    * Scale shape: edge extraction is one narrow zip pass + one groupBy on
    * the (u,v) pair key; the graph is vocabulary-sized — orders smaller
    * than the corpus — so the per-iteration join broadcasts (AQE picks
    * shuffle-hash if the vocabulary outgrows broadcast). `iters` is fixed:
    * no per-round convergence check, one lazy plan, exactly one job at the
    * sink — the q38 lesson (never pay a count() per round) applied. Tokens
    * that never co-occur (single-token documents) have no edges, no rank. */
  def textRankKeywords(docs: DataFrame, idCol: String, textCol: String,
      iters: Int = 10, k: Int = 10, dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 1 && k >= 1, s"iters=$iters k=$k")
    val S = 1000000L
    val basePpm = S - dampPpm
    val pairs = docs
      .select(tokens(col(textCol)).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(explode(arrays_zip(
        slice(col("tok"), lit(1), size(col("tok")) - 1).as("a"),
        slice(col("tok"), lit(2), size(col("tok")) - 1).as("b"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    val edges = pairs
      .groupBy(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .agg(count(lit(1)).as("w"))
    // Round 13 (§2.2): localCheckpoint, not cache — the checkpointed RDD
    // inherits the AQE-coalesced partitioning (a few byte-sized
    // partitions for a vocab-sized graph) where a cached plan pins the
    // raw shuffle-partition count, so the 10 iteration stages each ran
    // 64-97 tiny tasks of pure scheduling overhead (q114 was 1.7× FASTER
    // on 8 cores than 32). Partition count now scales with the graph's
    // bytes at any corpus size — nothing is local-tuned.
    val sym = edges.select(col("u"), col("v"), col("w"))
      .union(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .localCheckpoint(eager = false)
    val deg = sym.groupBy(col("u")).agg(sum(col("w")).as("wu"))
      .localCheckpoint(eager = false)
    val ranks0 = deg.select(col("u").as("node"), lit(S).as("pr"))
    val ranked = (1 to iters).foldLeft(ranks0) { (ranks, _) =>
      sym
        .join(ranks, sym("u") === ranks("node"))
        .join(deg, "u")
        .select(col("v"), expr("(pr * w) div wu").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("sc"))
        .select(col("v").as("node"),
          expr(s"$basePpm + ($dampPpm * sc) div $S").as("pr"))
    }
    ranked
      .orderBy(col("pr").desc, col("node").asc)
      .limit(k)
      .select(col("node").as("term"), col("pr").cast("bigint").as("rank_ppm"))
  }

  /** BPE merge training (the tokenizer-training core of an LLM data
    * pipeline): learn the first `nMerges` byte-pair-encoding merge rules
    * from the corpus, Sennrich-style — repeatedly count adjacent symbol
    * pairs over the word-frequency table, pick the most frequent pair
    * (tie-break: lexicographic), fuse it everywhere, repeat.
    *
    * Segmentations live in a flat string encoding — `' a  b  c '`
    * (symbols double-space-separated, single-space sentinels) — chosen so
    * that applying a merge is ONE `replace(seg, ' a  b ', ' ab ')`:
    * both Spark's and DuckDB's `replace` scan left-to-right non-overlapping
    * and resume after the replacement, which is exactly the greedy BPE
    * application order, and the space anchoring makes a match possible
    * only on true symbol boundaries (TextAnalysisSpec proves the fold
    * equivalence, overlap runs included). Everything stays engine-exact:
    * pair counts are integers and the argmax ordering is binary-collated
    * strings, so the learned rules are oracle-hash-checkable.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * groupBy); every iteration after that runs on the vocabulary-sized
    * segmentation table — a pair-count groupBy plus a 1-row argmax
    * broadcast back as the merge to apply. `localCheckpoint` keeps the
    * per-iteration lineage flat (the q38 lesson: no compounding plans,
    * no per-round convergence job). Returns `(step, lhs, rhs,
    * pair_count)` — the ordered merge-rule artifact a tokenizer ships. */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int = 10, driverMaxWords: Long = 1L << 18): DataFrame = {
    // The per-iteration argmax is a 1-row pull and the learned-rule table
    // is nMerges rows — the ONLY driver loop in the codebase, provably
    // bounded by this cap (production BPE vocabularies are trained
    // offline; this operator is the in-pipeline merge-rule learner for
    // tokenizer COST measurement, where a handful of merges suffices).
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges must be in [1, 64] (driver-loop bound), got $nMerges")
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        array_join(expr("regexp_extract_all(w, '.', 0)"), "  "),
        lit(" ")).as("seg"), col("freq"))
    var cur = words.localCheckpoint()
    // Round-13: the iteration table is VOCABULARY-sized (distinct words),
    // and the distributed loop below costs 2 eager jobs per merge (argmax
    // + replace-checkpoint) = ~2·nMerges jobs of pure latency on a table
    // that is usually a few MB. When the vocab is driver-sized, collect
    // (seg, freq) once and learn the merges locally — the same bounded-
    // collect discipline as the k-core peel / CC union-find (guide §5:
    // the driver may do bounded work; job COUNT is what a busy cluster
    // multiplies). Semantics are replicated exactly: adjacent-pair counts
    // weighted by freq, argmax by (count desc, lhs asc, rhs asc) with
    // lhs/rhs compared as UTF-8 BYTES (Spark's binary string collation —
    // Java's String#compareTo differs on supplementary code points), and
    // Java String#replace, which scans left-to-right non-overlapping and
    // resumes after each replacement — the same greedy fold contract as
    // Spark's UTF8String.replace (TextAnalysisSpec pins local ≡
    // distributed on the overlap-run and tie fixtures). Vocabularies past
    // `driverMaxWords` (10-100M distinct words at crawl scale) keep the
    // distributed loop — the 100 TB path is unchanged.
    if (cur.count() <= driverMaxWords) {
      def u8cmp(x: String, y: String): Int = {
        val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val d = (a(i) & 0xff) - (b(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        a.length - b.length
      }
      var segs = cur.collect().map(r => (r.getString(0), r.getLong(1)))
      val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= nMerges && !exhausted) {
        val counts = new java.util.HashMap[(String, String), Long]()
        segs.foreach { case (seg, freq) =>
          val sym = seg.trim.split("  ")
          var i = 0
          while (i < sym.length - 1) {
            val k = (sym(i), sym(i + 1))
            counts.put(k, counts.getOrDefault(k, 0L) + freq)
            i += 1
          }
        }
        if (counts.isEmpty) exhausted = true // mirrors the empty-argmax
        else {                               // crossJoin emptying the table
          var best: ((String, String), Long) = null
          counts.forEach { (p, c) =>
            if (best == null || c > best._2 ||
              (c == best._2 && {
                val d = u8cmp(p._1, best._1._1)
                d < 0 || (d == 0 && u8cmp(p._2, best._1._2) < 0)
              })) best = (p, c)
          }
          val (a, b) = best._1
          segs = segs.map { case (seg, freq) =>
            (seg.replace(s" $a  $b ", s" $a$b "), freq)
          }
          rules += ((step, a, b, best._2))
        }
        step += 1
      }
      return docs.sparkSession.createDataFrame(rules.toSeq)
        .toDF("step", "lhs", "rhs", "pair_count")
    }
    val steps = (1 to nMerges).map { step =>
      val best = cur
        .select(split(trim(col("seg")), "  ").as("sym"), col("freq"))
        .filter(size(col("sym")) >= 2)
        .select(explode(arrays_zip(
          slice(col("sym"), lit(1), size(col("sym")) - 1).as("a"),
          slice(col("sym"), lit(2), size(col("sym")) - 1).as("b"))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
        .limit(1)
        .localCheckpoint()
      cur = cur.crossJoin(broadcast(best))
        .select(expr(
          "replace(seg, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ')")
          .as("seg"), col("freq"))
        .localCheckpoint()
      best.select(lit(step).as("step"), col("a").as("lhs"),
        col("b").as("rhs"), col("pair_count"))
    }
    steps.reduce(_ unionByName _)
  }

  /** Apply learned BPE merge rules ([[bpeMerges]] output) to the corpus:
    * per document, the subword count after all merges plus the token and
    * char counts and the subwords-per-char rate — the compression
    * measurement that tells a pipeline how many model tokens a corpus
    * costs under a tokenizer.
    *
    * Merges never cross a word boundary (a merge pattern anchors on
    * single-space flanks around a double-space separator inside one
    * word's segmentation), so a document's subword count is exactly the
    * sum of its words' subword counts — and BPE therefore encodes the
    * DISTINCT-WORD table, not each document. That is the classic BPE
    * implementation trick and the 100 TB shape: the chained `replace`
    * string scans run once per vocabulary entry (sub-linear in corpus
    * size; Zipf reuse makes vocab ≪ token count — measured 54k distinct
    * words vs 6.6M token occurrences at sf0.1, a ~120× cut in string
    * work; q127 7.5 s → ~1 s clean), while the corpus side is one
    * (doc, word)-keyed count and one vocab-keyed join of integer
    * per-word sizes.
    *
    * Scale shape: the rule list is nMerges rows — driver-sized by
    * construction — so collecting it to build the expression chain is a
    * bounded pull; the corpus pays one map-combined groupBy on
    * (doc_id, word), the vocab table pays the replace chain, and the
    * join back is equi on the word (no broadcast assumption: vocab at
    * crawl scale is 10-100M rows, AQE picks the strategy). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val rules = merges.select(col("step"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getAs[Int]("step"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    // per-WORD segmentation (single-space sentinels, double-space symbol
    // separators) — identical encoding to bpeMerges' training table, so
    // the greedy replace chain applies with the same semantics
    val seg0 = concat(lit(" "),
      array_join(regexp_extract_all(col("w"), lit("."), lit(0)), "  "),
      lit(" "))
    val segN = rules.foldLeft(seg0) { case (seg, (a, b)) =>
      replace(seg, lit(s" $a  $b "), lit(s" $a$b "))
    }
    val words = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val vocab = words.select(col("w")).distinct()
      .select(col("w"), length(col("w")).cast("bigint").as("_wchars"),
        size(split(trim(segN), " +")).cast("bigint").as("_wsubs"))
    // the distinct shrinks map-side to vocab size, so AQE broadcasts the
    // encoded vocab back onto the token stream at any realistic vocab
    // (falling back to a w-keyed shuffle join beyond that), and the
    // doc rollup is one map-combined shuffle
    val perDoc = words.join(vocab, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_wchars")).as("n_chars"),
        sum(col("_wsubs")).as("n_subwords"))
    // docs with zero tokens still appear, with zero counts (and a null
    // ppm rate) — same contract as the old whole-document encode
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
      .withColumn("subwords_per_char_ppm",
        expr("(n_subwords * 1000000) div nullif(n_chars, 0)"))
  }

  /** Held-out bigram language-model scoring (the perplexity-style quality
    * filter, e.g. CCNet's KenLM gate): a conditional bigram model with
    * Laplace smoothing is fit on `train` and each `holdout` document is
    * scored by its per-bigram probability p(w2|w1) = (c12+1)/(c1+V) in
    * integer ppm (truncating division, engine-portable). Reported per doc:
    * bigram count, half-up mean ppm, and the minimum ppm (the "most
    * surprising transition" — a one-bad-sentence detector the mean dilutes).
    * Unlike [[bigramFluency]] (joint rate of the doc's own corpus), this is
    * a TRAINED conditional model applied to unseen text.
    *
    * The LOG-domain form of this filter — true cross-entropy in
    * bits/bigram, CCNet's actual bucketing statistic — is
    * [[lmSurprisal]] (round 8): the fixed-point int64 log2
    * ([[graft.functions.FixedPoint]]) removed the no-transcendental
    * constraint this operator's probability-mean readout worked around.
    * Both stay declared: the ppm probabilities here feed minimum-ppm
    * ("worst transition") readouts that a log mean dilutes.
    *
    * Determinism: all integer arithmetic until the final cosmetic double.
    *
    * Scale shape: ONE aggregation over the exploded train bigrams builds
    * c12; the prefix counts c1 derive from that (much smaller) count table,
    * not from a second corpus pass; the vocabulary size is one distinct
    * count over train tokens (bigram keys alone would miss single-token
    * docs). Scoring is two equi-joins on compact string keys (AQE
    * broadcasts the rate tables while they fit) plus a map-side-combinable
    * per-doc aggregate. Docs with < 2 tokens have no bigrams and produce
    * no row. */
  def bigramLmScore(train: DataFrame, holdout: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def bigrams(df: DataFrame) = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_tok"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("_tok"), lit(1), greatest(size(col("_tok")) - 1, lit(0))),
        slice(col("_tok"), lit(2), greatest(size(col("_tok")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_bg"))
      .select(col("doc_id"), col("_bg.w1"), col("_bg.w2"))
    val c12 = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // vocabulary = distinct train tokens; w2 of the LAST bigram covers the
    // final token of each doc, so distinct(w1 ∪ w2) equals it for docs with
    // bigrams — single-token docs contribute their token via a w1-less
    // union from the (tiny) c12 table's key space plus those stragglers.
    val vocab = train
      .select(explode(tokens(col(textCol))).as("w")).distinct()
      .agg(count(lit(1)).as("v"))
    bigrams(holdout)
      .join(c12, Seq("w1", "w2"), "left_outer")
      .join(c1, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        expr("((coalesce(c12, 0L) + 1) * 1000000) div (coalesce(c1, 0L) + v)")
          .as("ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("ppm")).as("_sum"), min(col("ppm")).as("min_ppm"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(2 * _sum + n_bigrams) div (2 * n_bigrams)").as("avg_ppm"),
        col("min_ppm"))
  }

  /** Tokenizer fertility per group (typically language): subwords per
    * whitespace word and characters per subword — the standard measure of
    * how efficiently a tokenizer covers each language (high fertility =
    * the language pays more sequence length per word). Uses the
    * deterministic subword segmentation ([[graft.functions.TextFunctions
    * .subwordCount]], the engine's BPE pre-tokenization stand-in) so the
    * whole measurement is exact integer arithmetic.
    *
    * Scale shape: one map-side-combined groupBy on the group key — output
    * is group-cardinality-sized regardless of corpus size. */
  def tokenizerFertility(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    docs.select(col(groupCol).as("grp"),
        size(tokens(col(textCol))).cast("bigint").as("nw"),
        subwordCount(col(textCol)).as("ns"),
        length(regexp_replace(normText(col(textCol)), " ", "")).cast("bigint").as("nc"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("ns")).as("n_subwords"),
        sum(col("nc")).as("n_chars"))
      .select(col("grp"), col("n_docs"), col("n_words"), col("n_subwords"),
        col("n_chars"),
        expr("(n_subwords * 1000000) div n_words").as("fertility_ppm"),
        expr("(n_chars * 1000000) div greatest(n_subwords, 1)")
          .as("chars_per_subword_ppm"))

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): hash every token into one of `buckets` feature buckets,
    * estimate the target and raw bucket distributions, and weight each raw
    * document by how target-like its tokens are. Log-free integer form:
    * the per-bucket target/raw rate ratio (add-1 smoothed)
    *
    *   r_ppm(b) = ((ct(b)+1) · (Nr+B) · 10^6) div ((cr(b)+1) · (Nt+B))
    *
    * and the document weight is the round-half-up mean of r_ppm over its
    * token occurrences — >10^6 means "more likely under the target than
    * the raw distribution" (the paper's resampling acceptance direction).
    * The ratio mean replaces the paper's log-likelihood-ratio sum so every
    * step stays in exact integer arithmetic (cross products in
    * decimal(38), exact at any corpus size) — no transcendental whose
    * rounding could differ across engines. The paper's ACTUAL estimator —
    * log-likelihood-ratio scores over unigram+bigram features, plus the
    * selection step — is [[graft.operators.Corpus.dsirScores]] (round 8),
    * which the fixed-point int64 log2 ([[graft.functions.FixedPoint]])
    * made portable; this ratio form stays declared as the
    * overflow-immune decimal(38) variant.
    *
    * Scale shape: the bucket tables are `buckets` rows built by ONE
    * map-side-combined pass over each side; totals derive from the bucket
    * tables (never a second corpus pass); scoring is a broadcast join of
    * the `buckets`-row rate table onto the exploded raw tokens plus a
    * map-side-combinable per-doc agg. Empty text normalizes to the single
    * empty token (split convention), so every raw doc gets a row. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 1024): DataFrame = {
    def bucketed(df: DataFrame) = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .select(col("doc_id"), pmod(hash32(col("w"), 7), lit(buckets.toLong)).as("b"))
    val rawB = bucketed(raw)
    val tb = bucketed(target).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rb = rawB.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val totals = rb.agg(sum(col("cr")).as("nr"))
      .crossJoin(tb.agg(sum(col("ct")).as("nt")))
    val rates = rb.join(tb, Seq("b"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"), expr(
        s"(CAST(coalesce(ct, 0L) + 1 AS DECIMAL(38,0)) * (nr + $buckets) * 1000000)" +
        s" div (CAST(cr + 1 AS DECIMAL(38,0)) * (nt + $buckets))")
        .cast("long").as("r_ppm"))
    rawB.join(broadcast(rates), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r_ppm")).as("_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(2 * _sum + n_tokens) div (2 * n_tokens)").as("weight_ppm"))
      .withColumn("target_like", col("weight_ppm") >= 1000000L)
  }

  /** Zipf/head-heaviness audit of the token distribution — one summary
    * row: vocabulary size, token mass, the top-1 token's share (ppm), and
    * the number of distinct tokens needed to cover 50/90/99% of all token
    * occurrences. The coverage knee is the practical "how much of this
    * corpus is boilerplate vocabulary" signal behind tokenizer sizing and
    * stopword-list choices.
    *
    * Scale shape: the corpus-sized work is one `groupBy(token)` shuffle;
    * everything after runs over the VOCABULARY (≪ corpus, bounded by
    * distinct tokens), where a single ordered window is broadcast-class
    * work by construction — same discipline as [[Normalize.featureScale]]'s
    * bucket-offset table. All thresholds are integer cross-multiplications
    * (`cum·100 ≥ tot·99`), no float shares until the final readout. */
  def zipfCoverage(docs: DataFrame, textCol: String): DataFrame = {
    val vf = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = vf.agg(
      count(lit(1)).as("n_vocab"), sum(col("cnt")).as("n_tokens"))
    val ord = Window.orderBy(col("cnt").desc, col("w"))
    vf
      .withColumn("rk", row_number().over(ord).cast("bigint"))
      .withColumn("cum", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .agg(
        max(col("n_vocab")).as("n_vocab"),
        max(col("n_tokens")).as("n_tokens"),
        max(when(col("rk") === 1,
          expr("cnt * 1000000 div n_tokens"))).as("top1_ppm"),
        min(when(col("cum") * 2 >= col("n_tokens"), col("rk"))).as("k50"),
        min(when(col("cum") * 10 >= col("n_tokens") * 9, col("rk"))).as("k90"),
        min(when(col("cum") * 100 >= col("n_tokens") * 99, col("rk"))).as("k99"))
  }

  /** Exact heavy hitters, two-pass: tokens whose frequency strictly
    * exceeds `n_tokens / k`.
    *
    * Pass 1 folds the stream through the Misra-Gries summary
    * ([[graft.functions.FrequentItems]], k−1 counters) AND the total count
    * in ONE aggregate — bounded O(k) state per partition, merged on the
    * driver side of a map-side-combined agg, guaranteed to retain every
    * token with freq > n/k. Pass 2 exactly recounts ONLY the ≤ k−1
    * candidates via a broadcast semi-join and keeps those that truly clear
    * the threshold — so the output is exact and deterministic even though
    * the intermediate sketch is merge-order-dependent.
    *
    * At 100 TB this shuffles `partitions × k` rows + the candidate
    * recount, vs a full-vocabulary `groupBy(token)` whose shuffle is the
    * vocabulary itself; it is also the shape that survives a skewed
    * vocabulary (the hot tokens are exactly what the sketch keeps). */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import graft.functions.GraftFunctions.freq_items
    val tk = docs.select(explode(tokens(col(textCol))).as("w"))
    // one-row pass-1 result (total + ≤ k−1 candidates); localCheckpoint so
    // the two consumers below don't re-run the corpus scan
    val pass1 = tk
      .agg(count(lit(1)).as("n_tokens"), freq_items(col("w"), k - 1).as("cand"))
      .localCheckpoint()
    val cands = pass1.select(explode(col("cand")).as("w"))
    tk.join(broadcast(cands), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(pass1.select(col("n_tokens"))))
      .filter(col("cnt") * k > col("n_tokens"))
      .select(col("w"), col("cnt"), col("n_tokens"))
  }

  /** Exact phrase-occurrence mining: finds the corpus's most frequent
    * token `n`-gram (ties → lexicographically last) and returns every
    * document containing it with its occurrence count — the
    * inverted-index-with-positions retrieval primitive (phrase search)
    * driven by a corpus-derived phrase so the whole thing is closed-form
    * testable. Candidate generation and probe are both equi-joins on the
    * shingle string; the argmax is a bounded `max(struct(cnt, s))`
    * aggregate, never a vocabulary sort. */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // two consumers (argmax + probe) — pin the shingle table so the
    // corpus tokenizes once (same discipline as Dedup.shared); tok is
    // materialized before shingles() so the Generate input doesn't
    // re-run the regex split per lambda reference (see shingles scaladoc)
    val sh = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), n)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = sh.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
      .agg(max(struct(col("cnt"), col("s"))).as("m"))
      .select(col("m.s").as("s"), col("m.cnt").as("phrase_count"))
    sh.join(broadcast(top), Seq("s"))
      .groupBy(col("doc_id"), col("s"), col("phrase_count"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("s").as("phrase"), col("n_hits"),
        col("phrase_count"))
  }
}
