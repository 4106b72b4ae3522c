package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Sampling, TextAnalysis}
import Q._

/** Training-data-pipeline operator suite, round 2: deterministic sampling,
  * rolling event-time aggregates, TF-IDF term salience, n-gram repetition
  * quality (SURVEY §2 LLM-pipeline extensions).
  *
  * Determinism: sampling and TF-IDF are pure integer/hash arithmetic;
  * rolling averages use exact decimal window sums ([[Q]] scaladoc).
  */
object TrainingOps {

  val queries: Map[String, QueryFn] = Map(
    // Deterministic stratified sampling: per-language rates (boost de/fr,
    // downsample en), md5-hash row selection — reruns and engines agree
    // bit-for-bit (no rand(), no sample()).
    // Source balancing: at most 10 docs per source, selected by
    // deterministic (id-hash, id) rank — rank-k selection whose map side
    // emits ≤ 10 rows per task per source (plan-gated in PlanSpec).
    "q71_source_cap" -> ((s, dir) => {
      Sampling.capPerGroup(t(s, dir, "documents"),
          "doc_id", "source", maxPerGroup = 10, seed = 7)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // α=0.5 temperature rebalancing across languages: keep-rate
    // √(min_count/count) per language, integer-ppm hash selection.
    // sqrt (unlike pow) is IEEE correctly-rounded everywhere, so the
    // DuckDB oracle draws the identical sample.
    "q72_temperature_rebalance" -> ((s, dir) => {
      Sampling.sqrtRebalance(t(s, dir, "documents"), "doc_id", "lang", seed = 17)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    "q47_stratified_sample" -> ((s, dir) => {
      Sampling.stratifiedHashSample(t(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 15, "de" -> 60, "fr" -> 60),
          defaultPct = 30, seed = 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Per-user rolling 1-hour mean over event time (RANGE frame keyed on
    // epoch micros): the scalable form of "recent activity" features —
    // one shuffle on user_id, frame scan within partition. The mean is
    // exact-decimal cents through the window sum, then integer half-up to
    // 6 decimals ((2a+b) div 2b) — round(double, 6) is not portable at the
    // half boundary (see TextAnalysis.qualityScores).
    "q48_rolling_hourly_avg" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      ev.select(
          col("user_id"), col("event_id"), col("us"),
          count(lit(1)).over(w).as("n_window"),
          (sum(col("value").cast(DecimalType(30, 2))).over(w) * 100).cast("long").as("_cents"))
        .select(
          col("user_id"), col("event_id"), col("us"), col("n_window"),
          (expr("(_cents * 20000 + n_window) div (2 * n_window)").cast("double")
            / 1000000.0).as("rolling_avg"))
        .orderBy(col("user_id"), col("us"), col("event_id"))
    }),

    // TF-IDF top-3 terms per document with integer per-million idf rates —
    // engine-exact argmax (see TextAnalysis.tfidfTopTerms).
    "q49_tfidf_top_terms" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Gopher-style repetition quality: duplicate word-bigram fraction.
    "q51_ngram_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionScores(t(s, dir, "documents"), "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    }),

    // Context-window chunking: 64-token chunks, 8-token overlap, with
    // portable chunk hashes (chunk-level dedup identity across engines).
    "q59_doc_chunking" -> ((s, dir) => {
      TextAnalysis.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 64, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Boilerplate mining: 32-token non-overlapping chunks shared by >= 2
    // distinct documents (template/header text to strip before training).
    "q62_boilerplate_mining" -> ((s, dir) => {
      TextAnalysis.boilerplateChunks(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, overlap = 0, minDocs = 2)
        .orderBy(col("chunk_hash"))
    }),

    // Deterministic global corpus shuffle (the pre-training shuffle):
    // position = rank under (id-hash, id) — identical permutation on any
    // rerun/engine. Bucketed ranking, never a single global sort window.
    "q58_corpus_shuffle" -> ((s, dir) => {
      Sampling.deterministicShuffle(t(s, dir, "documents"), "doc_id", seed = 13)
        .select(col("shuffle_pos"), col("doc_id"), col("lang"))
        .orderBy(col("shuffle_pos"))
    }),

    // Quality-weighted corpus downsampling: keep each doc with probability
    // proportional to its quality score (importance sampling). Pure
    // integer hash comparison — identical sample in every engine/rerun.
    "q57_weighted_sample" -> ((s, dir) => {
      val scored = TextAnalysis.qualityScores(t(s, dir, "documents"), "doc_id", "text")
      Sampling.weightedHashSample(scored, "doc_id", "quality_ppm", seed = 11)
        .select(col("doc_id"), col("quality_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Token-budget sequence packing (what a dataloader does before
    // concatenating samples into fixed-length training sequences): greedy
    // first-fit in id order, state reset per deterministic id-range bucket
    // — a pure function of (ids, token counts, bucket width), so the
    // sequential fold is exactly reproducible by a recursive-CTE oracle.
    "q52_sequence_packing" -> ((s, dir) => {
      import graft.operators.Packing
      val withTokens = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      Packing.packGreedy(withTokens, "doc_id", "n_tokens", tokenBudget = 512)
        .toDF()
        .select(col("pack_id"), size(col("doc_ids")).cast("bigint").as("n_docs"),
          col("total_tokens"))
        .orderBy(col("pack_id"))
    }),

    // Per-language document-length distribution: exact linear-interpolated
    // percentiles (the corpus-profiling op behind length-based filtering
    // thresholds). Exact `percentile` needs a per-group sort — fine when
    // groups are few and wide; approx_percentile is the sketch fallback at
    // extreme cardinality.
    //
    // round(…, 6) is safe HERE (unlike general double ratios): quantiles
    // of integer n_chars at p ∈ {.25, .5, .9} are a + frac·(b−a) with frac
    // having ≤ 2 decimal digits, so the exact value has ≤ 2 decimals —
    // never within ~1e-9 of a 6th-decimal half boundary, and a 1-ulp
    // cross-engine interpolation drift cannot flip the rounding.
    "q54_length_percentiles" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          round(expr("percentile(n_chars, 0.25)"), 6).as("q25"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("q50"),
          round(expr("percentile(n_chars, 0.9)"), 6).as("q90"))
        .orderBy(col("lang"))
    }),

    // q54's 100 TB shape: percentiles from fixed-width bins — ONE
    // partial-aggregating pass, per-group state bounded by the value
    // range (never corpus size), integer-exact rank thresholds. Error ≤
    // binWidth by construction (cross-checked against exact percentiles
    // in HistogramSpec).
    "q88_histogram_percentiles" -> ((s, dir) => {
      import graft.operators.Histogram
      Histogram.binPercentiles(t(s, dir, "documents"), "lang", "n_chars",
          binWidth = 50.0, ppms = Seq(250000, 500000, 900000))
        .select(col("lang"), col("p_250000").as("q25_lo"),
          col("p_500000").as("q50_lo"), col("p_900000").as("q90_lo"))
        .orderBy(col("lang"))
    }),

    // Distributional length filter: keep docs at or above their
    // language's median length, with the median read from the mergeable
    // bin histogram (q88's machinery) — selection by distributional
    // position with NO per-group sort anywhere; the median table is
    // |groups| rows and broadcasts.
    "q97_median_length_filter" -> ((s, dir) => {
      import graft.operators.Histogram
      val docs = t(s, dir, "documents")
      val med = Histogram.binPercentiles(docs, "lang", "n_chars",
          binWidth = 50.0, ppms = Seq(500000))
        .select(col("lang"), col("p_500000").as("med_lo"))
      docs.join(broadcast(med), Seq("lang"))
        .filter(col("n_chars") >= col("med_lo"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("n_chars")).as("min_len"))
        .orderBy(col("lang"))
    }),

    // Bloom-accelerated decontamination: broadcast Bloom prefilter over the
    // test-set shingle universe + exact verify — identical results to the
    // plain join (no false negatives; false positives verified away), but
    // the training shingle set is pruned at the scan instead of shuffled.
    "q53_bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.contaminated(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    }),

    // Gopher-style rule gate: per-rule booleans + combined verdict, every
    // threshold an integer cross-multiplication (no division, no floats) —
    // the filter decisions are bit-identical in any engine.
    "q63_quality_filter" -> ((s, dir) => {
      TextAnalysis.qualityFilter(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Repeated-passage removal — the transform half of q62's mining: strip
    // chunks shared by >= 2 distinct docs, report kept/removed counts and
    // the cleaned text's portable hash (chunk order restored by sort).
    "q64_passage_strip" -> ((s, dir) => {
      TextAnalysis.stripBoilerplate(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, minDocs = 2)
        .orderBy(col("doc_id"))
    }),

    // Corpus-frequency fluency proxy (the n-gram-LM perplexity-filter shape
    // with engine-exact integer rates; docs with < 2 tokens emit no row).
    "q65_bigram_fluency" -> ((s, dir) => {
      TextAnalysis.bigramFluency(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Vocabulary build (freq-ranked ids, UNK=0 below min frequency) +
    // token->id mapping: per-doc UNK counts and the id-stream hash.
    "q66_vocab_map" -> ((s, dir) => {
      TextAnalysis.vocabTokenIds(t(s, dir, "documents"), "doc_id", "text",
          minFreq = 2)
        .orderBy(col("doc_id"))
    }),

    // Epoch mixing: per-source repetition weights (0.5-2.5 epochs, derived
    // from a portable source hash so the weight table is itself
    // reproducible) materialize each doc floor(w)+Bernoulli(frac(w)) times.
    // Map-side explode — zero shuffle before the declared ORDER BY; `copy`
    // numbers the repetitions for downstream epoch interleaving.
    "q111_epoch_upsample" -> ((s, dir) => {
      import graft.functions.TextFunctions.hash32
      val weighted = t(s, dir, "documents")
        .withColumn("weight_ppm",
          lit(500000L) + hash32(col("source"), 7) % 2000000L)
      Sampling.repeatByWeight(weighted, "doc_id", "weight_ppm", seed = 19)
        .select(col("doc_id"), col("source"), col("weight_ppm"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }),

    // Contrastive negative sampling: every 10th doc anchors 3 hash-drawn
    // negatives from 16 candidate buckets — |A|·k·(|C|/16) join work, no
    // all-pairs scoring, md5-deterministic picks.
    "q134_negative_sampling" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sampling.hashNegatives(docs.filter(col("doc_id") % 10 === 0), docs,
          "doc_id", k = 3, buckets = 16)
        .orderBy(col("anchor_id").cast("bigint"), col("slot"))
    }),

    // Padding-waste audit: pad tokens burned by fixed-size-8 batches
    // under naive id-order batching vs width-64 length bucketing — the
    // dataloader-efficiency number that justifies (or not) paying q52's
    // packing shuffle. Exact integer arithmetic end to end.
    "q141_padding_waste" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).as("len"))
      graft.operators.Packing.paddingWaste(docs, "doc_id", "len",
          batchSize = 8, bucketWidth = 64)
        .orderBy(col("strategy"), col("bucket"))
    }),
  )

  private val normSql = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

  /** DuckDB spelling of TextAnalysis.qualityScores' ppm composite
    * (kept in sync with the q41 oracle). */
  private val qualityPpmCte =
    s"""t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
       |tk AS (SELECT doc_id, unnest(tok) AS w FROM t),
       |g AS (SELECT doc_id, count(*) AS nt,
       |        count(*) FILTER (w IN ('a', 'the')) AS ns,
       |        CAST(sum(length(w)) AS BIGINT) AS sl
       |      FROM tk GROUP BY doc_id),
       |q AS (SELECT doc_id,
       |  (least(nt * 10000, 1000000) * 3
       |   + (1000000 - (ns * 1000000) // nt) * 4
       |   + least((sl * 1000000) // (8 * nt), 1000000) * 3) // 10 AS quality_ppm
       |  FROM g)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q71_source_cap" ->
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#7'), 1, 8) AS BIGINT),
        |             doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    "q72_temperature_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT min(cnt) AS mn FROM c),
        |r AS (SELECT lang,
        |        CAST(floor(1000000.0 * sqrt(CAST(mn AS DOUBLE) / cnt)) AS BIGINT) AS rate_ppm
        |      FROM c, m)
        |SELECT doc_id, lang FROM documents JOIN r USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#17'), 1, 8) AS BIGINT)
        |        * 1000000 < rate_ppm * 4294967296
        |ORDER BY doc_id""".stripMargin,

    "q47_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#5'), 1, 8) AS BIGINT) % 100
        |      < (CASE WHEN lang = 'en' THEN 15 WHEN lang = 'de' THEN 60
        |              WHEN lang = 'fr' THEN 60 ELSE 30 END)
        |ORDER BY doc_id""".stripMargin,

    "q48_rolling_hourly_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |win AS (SELECT user_id, event_id, us,
        |  COUNT(*) OVER w AS n_window,
        |  CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w * 100 AS BIGINT) AS cents
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, us, n_window,
        |  CAST((cents * 20000 + n_window) // (2 * n_window) AS DOUBLE)
        |    / 1000000.0 AS rolling_avg
        |FROM win
        |ORDER BY user_id, us, event_id""".stripMargin,

    "q49_tfidf_top_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
         |             FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
         |dfc AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |sc AS (SELECT doc_id, w, CAST(tf * ((n_docs * 1000000) // df) AS BIGINT) AS score
         |       FROM tf JOIN dfc USING (w) CROSS JOIN n),
         |r AS (SELECT doc_id, w, score, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY score DESC, w ASC) AS rk FROM sc)
         |SELECT doc_id, rk, w AS term, score FROM r WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin,

    "q62_boilerplate_mining" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |s AS (SELECT doc_id, tok, len(tok) AS n,
         |        unnest(range(0, 1 + (len(tok) - 1) // 32)) AS st FROM t),
         |c AS (SELECT doc_id,
         |        tok[st * 32 + 1 : least(st * 32 + 32, n)] AS chunk FROM s),
         |h AS (SELECT doc_id,
         |  CAST('0x' || substr(md5(array_to_string(chunk, ' ') || '#0'), 1, 8) AS BIGINT)
         |    AS chunk_hash FROM c)
         |SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       min(doc_id) AS first_doc_id
         |FROM h GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin,

    "q59_doc_chunking" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |s AS (SELECT doc_id, tok, len(tok) AS n,
         |        unnest(range(0, 1 + (len(tok) - 1) // 56)) AS st FROM t),
         |c AS (SELECT doc_id, st AS chunk_idx,
         |        tok[st * 56 + 1 : least(st * 56 + 64, n)] AS chunk FROM s)
         |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
         |  CAST('0x' || substr(md5(array_to_string(chunk, ' ') || '#0'), 1, 8) AS BIGINT)
         |    AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q58_corpus_shuffle" ->
      """WITH h AS (SELECT doc_id, lang,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#13'), 1, 8) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT row_number() OVER (ORDER BY hv, doc_id) AS shuffle_pos, doc_id, lang
        |FROM h ORDER BY shuffle_pos""".stripMargin,

    "q57_weighted_sample" ->
      s"""WITH $qualityPpmCte
         |SELECT doc_id, quality_ppm FROM q
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#11'), 1, 8) AS BIGINT)
         |        * 1000000 < quality_ppm * 4294967296
         |ORDER BY doc_id""".stripMargin,

    // Mirrors Packing.packGreedy exactly: fixed-width id-range buckets from
    // the exact min/max, greedy running sum per bucket in id order via a
    // recursive CTE over the per-bucket row_number chain.
    "q52_sequence_packing" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id AS id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |b AS (SELECT min(id) AS mn, max(id) AS mx FROM d),
        |w AS (SELECT mn, greatest(1, (mx - mn + 32) // 32) AS width FROM b),
        |r AS (SELECT id, nt, (id - mn) // width AS bucket FROM d, w),
        |s AS (SELECT id, nt, bucket,
        |        row_number() OVER (PARTITION BY bucket ORDER BY id) AS rn FROM r),
        |rec(bucket, rn, id, nt, pack_first, running) AS (
        |  SELECT bucket, rn, id, nt, id, nt FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.bucket, s.rn, s.id, s.nt,
        |         CASE WHEN rec.running + s.nt > 512 THEN s.id ELSE rec.pack_first END,
        |         CASE WHEN rec.running + s.nt > 512 THEN s.nt ELSE rec.running + s.nt END
        |  FROM rec JOIN s ON s.bucket = rec.bucket AND s.rn = rec.rn + 1)
        |SELECT pack_first AS pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nt) AS BIGINT) AS total_tokens
        |FROM rec GROUP BY pack_first ORDER BY pack_id""".stripMargin,

    "q54_length_percentiles" ->
      """SELECT lang,
        |  round(quantile_cont(n_chars, 0.25), 6) AS q25,
        |  round(quantile_cont(n_chars, 0.5), 6) AS q50,
        |  round(quantile_cont(n_chars, 0.9), 6) AS q90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // q88's median CTE joined back as a keep threshold.
    "q97_median_length_filter" ->
      """WITH b AS (SELECT lang, CAST(floor(n_chars / 50.0) AS BIGINT) AS bin,
        |             count(*) AS c
        |           FROM documents GROUP BY lang, bin),
        |cc AS (SELECT lang, bin, c,
        |         sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |       FROM b),
        |med AS (SELECT lang,
        |          min(CASE WHEN cum * 1000000 >= n * 500000 THEN bin END) * 50.0 AS med_lo
        |        FROM cc GROUP BY lang)
        |SELECT lang, count(*) AS n_kept, min(n_chars) AS min_len
        |FROM documents JOIN med USING (lang)
        |WHERE n_chars >= med_lo
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Mirrors Histogram.binPercentiles: fixed-width bins, cumulative bin
    // counts, integer cross-multiplied rank thresholds, lower-edge pick.
    "q88_histogram_percentiles" ->
      """WITH b AS (SELECT lang, CAST(floor(n_chars / 50.0) AS BIGINT) AS bin,
        |             count(*) AS c
        |           FROM documents GROUP BY lang, bin),
        |cc AS (SELECT lang, bin, c,
        |         sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |       FROM b)
        |SELECT lang,
        |  min(CASE WHEN cum * 1000000 >= n * 250000 THEN bin END) * 50.0 AS q25_lo,
        |  min(CASE WHEN cum * 1000000 >= n * 500000 THEN bin END) * 50.0 AS q50_lo,
        |  min(CASE WHEN cum * 1000000 >= n * 900000 THEN bin END) * 50.0 AS q90_lo
        |FROM cc GROUP BY lang ORDER BY lang""".stripMargin,

    "q53_bloom_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |sh AS (SELECT doc_id, unnest(CASE WHEN len(tok) >= 4 THEN
         |  list_transform(range(1, len(tok) - 2),
         |    i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3])
         |  ELSE [] END) AS s FROM t),
         |hs AS (SELECT DISTINCT doc_id,
         |  CAST('0x' || substr(md5(s || '#0'), 1, 8) AS BIGINT) AS h FROM sh),
         |te AS (SELECT DISTINCT h FROM hs WHERE doc_id % 5 = 0),
         |tr AS (SELECT doc_id, h FROM hs WHERE doc_id % 5 <> 0)
         |SELECT tr.doc_id, count(*) AS n_shared
         |FROM tr JOIN te USING (h)
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    "q51_ngram_repetition" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |s AS (SELECT doc_id, CASE WHEN len(tok) >= 2 THEN
         |        list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])
         |      ELSE [] END AS sh FROM t),
         |c AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_ngrams,
         |        CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct FROM s)
         |SELECT doc_id, n_ngrams, n_distinct,
         |  CASE WHEN n_ngrams > 0
         |       THEN CAST(((n_ngrams - n_distinct) * 2000000 + n_ngrams)
         |                 // (2 * n_ngrams) AS DOUBLE) / 1000000.0
         |       ELSE 0.0 END AS rep_ratio
         |FROM c ORDER BY doc_id""".stripMargin,

    "q63_quality_filter" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |g AS (SELECT doc_id,
         |        CAST(len(tok) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct_tok,
         |        CAST(len(list_filter(tok, w -> w IN ('a', 'the'))) AS BIGINT) AS n_stop,
         |        CAST(list_sum(list_transform(tok, w -> length(w))) AS BIGINT) AS sum_len,
         |        CASE WHEN len(tok) >= 2 THEN
         |          list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])
         |        ELSE [] END AS sh
         |      FROM t),
         |c AS (SELECT doc_id, n_tokens, n_distinct_tok, n_stop, sum_len,
         |        CAST(len(sh) AS BIGINT) AS n_bg,
         |        CAST(len(list_distinct(sh)) AS BIGINT) AS n_dbg FROM g),
         |r AS (SELECT doc_id, n_tokens,
         |        (n_tokens >= 20 AND n_tokens <= 100000) AS pass_len,
         |        (sum_len >= n_tokens * 3 AND sum_len <= n_tokens * 10) AS pass_word_len,
         |        (n_stop >= 1) AS pass_stop,
         |        (n_bg = 0 OR (n_bg - n_dbg) * 10 <= n_bg) AS pass_rep,
         |        (n_distinct_tok * 2 >= n_tokens) AS pass_distinct
         |      FROM c)
         |SELECT doc_id, n_tokens, pass_len, pass_word_len, pass_stop, pass_rep,
         |       pass_distinct,
         |       (pass_len AND pass_word_len AND pass_stop AND pass_rep
         |        AND pass_distinct) AS verdict
         |FROM r ORDER BY doc_id""".stripMargin,

    "q64_passage_strip" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |s AS (SELECT doc_id, tok, len(tok) AS n,
         |        unnest(range(0, 1 + (len(tok) - 1) // 32)) AS st FROM t),
         |c AS (SELECT doc_id, st AS chunk_idx,
         |        array_to_string(tok[st * 32 + 1 : least(st * 32 + 32, n)], ' ') AS chunk_str
         |      FROM s),
         |h AS (SELECT doc_id, chunk_idx, chunk_str,
         |        CAST(len(string_split(chunk_str, ' ')) AS BIGINT) AS nct,
         |        CAST('0x' || substr(md5(chunk_str || '#0'), 1, 8) AS BIGINT) AS chunk_hash
         |      FROM c),
         |hot AS (SELECT chunk_hash FROM h GROUP BY chunk_hash
         |        HAVING count(DISTINCT doc_id) >= 2),
         |k AS (SELECT h.*, chunk_hash IN (SELECT chunk_hash FROM hot) AS boiler FROM h)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(*) FILTER (boiler) AS BIGINT) AS n_removed,
         |  CAST(coalesce(sum(nct) FILTER (NOT boiler), 0) AS BIGINT) AS n_tokens_kept,
         |  CAST('0x' || substr(md5(coalesce(
         |    array_to_string(list(chunk_str ORDER BY chunk_idx) FILTER (NOT boiler), ' '),
         |    '') || '#0'), 1, 8) AS BIGINT) AS clean_hash
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q65_bigram_fluency" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |s AS (SELECT doc_id, unnest(CASE WHEN len(tok) >= 2 THEN
         |        list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])
         |      ELSE [] END) AS bg FROM t),
         |f AS (SELECT bg, count(*) AS cnt FROM s GROUP BY bg),
         |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM f),
         |r AS (SELECT bg, CAST((cnt * 1000000) // total AS BIGINT) AS rate_ppm
         |      FROM f CROSS JOIN tt),
         |j AS (SELECT doc_id, rate_ppm FROM s JOIN r USING (bg)),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |        CAST(sum(rate_ppm) AS BIGINT) AS sum_rate FROM j GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST((2 * sum_rate + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS fluency_ppm,
         |  CAST(CAST((2 * sum_rate + n_bigrams) // (2 * n_bigrams) AS BIGINT) AS DOUBLE)
         |    / 1000000.0 AS fluency
         |FROM a ORDER BY doc_id""".stripMargin,

    "q66_vocab_map" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |tk AS (SELECT doc_id, st AS pos, tok[st + 1] AS w FROM
         |        (SELECT doc_id, tok, unnest(range(0, len(tok))) AS st FROM t)),
         |f AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w HAVING count(*) >= 2),
         |v AS (SELECT w, CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT) AS id
         |      FROM f),
         |m AS (SELECT tk.doc_id, tk.pos, coalesce(v.id, 0) AS tid, (v.id IS NULL) AS unk
         |      FROM tk LEFT JOIN v USING (w))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(*) FILTER (unk) AS BIGINT) AS n_unk,
         |  CAST('0x' || substr(md5(
         |    array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',') || '#0'),
         |    1, 8) AS BIGINT) AS ids_hash
         |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q111_epoch_upsample" ->
      """WITH w AS (SELECT doc_id, source,
        |    500000 + CAST('0x' || substr(md5(source || '#7'), 1, 8) AS BIGINT) % 2000000
        |      AS weight_ppm
        |  FROM documents),
        |k AS (SELECT doc_id, source, weight_ppm,
        |    weight_ppm // 1000000
        |    + CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#19'), 1, 8) AS BIGINT)
        |             * 1000000 < (weight_ppm % 1000000) * 4294967296
        |        THEN 1 ELSE 0 END AS n
        |  FROM w)
        |SELECT doc_id, source, weight_ppm, unnest(generate_series(1, n)) AS copy
        |FROM k WHERE n >= 1
        |ORDER BY doc_id, copy""".stripMargin,

    "q134_negative_sampling" ->
      """WITH cand AS (SELECT CAST(doc_id AS VARCHAR) AS cand_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#21'), 1, 8)
        |      AS BIGINT) % 16 AS b
        |  FROM documents),
        |an AS (SELECT CAST(doc_id AS VARCHAR) AS anchor_id
        |       FROM documents WHERE doc_id % 10 = 0),
        |sl AS (SELECT anchor_id, sx.slot,
        |    CAST('0x' || substr(md5(anchor_id || '#' || CAST(sx.slot AS VARCHAR)
        |      || '#22'), 1, 8) AS BIGINT) % 16 AS b
        |  FROM an CROSS JOIN (SELECT unnest([0, 1, 2]) AS slot) sx),
        |p AS (SELECT anchor_id, slot, cand_id,
        |    CAST('0x' || substr(md5(anchor_id || ':' || cand_id || '#23'), 1, 8)
        |      AS BIGINT) AS h
        |  FROM sl JOIN cand USING (b) WHERE cand_id <> anchor_id),
        |r AS (SELECT anchor_id, slot, cand_id, row_number() OVER (
        |        PARTITION BY anchor_id, slot ORDER BY h, cand_id) AS rn FROM p)
        |SELECT anchor_id, CAST(slot AS BIGINT) AS slot, cand_id AS neg_id
        |FROM r WHERE rn = 1
        |ORDER BY CAST(anchor_id AS BIGINT), slot""".stripMargin,

    // Mirrors Packing.paddingWaste: id-ordered batches of 8 per bucket,
    // pad-to-batch-max, all integer; hugeint sums cast back to BIGINT.
    "q141_padding_waste" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tok FROM documents),
         |l AS (SELECT doc_id AS id, CAST(len(tok) AS BIGINT) AS len FROM t),
         |b AS (SELECT 'naive' AS strategy, CAST(0 AS BIGINT) AS bucket, id, len FROM l
         |      UNION ALL
         |      SELECT 'length_bucketed', (len + 63) // 64, id, len FROM l),
         |w AS (SELECT strategy, bucket, len,
         |        (row_number() OVER (PARTITION BY strategy, bucket ORDER BY id) - 1) // 8
         |          AS batch
         |      FROM b),
         |g AS (SELECT strategy, bucket, batch,
         |        CAST(sum(len) AS BIGINT) AS real_tokens,
         |        CAST(max(len) * count(*) - sum(len) AS BIGINT) AS pad_tokens
         |      FROM w GROUP BY 1, 2, 3)
         |SELECT strategy, bucket, count(*) AS n_batches,
         |  CAST(sum(real_tokens) AS BIGINT) AS real_tokens,
         |  CAST(sum(pad_tokens) AS BIGINT) AS pad_tokens,
         |  CAST(sum(pad_tokens) * 1000000 // (sum(real_tokens) + sum(pad_tokens))
         |    AS BIGINT) AS waste_ppm
         |FROM g GROUP BY 1, 2 ORDER BY strategy, bucket""".stripMargin,
  )
}
