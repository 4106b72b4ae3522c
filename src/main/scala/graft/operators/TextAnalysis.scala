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
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("lang").asc)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
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
  def qualityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(
        col("doc_id"),
        size(col("tok")).cast("bigint").as("n_tokens"),
        size(filter(col("tok"), w => array_contains(stopArr, w))).cast("bigint").as("n_stop"),
        aggregate(col("tok"), lit(0L), (acc, w) => acc + length(w)).as("sum_len"))
      .withColumn("stop_ppm", expr("(n_stop * 1000000) div n_tokens"))
      .withColumn("len_ppm",
        least(expr("(sum_len * 1000000) div (8 * n_tokens)"), lit(1000000L)))
      .withColumn("tok_ppm", least(col("n_tokens") * 10000L, lit(1000000L)))
      .withColumn("quality_ppm",
        expr("(tok_ppm * 3 + (1000000 - stop_ppm) * 4 + len_ppm * 3) div 10"))
      .select(
        col("doc_id"), col("n_tokens"),
        (expr("(n_stop * 2000000 + n_tokens) div (2 * n_tokens)")
          .cast("double") / 1000000.0).as("stop_ratio"),
        (expr("(sum_len * 2000000 + n_tokens) div (2 * n_tokens)")
          .cast("double") / 1000000.0).as("avg_token_len"),
        col("quality_ppm"),
        (col("quality_ppm").cast("double") / 1000000.0).as("quality"))
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
}
