package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Corpus preparation — the end-to-end training-data cleanse composing the
  * individual operators (the capstone of the LLM-pipeline extension):
  *
  *   1. exact dedup: keep the lowest doc id per canonical text;
  *   2. near-dup removal: MinHash+LSH pairs at >= `minJaccard`; the higher
  *      id of each pair is dropped (keep-first policy; pair-wise, not
  *      transitive-closure — connected components would need an iterative
  *      step, out of scope for a single pass);
  *   3. quality floor: composite score >= `minQuality`;
  *   4. deterministic hash split (train/test, `trainPct`%).
  *
  * Every stage is a shuffle-lean reuse of [[Dedup]] / [[TextAnalysis]]; the
  * whole pipeline is oracle-reproducible (declared as q37).
  */
object Corpus {

  def prepare(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minJaccard: Double = 0.5, minQuality: Double = 0.65,
      trainPct: Int = 80, splitSeed: Int = 9): DataFrame = {
    // 1. exact dedup winners
    val exactKeep = Dedup.exactGroups(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    // 2. near-dup losers (higher id of each verified pair)
    val nearLosers = Dedup.nearDupPairs(docs, idCol, textCol, minJaccard = minJaccard)
      .select(col("id_b").as(idCol)).distinct()
    // 3. quality scores (ppm integers; the floor compares in integer space
    // so the cut is engine-exact)
    val quality = TextAnalysis.qualityScores(docs, idCol, textCol)
      .select(col("doc_id").as(idCol), col("quality_ppm"), col("quality"))

    docs.select(col(idCol))
      .join(exactKeep, Seq(idCol), "left_semi")
      .join(nearLosers, Seq(idCol), "left_anti")
      .join(quality, Seq(idCol))
      .filter(col("quality_ppm") >= math.round(minQuality * 1000000))
      .withColumn("split",
        when(hash32(col(idCol).cast("string"), splitSeed) % 100 < trainPct, "train")
          .otherwise("test"))
      .select(col(idCol), col("split"), col("quality"))
  }

  /** Round-5 curation capstone — [[prepare]] upgraded with the directed
    * and distribution-aware operators: exact-dedup winners, near-dup
    * losers dropped, CONTAINMENT-dominated docs dropped (a snippet
    * living whole inside a surviving bigger doc — invisible to the
    * Jaccard stages), surviving docs carrying their 1/component-size
    * loss weight, the quality cut taken on the cross-source
    * QUANTILE-NORMALIZED score (so one threshold means the same thing
    * for every source), and the split keyed on the near-dup COMPONENT
    * label (clusters land whole in one split — no leakage).
    *
    * Containment-removal determinism: drop `a` when a ⊂ b unless the
    * containment is mutual with `a` the lower id (mutual containment =
    * equal shingle sets; exactly one of the pair survives). The
    * near-dup pair set is computed once and persisted — components,
    * weights and the loser set all read it. */
  def curate(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source",
      minJaccard: Double = 0.5, contNum: Int = 9, contDen: Int = 10,
      minNormPpm: Long = 500000L, trainPct: Int = 80,
      splitSeed: Int = 9): DataFrame = {
    val exactKeep = Dedup.exactGroups(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    // ONE corpus tokenize+shingle pass, persisted, fanned out to both the
    // near-dup and the containment stage (each standalone operator pays
    // its own pass; composed here they must not pay it twice)
    val sets = Dedup.shingleSets(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.nearDupPairsFromSets(sets, minJaccard = minJaccard)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearLosers = pairs.select(col("id_b").as(idCol)).distinct()
    val comps = Dedup.nearDupGroups(pairs)
    val labeled = docs.select(col(idCol).as("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("keep_id"), col("doc_id")).as("comp"))
    val sizes = labeled.groupBy(col("comp")).agg(count(lit(1)).as("comp_size"))
    val weights = labeled.join(sizes, Seq("comp"))
      .select(col("doc_id").as(idCol), col("comp"),
        expr("1000000 div comp_size").as("weight_ppm"))
    val cont = Dedup.containmentPairsFromSets(sets, contNum, contDen)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contDominated = cont.as("p")
      .join(cont.as("m"),
        col("m.id_a") === col("p.id_b") && col("m.id_b") === col("p.id_a"),
        "left")
      .filter(col("m.id_a").isNull || col("p.id_a") > col("p.id_b"))
      .select(col("p.id_a").as(idCol)).distinct()
    val scored = docs.select(col(idCol), col(sourceCol))
      .join(TextAnalysis.qualityScores(docs, idCol, textCol)
        .select(col("doc_id").as(idCol), col("quality_ppm")), Seq(idCol))
    val norm = Normalize.quantileNormalize(scored, idCol, sourceCol, "quality_ppm")
      .select(col(idCol), col("norm_quality_ppm"))
    docs.select(col(idCol))
      .join(exactKeep, Seq(idCol), "left_semi")
      .join(nearLosers, Seq(idCol), "left_anti")
      .join(contDominated, Seq(idCol), "left_anti")
      .join(weights, Seq(idCol))
      .join(norm, Seq(idCol))
      .filter(col("norm_quality_ppm") >= minNormPpm)
      .withColumn("split",
        when(hash32(col("comp").cast("string"), splitSeed) % 100 < trainPct,
          "train").otherwise("test"))
      .select(col(idCol), col("split"), col("comp"), col("weight_ppm"),
        col("norm_quality_ppm"))
  }

  /** Token-budget corpus mixing — "give me the best `budget_s` tokens of
    * each source" (the dataset-curation step that hits per-source token
    * targets: 30% code / 50% web / ... of a fixed training budget).
    *
    * Selection is by QUALITY-BIN THRESHOLD, not per-document cumulative
    * sort: the naive shape — a running token sum over each source's docs
    * ordered by quality — puts a source's ENTIRE corpus through one
    * window task (a dominant source = one straggler owning 80% of 100 TB).
    * Instead, docs aggregate into (source, quality_ppm) bins — integer
    * ppm scores make bins exact — and only the bin table (≤ 1e6 rows per
    * source, independent of corpus size) sees a window. Docs themselves
    * cross the shuffle once, on the same (source, quality_ppm) key the
    * final membership join uses.
    *
    * Whole-bin semantics: bins are taken best-first while the cumulative
    * token count fits the budget; the first bin that doesn't fit stops
    * the take (no partial bins, no doc-level tie-breaking) — deterministic
    * and engine-portable by construction.
    *
    * `budgets`: (source, token_budget). Output: one row per selected doc
    * (doc_id, source, quality_ppm, n_tokens). */
  def tokenBudgetMix(
      docs: DataFrame, budgets: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(TextAnalysis.qualityScores(docs, idCol, textCol)
        .select(col("doc_id"), col("n_tokens"), col("quality_ppm")), Seq("doc_id"))
    val bins = scored.groupBy(col("source"), col("quality_ppm"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    val kept = bins
      .withColumn("cum_tokens", sum(col("bin_tokens")).over(
        Window.partitionBy(col("source"))
          .orderBy(col("quality_ppm").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("cum_tokens") <= col("token_budget"))
      .select(col("source"), col("quality_ppm"))
    scored.join(kept, Seq("source", "quality_ppm"), "left_semi")
      .select(col("doc_id"), col("source"), col("quality_ppm"), col("n_tokens"))
  }

  /** Budgets proportional to each source's own token volume (`pct`% of
    * it) — the self-scaling parameterization the declared query uses. */
  def proportionalBudgets(
      docs: DataFrame, pct: Int,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(TextAnalysis.qualityScores(docs, idCol, textCol)
        .select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(expr(s"sum(n_tokens) * $pct div 100").as("token_budget"))
}
