package graft.operators

import org.apache.spark.sql.DataFrame
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
}
