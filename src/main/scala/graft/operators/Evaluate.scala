package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/score evaluation over labeled data (the measurement half of a
  * training pipeline: did the quality score / anomaly score / retrieval
  * score actually rank positives above negatives?).
  *
  * Determinism discipline: scores are grouped by their exact stored value
  * (no arithmetic on them, so both engines see identical bits), all pair
  * counting is integer, ties are counted exactly, and the single division
  * happens once at readout in ppm — bit-identical AUC in any engine.
  */
object Evaluate {

  /** Binary AUC by the Mann-Whitney pair count, computed from the
    * per-distinct-score class histogram — never a per-row rank:
    *
    *   AUC = (concordant + ties/2) / (n_pos · n_neg)
    *   concordant = Σ_s n_pos(s) · n_neg(< s),  ties = Σ_s n_pos(s) · n_neg(s)
    *
    * emitted as `auc_ppm = ((2·conc + ties)·10^6) div (2·n_pos·n_neg)`.
    *
    * Scale shape: one groupBy on the score value (corpus-sized shuffle,
    * map-side combined), then a window over the DISTINCT-score table —
    * orders of magnitude smaller than the corpus. If even the distinct
    * table outgrows one sort, bucket scores first ([[Histogram]]) and
    * trade exactness for a bin-width AUC bound; the pair algebra is
    * unchanged. Returns one row:
    * (n_pos, n_neg, concordant, tied, auc_ppm, auc). */
  def binaryAuc(df: DataFrame, labelCol: Column, scoreCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("sc"))
      .agg(
        sum(when(labelCol, 1L).otherwise(0L)).as("np"),
        sum(when(labelCol, 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g
      .withColumn("negs_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        sum(col("np") * col("negs_below")).as("concordant"),
        sum(col("np") * col("nn")).as("tied"))
      .select(
        col("n_pos"), col("n_neg"), col("concordant"), col("tied"),
        expr("((2 * concordant + tied) * 1000000) div (2 * n_pos * n_neg)")
          .as("auc_ppm"))
      .withColumn("auc", col("auc_ppm").cast("double") / 1000000.0)
  }
}
