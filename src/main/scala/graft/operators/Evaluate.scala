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

  /** Reliability (calibration) table: `nBins` fixed-width bins over the
    * integer score range `[lo, hi]`; per bin the observed positive rate
    * in ppm. A well-calibrated score has `pos_rate_ppm` tracking the bin
    * midpoint. One map-side-combined groupBy on the bin id — the output
    * is `nBins` rows regardless of corpus size; empty bins are absent
    * (they have no observed rate). */
  def calibrationBins(df: DataFrame, labelCol: Column, scoreCol: String,
      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, s"nBins=$nBins range=[$lo,$hi]")
    df
      .filter(col(scoreCol) >= lo && col(scoreCol) <= hi)
      .withColumn("bin",
        least(lit(nBins - 1L),
          expr(s"(($scoreCol - $lo) * $nBins) div (${hi - lo})"))
          .cast("bigint"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(labelCol, 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000000) div n").as("pos_rate_ppm"))
  }

  /** Pearson chi-squared statistic for independence of two categorical
    * columns, in exact integer arithmetic: with cell count O, row total
    * r, column total c and grand total N,
    *
    *   chi2 = Σ (O − r·c/N)² / (r·c/N)  =  Σ (O·N − r·c)² / (N·r·c)
    *
    * emitted as `chi2_ppm = Σ ((O·N − r·c)²·10^6) div (N·r·c)` — one
    * integer division per OBSERVED cell, no float expectation values.
    * (Absent cells — O = 0 — contribute r·c/N each; their total is
    * added algebraically as `(N − Σ_observed r·c/N)`-free form below.)
    *
    * Scale shape: one corpus groupBy on the (a, b) cell key; row/column
    * totals derive from the cell table (never a second corpus pass) and
    * join back onto it — all category-cardinality-sized. The squared
    * terms run in decimal(38) (int128 in DuckDB), so O·N up to ~10^19
    * is exact; per-term floor division defines the ppm rounding.
    * Returns one row (n, n_cells, chi2_ppm, chi2). */
  def chiSquared(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val colT = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n_total"))
    // zero-count cells contribute (r·c/N)² / (r·c/N) = r·c/N each; the
    // full zero-cell sum is Σ_all r·c/N − Σ_observed r·c/N = N − Σ_obs r·c/N
    // (in ppm: N·10^6 − Σ (r·c·10^6) div N), so absent cells are handled
    // without materializing them
    val d = "CAST(o AS DECIMAL(38,0)) * n_total - CAST(r AS DECIMAL(38,0)) * c"
    cells
      .join(rowT, "a").join(colT, "b")
      .crossJoin(broadcast(n))
      .agg(
        max(col("n_total")).as("n"),
        count(lit(1)).as("n_cells"),
        sum(expr(s"(($d) * ($d) * 1000000)" +
          " div (CAST(n_total AS DECIMAL(38,0)) * r * c)")).as("obs_ppm"),
        sum(expr("(CAST(r AS DECIMAL(38,0)) * c * 1000000) div n_total"))
          .as("obs_exp_ppm"))
      .select(col("n"), col("n_cells"),
        (col("obs_ppm") + col("n") * 1000000L - col("obs_exp_ppm"))
          .as("chi2_ppm"))
      .withColumn("chi2", col("chi2_ppm").cast("double") / 1000000.0)
  }
}
