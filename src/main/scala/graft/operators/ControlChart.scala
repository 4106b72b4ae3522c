package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sequential control charts over per-key event series — the classic
  * statistical-process-control detectors (EWMA chart, two-sided CUSUM)
  * the reference's z-score path (`pipeline/anomaly_detection.py:47-73`)
  * approximates with a memoryless test. Both are order-sensitive
  * recurrences, which Spark's unordered aggregation cannot express
  * directly; here each key's series is folded left-to-right with the
  * `aggregate` higher-order function over its time-ordered value array.
  *
  * Scale shape: ONE groupBy on the key — the only corpus-sized shuffle;
  * the fold runs inside codegen over a per-key array whose length is the
  * key's series length (bounded upstream by windowing/retention — the
  * same bound every per-key state op in this engine assumes; chunk by
  * (key, day) for unbounded series, folding each day from the prior
  * day's carried state). No window sort, no driver loop.
  *
  * Determinism discipline: baseline mean/std come from exact decimal
  * sums (the q15 recipe); every fold step is a fixed left-to-right chain
  * of IEEE double ops mirrored token-for-token by the DuckDB oracle's
  * `list_reduce`, so even the 10,000th EWMA value is bit-identical
  * across engines.
  */
object ControlChart {

  private def dmean(c: Column, scale: Int) =
    sum(c.cast(DecimalType(30, scale))).cast("double") / count(lit(1))

  /** Per-key time-ordered value array + exact-decimal baseline (mu,
    * sigma). sigma is population std via E[x²]−μ² over exact sums —
    * values are 2-dp so squares are exact at 4-dp. */
  private def seriesAgg(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String): DataFrame =
    events
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        dmean(col(valCol), 2).as("mu"),
        sqrt(dmean(col(valCol) * col(valCol), 4) -
          dmean(col(valCol), 2) * dmean(col(valCol), 2)).as("sigma"),
        transform(
          array_sort(collect_list(struct(
            col(tsCol).as("t"), col(tieCol).as("i"),
            col(valCol).cast("double").as("v")))),
          s => s("v")).as("seq"))

  /** EWMA control chart: z_t = z_{t-1} + α·(x_t − z_{t-1}) seeded at the
    * key's own baseline mean; a reading is out-of-control when its
    * deviation from the PREVIOUS smoothed state exceeds `nSigma`·σ.
    * Emits per key: series length, final smoothed state, and the
    * out-of-control count. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valCol: String, alpha: Double, nSigma: Double): DataFrame = {
    val fold = aggregate(
      col("seq"),
      array(col("mu"), lit(0.0)),
      (acc, x) => {
        val z = element_at(acc, 1)
        array(
          z + lit(alpha) * (x - z),
          element_at(acc, 2) +
            when(abs(x - z) > lit(nSigma) * col("sigma"), 1.0).otherwise(0.0))
      })
    seriesAgg(events, keyCol, tsCol, tieCol, valCol)
      .select(col(keyCol), col("n"),
        round(element_at(fold, 1), 6).as("ewma_final"),
        element_at(fold, 2).cast("bigint").as("n_out_of_control"))
  }

  /** Two-sided CUSUM drift detector with slack k = `kSigma`·σ and
    * decision interval h = `hSigma`·σ: s⁺ accumulates upward drift
    * max(0, s⁺ + (x−μ−k)), s⁻ downward; crossing h fires an alert and
    * restarts that side (the standard post-alarm reset). Emits per key:
    * alert count and the final (unreset) accumulator states. */
  def cusum(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valCol: String, kSigma: Double, hSigma: Double): DataFrame = {
    val fold = aggregate(
      col("seq"),
      array(lit(0.0), lit(0.0), lit(0.0)),
      (acc, x) => {
        val k = lit(kSigma) * col("sigma")
        val h = lit(hSigma) * col("sigma")
        val sp = greatest(lit(0.0), element_at(acc, 1) + ((x - col("mu")) - k))
        val sn = greatest(lit(0.0), element_at(acc, 2) + ((col("mu") - x) - k))
        val fired = sp > h || sn > h
        array(
          when(fired, 0.0).otherwise(sp),
          when(fired, 0.0).otherwise(sn),
          element_at(acc, 3) + when(fired, 1.0).otherwise(0.0))
      })
    seriesAgg(events, keyCol, tsCol, tieCol, valCol)
      .select(col(keyCol), col("n"),
        element_at(fold, 3).cast("bigint").as("n_alerts"),
        round(element_at(fold, 1), 6).as("cusum_high"),
        round(element_at(fold, 2), 6).as("cusum_low"))
  }
}
