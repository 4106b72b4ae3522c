package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Least-squares trend fitting as mergeable state (OLAP / monitoring
  * extension; declared as q98).
  *
  * The per-group moment sums (n, Σx, Σy, Σxy, Σx²) accumulate EXACTLY in
  * decimal — no float-association drift at any parallelism — and they are
  * a plain aggregation, so the same state maintains incrementally under
  * Structured Streaming (complete/update mode; StreamingMonitorSpec) and
  * merges across partitions, days, or engines by summation. The slope
  * readout is a fixed scalar double expression over the exact sums:
  * order-independent, reproduced bit-for-bit by the DuckDB oracle —
  * unlike a naive double `regr_slope`, whose partial-sum order varies
  * with partitioning.
  *
  * Callers pre-cast: `xCol` a small-magnitude DECIMAL (center epochs to
  * an offset so x² stays inside decimal(38)), `yCol` a DECIMAL of the
  * value's scale.
  */
object Trend {

  /** (group, n, sx, sy, sxy, sxx) — exact decimal moments. */
  def momentSums(df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum(col(xCol) * col(yCol)).as("sxy"),
        sum(col(xCol) * col(xCol)).as("sxx"))

  /** Slope per `unitsPerX` x-units (e.g. 86400 for per-day over second
    * x), rounded to `scale` — one deterministic double expression over
    * the exact moments. A group whose x never varies has no defined
    * slope: null, not a NaN/Inf that engines print differently. */
  def slope(moments: DataFrame, groupCol: String,
      unitsPerX: Double, scale: Int): DataFrame = {
    val den = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val num = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    moments.select(col(groupCol), col("n"),
      when(den === 0d, lit(null).cast("double"))
        .otherwise(round(num / den * unitsPerX, scale)).as("slope_per_day"))
  }
}
