package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentiles without a global sort (LLM-pipeline / OLAP extension).
  *
  * Exact per-group percentiles (`percentile(...)`, q54) collect every
  * group's values into one task — at 100 TB a per-language length
  * distribution is billions of values per group and the sort dominates.
  * [[binPercentiles]] is the mergeable shape: values drop into fixed-width
  * integer bins in ONE partial-aggregating pass (bin counts combine
  * map-side exactly like any sum), the per-group bin table is bounded by
  * the value range — never by corpus size — and the percentile is read
  * off the cumulative bin counts. Result is the true percentile rounded
  * DOWN to its bin's lower edge: error ≤ `binWidth`, chosen by the
  * caller, and every step is integer-exact so reruns and other engines
  * reproduce it bit-for-bit (q88's DuckDB oracle).
  *
  * Percentile ranks are given in ppm (parts per million) to keep the
  * rank threshold integer-exact: the p-th percentile is the value at
  * 1-based rank ceil(n·p/1e6), located with the overflow-safe integer
  * cross-multiplication cum·1e6 ≥ n·p_ppm.
  */
object Histogram {

  /** Fixed-bin 2D occupancy grid over two integer features — the corpus
    * map (length × quality, tokens × repetition, …) an analyst reads
    * before committing to a JOINT filter threshold: marginal histograms
    * (q54/q88) hide exactly the correlated corner a 2D cut targets.
    * Fixed absolute bin widths: no stats pass, and grids from different
    * shards/days merge by cell-wise addition (the q92 drift discipline
    * in two dimensions). Counts plus corpus-share ppm, all integer.
    * One groupBy on the (xb, yb) cell key; the share total rides a
    * window over the grid-sized frame. */
  def grid2d(df: DataFrame, xCol: String, xWidth: Long, xMaxBin: Int,
      yCol: String, yWidth: Long, yMaxBin: Int): DataFrame = {
    require(xWidth > 0 && yWidth > 0, "bin widths must be positive")
    import org.apache.spark.sql.expressions.Window
    // integer div: identical to DuckDB's // on the non-negative features
    // this grids (counts, lengths, ppm scores)
    df.select(
        expr(s"least(CAST(`$xCol` AS BIGINT) div $xWidth, CAST($xMaxBin AS BIGINT))").as("xb"),
        expr(s"least(CAST(`$yCol` AS BIGINT) div $yWidth, CAST($yMaxBin AS BIGINT))").as("yb"))
      .groupBy(col("xb"), col("yb"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_tot", sum(col("n")).over(
        Window.partitionBy()))
      .select(col("xb"), col("yb"), col("n"),
        expr("n * 1000000 div _tot").as("share_ppm"))
  }

  /** Per-group lower-edge percentiles from fixed-width bins. Output:
    * (group, p_<ppm> columns in value units). */
  def binPercentiles(
      df: DataFrame, groupCol: String, valCol: String,
      binWidth: Double, ppms: Seq[Int]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(ppms.nonEmpty && ppms.forall(p => p > 0 && p <= 1000000),
      "percentile ranks must be ppm values in (0, 1e6]")
    val bins = df
      .groupBy(col(groupCol), floor(col(valCol) / binWidth).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("c"))
    val byBin = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
    val whole = Window.partitionBy(col(groupCol))
    val cum = bins
      .withColumn("cum", sum(col("c")).over(byBin))
      .withColumn("n", sum(col("c")).over(whole))
    val picks: Seq[Column] = ppms.map { p =>
      (min(when(col("cum") * 1000000L >= col("n") * p, col("bin"))) * binWidth)
        .as(s"p_$p")
    }
    cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }

  /** Exact per-group percentiles over an INTEGER value column, with the
    * same rank convention as [[binPercentiles]] (value at 1-based rank
    * ceil(n·p/1e6)) — the ground truth [[binPercentiles]] approximates,
    * and the other half of the sketch-accuracy audit (q200): run both,
    * difference the answers, and the observed error validates (or
    * rejects) the chosen bin width before anyone trusts the cheap path
    * on the full corpus.
    *
    * Scale shape: the pre-aggregation to (group, value, count) bounds the
    * windowed stage by the DOMAIN size per group, not the row count —
    * exact-but-cheap whenever values are discretized (cents, token
    * counts). For genuinely continuous domains use [[binPercentiles]]. */
  def exactPercentiles(
      df: DataFrame, groupCol: String, valCol: String,
      ppms: Seq[Int]): DataFrame = {
    require(ppms.nonEmpty && ppms.forall(p => p > 0 && p <= 1000000),
      "percentile ranks must be ppm values in (0, 1e6]")
    val vc = df
      .groupBy(col(groupCol), col(valCol).cast("bigint").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    val whole = Window.partitionBy(col(groupCol))
    val cum = vc
      .withColumn("cum", sum(col("c")).over(byV))
      .withColumn("n", sum(col("c")).over(whole))
    val picks: Seq[Column] = ppms.map { p =>
      min(when(col("cum") * 1000000L >= col("n") * p, col("v"))).as(s"p_$p")
    }
    cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }

  /** Distribution drift between two row populations, per group: the
    * total-variation distance of their binned value histograms, in ppm.
    * `isA` partitions rows into the A side (true) and B side (false).
    *
    * One conditional-count aggregation builds BOTH histograms in a
    * single pass over the data; everything after it runs on the bounded
    * bin table. All arithmetic is integer (per-bin ppm rates against
    * each side's total), so the drift score is bit-identical across
    * engines and reruns — the ML-monitoring staple (train-vs-serve or
    * week-over-week skew) without log/exp, at 100 TB one scan.
    * Groups with an empty side are dropped (no distribution to compare).
    *
    * TVD = ½ Σ_bins |P_A(bin) − P_B(bin)| ∈ [0, 1], reported ×1e6. */
  def tvDrift(
      df: DataFrame, groupCol: String, valCol: String,
      isA: Column, binWidth: Double): DataFrame =
    tvFromBins(driftBins(df, groupCol, valCol, isA, binWidth), groupCol)

  /** The dual-histogram bin table: (group, bin, ca, cb). A pure
    * conditional-count aggregation — STREAMING-LEGAL in update/complete
    * mode, so a drift monitor maintains exactly this state incrementally
    * and reads [[tvFromBins]] off it per trigger (foreachBatch); batch ≡
    * stream proven in StreamingMonitorSpec. */
  def driftBins(
      df: DataFrame, groupCol: String, valCol: String,
      isA: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.groupBy(col(groupCol), floor(col(valCol) / binWidth).cast("bigint").as("bin"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("ca"),
        sum(when(isA, 0L).otherwise(1L)).as("cb"))
  }

  /** RFM segmentation — the canonical customer triage: quintile scores
    * for Recency (days since last activity; 5 = most recent), Frequency
    * (row count; 5 = most active) and Monetary (exact-cents total;
    * 5 = highest), rolled up to the (r, f, m) segment grid with customer
    * counts and value. Quintiles are `ntile(5)` over a TOTAL order
    * (metric, then entity id), so bucket boundaries — including the
    * SQL-standard distribution of the n mod 5 remainder — are
    * deterministic and engine-identical; all inputs are integers
    * (days / counts / cents), nothing floats.
    *
    * Scale shape: one corpus groupBy to the entity table, then the three
    * ranking windows run over the ENTITY DIMENSION, never the fact rows.
    * (Past ~10^8 entities, swap ntile for threshold scoring off
    * [[binPercentiles]] — the segment semantics are unchanged.) Returns
    * (r_score, f_score, m_score, n_customers, total_cents). */
  def rfmSegments(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val per = df.groupBy(col(entityCol).as("e"))
      .agg(max(to_date(col(tsCol))).as("_last"),
        count(lit(1)).as("_f"),
        sum(round(col(valueCol) * 100).cast("bigint")).as("_m"))
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = per
      .withColumn("_rec", datediff(max(col("_last")).over(whole), col("_last")))
      .withColumn("r_score",
        lit(6) - ntile(5).over(Window.orderBy(col("_rec"), col("e"))))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(col("_f"), col("e"))))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(col("_m"), col("e"))))
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"), sum(col("_m")).as("total_cents"))
  }

  /** TVD readout over a bin table (bounded: runs on bins, not rows). */
  def tvFromBins(bins: DataFrame, groupCol: String): DataFrame = {
    val whole = Window.partitionBy(col(groupCol))
    bins
      .withColumn("na", sum(col("ca")).over(whole))
      .withColumn("nb", sum(col("cb")).over(whole))
      .filter(col("na") > 0 && col("nb") > 0)
      .groupBy(col(groupCol))
      .agg(
        expr("sum(abs(ca * 1000000 div na - cb * 1000000 div nb)) div 2")
          .as("tvd_ppm"),
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"))
  }
}
