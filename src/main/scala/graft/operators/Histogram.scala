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
}
