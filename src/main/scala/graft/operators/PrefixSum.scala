package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix aggregation — the scale-out form of
  * `sum(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`.
  *
  * A global ordered window forces Spark to move EVERYTHING into one
  * task (WindowExec warns "No Partition Defined"); fine on a value-domain
  * frame, fatal on a row-domain one. The classic two-pass fix, composed
  * from stock operators so Catalyst still owns the plan:
  *
  *   1. `repartitionByRange` on the order key — a sampled range exchange,
  *      the same machinery a global sort uses, but each partition then
  *      works independently;
  *   2. per-partition running totals (window PARTITIONED by
  *      `spark_partition_id()` — parallel, memory-bounded);
  *   3. per-partition grand totals (one tiny aggregate, partition-count
  *      rows) cumulated on the driver-sized frame and broadcast back as
  *      each partition's starting offset.
  *
  * Exactness: range partitioning keeps equal keys together and orders
  * partitions by the SAME key order the windows use, so local-run +
  * offset equals the global running total row-for-row (PrefixSumSpec
  * proves equality against the single-partition window). Callers must
  * pass a total order (include a tie-break column) for a deterministic
  * result — same contract as the window it replaces.
  */
object PrefixSum {

  /** Append running-total columns over the global `orderCols` order:
    * each `(valueExpr, outName)` gets `sum(valueExpr) OVER (ORDER BY
    * orderCols ROWS UNBOUNDED PRECEDING AND CURRENT ROW)` semantics.
    * Pass `lit(1L) -> "rk"` to get a global row number. */
  def withRunningTotals(df: DataFrame, orderCols: Seq[Column],
      totals: Seq[(Column, String)], nParts: Int = 0): DataFrame = {
    require(totals.nonEmpty, "at least one running total")
    val n = if (nParts > 0) nParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
    val local = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRuns = totals.zipWithIndex.foldLeft(ranged) {
      case (d, ((v, _), i)) => d.withColumn(s"_run$i", sum(v).over(local))
    }
    val partAggs = totals.zipWithIndex.map { case ((v, _), i) =>
      sum(v).as(s"_tot$i")
    }
    val byPid = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // partition-count-sized frame: the ordered window here is over ≤ n
    // rows, not the data — that is the whole trick
    val offsets = totals.indices.foldLeft(
      ranged.groupBy(col("_pid")).agg(partAggs.head, partAggs.tail: _*)) {
      case (d, i) =>
        d.withColumn(s"_off$i",
          coalesce(sum(col(s"_tot$i")).over(byPid), lit(0L)))
    }.select(col("_pid") +: totals.indices.map(i => col(s"_off$i")): _*)
    totals.zipWithIndex.foldLeft(
      withRuns.join(broadcast(offsets), Seq("_pid"))) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"_run$i") + col(s"_off$i"))
          .drop(s"_run$i", s"_off$i")
    }.drop("_pid")
  }
}
