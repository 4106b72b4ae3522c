package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval (range) join — the time-window join Spark has no native
  * operator for (reference analog: correlating events near anomalies, e.g.
  * clicks within a window of an error).
  *
  * A naive `|t_l − t_r| <= w` join condition has no equi-conjunct, so Spark
  * plans a BroadcastNestedLoopJoin — O(|L|·|R|) per key and a broadcast
  * that stops fitting at scale. Instead, time is bucketed into width-`w`
  * bands: the left side is exploded to its own band and both neighbors
  * (3× fan-out on one side only), the join is a pure equi-join on
  * (keys, band) — hash-partitionable, AQE-skew-splittable — and the exact
  * `|Δt| <= w` predicate rides along as a residual conjunct. Any pair
  * within `w` differs by at most one band, and each pair is emitted exactly
  * once because the right row's band is unique.
  *
  * Contract: `left` and `right` must have disjoint column names apart from
  * `keys`; time columns are epoch-scaled longs in the same unit as
  * `window`.
  */
object RangeJoin {

  private def banded(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, window: Long, joinType: String): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val l = left.withColumn("_band",
      explode(array((-1 to 1).map(d => expr(s"($leftTime div ${window}L) + $d")): _*)))
      .alias("_ij_l")
    val r = right.withColumn("_band", expr(s"$rightTime div ${window}L")).alias("_ij_r")
    val keyCond = (keys :+ "_band")
      .map(k => col(s"_ij_l.$k") === col(s"_ij_r.$k")).reduce(_ && _)
    // the exact predicate is a residual conjunct on the equi-join — it must
    // live IN the join condition (not a post-filter) so outer joins keep
    // their unmatched rows
    val cond = keyCond && abs(col(leftTime) - col(rightTime)) <= window
    (keys :+ "_band")
      .foldLeft(l.join(r, cond, joinType))((df, k) => df.drop(col(s"_ij_r.$k")))
      .drop(col(s"_ij_l._band"))
  }

  /** All (left, right) pairs sharing `keys` with `|leftTime − rightTime| <=
    * window` — each matching pair exactly once. */
  def intervalJoinPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, window: Long): DataFrame =
    banded(left, right, keys, leftTime, rightTime, window, "inner")

  /** Streaming counterpart of [[intervalJoinPairs]]: Spark's native
    * stream-stream join already manages time-range state, so no banding is
    * needed — the watermark bounds both buffers (rows older than
    * `watermarkDelay` beyond the peer's event time are evicted), which is
    * exactly the state bound the batch operator gets from band locality.
    * `leftTime`/`rightTime` are TIMESTAMP columns here (streaming
    * watermarks attach to event-time columns, not epoch longs);
    * `windowSeconds` is the same |Δt| bound as the batch operator. */
  def streamingIntervalJoinPairs(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      windowSeconds: Long, watermarkDelay: String): DataFrame = {
    require(windowSeconds > 0, s"window must be positive, got $windowSeconds")
    val l = left.withWatermark(leftTime, watermarkDelay).alias("_sj_l")
    val r = right.withWatermark(rightTime, watermarkDelay).alias("_sj_r")
    val keyCond = keys.map(k => col(s"_sj_l.$k") === col(s"_sj_r.$k")).reduce(_ && _)
    val range =
      col(rightTime) >= col(leftTime) - expr(s"INTERVAL $windowSeconds SECONDS") &&
      col(rightTime) <= col(leftTime) + expr(s"INTERVAL $windowSeconds SECONDS")
    keys.foldLeft(l.join(r, keyCond && range, "inner"))(
      (df, k) => df.drop(col(s"_sj_r.$k")))
  }

  /** Per left row: the count of right rows sharing `keys` within `window`
    * of it — zero-match rows included (the neighborhood-density feature:
    * "how many X happened around this Y"). Implemented as the banded LEFT
    * join + count of the non-null right key: unmatched band candidates
    * surface as null rows, which the count ignores. */
  def countWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, window: Long,
      rightKey: String, as: String): DataFrame = {
    val leftCols = left.columns.toSeq
    banded(left, right, keys, leftTime, rightTime, window, "left")
      .groupBy(leftCols.map(col): _*)
      .agg(count(col(rightKey)).as(as))
  }
}
