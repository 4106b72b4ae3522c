package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonality-aware traffic monitor ON THE STREAM — the online form of
  * the batch seasonal-residual readout
  * ([[graft.operators.Timeseries.seasonalResiduals]], q201).
  *
  * Shape: watermarked tumbling-window counts (append-on-close) joined to
  * a STATIC day-of-week × hour baseline by broadcast — the
  * stream-static "model serving" join pattern: the trained artifact (a
  * 168-row table) rides every trigger without ever shuffling the stream,
  * and swapping in a retrained baseline is a plain DataFrame swap, no
  * state migration. Residuals use q201's exact integer cross-difference
  * (n·n_slots − total, sign-separated truncating division), so the SAME
  * function run on a batch DataFrame is hash-checkable against DuckDB —
  * q212 puts this code path under the driver's oracle gate (the
  * q107/q147/q157 discipline).
  *
  * At scale the window aggregation is the only stateful stage, its state
  * bounded by open windows (1 row per hour per watermark horizon), and
  * the baseline join adds zero exchange.
  */
object StreamingSeasonal {

  /** The trained artifact: per (day-of-week, hour-of-day), total events
    * over observed hour slots and the slot count — q201's baseline
    * aggregate. A small BATCH job over history. */
  def baseline(events: DataFrame, tsCol: Column): DataFrame =
    events
      .groupBy(date_trunc("hour", tsCol).as("slot"))
      .agg(count(lit(1)).as("n"))
      .groupBy(dayofweek(col("slot")).cast("bigint").as("dow"),
        hour(col("slot")).cast("bigint").as("hr"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("n_slots"))

  /** Hourly residuals vs a static baseline. `events` may be a STREAMING
    * DataFrame (pass `watermark`; emits on window close, append mode) or
    * a batch one — identical code path and arithmetic. Output: one row
    * per closed hour (slot string, dow, hr, n_events, baseline_floor,
    * residual_ppm); ordering/limits are the caller's (not streaming-legal
    * here). */
  def residuals(events: DataFrame, base: DataFrame, tsCol: String,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src
      .groupBy(window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("slot"), col("n_events"))
      .select(col("slot"), col("n_events"),
        dayofweek(col("slot")).cast("bigint").as("dow"),
        hour(col("slot")).cast("bigint").as("hr"))
      .join(broadcast(base), Seq("dow", "hr"))
      .select(
        date_format(col("slot"), "yyyy-MM-dd HH").as("slot"),
        col("dow"), col("hr"), col("n_events"),
        expr("total div n_slots").as("baseline_floor"),
        (signum(col("n_events") * col("n_slots") - col("total")).cast("bigint") *
          expr("abs(n_events * n_slots - total) * 1000000 div total"))
          .as("residual_ppm"))
  }
}
