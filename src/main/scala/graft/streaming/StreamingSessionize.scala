package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Gap-based sessionization on an unbounded stream — the streaming twin of
  * batch q46 (SURVEY §2.10 ext.), built on Spark's native
  * `session_window`:
  *
  *  - state is ONE row per OPEN session per user (merged in the state
  *    store as events arrive — including out-of-order events inside the
  *    watermark, which can bridge two open sessions into one);
  *  - a session finalizes and emits exactly once, when the watermark
  *    passes its close (last event + gap); events later than the
  *    watermark are dropped, so state is bounded by the number of
  *    concurrently open sessions, never by history.
  *
  * Boundary rule (inclusive, verified in the spec): two events belong to
  * the same session iff their gap is AT MOST `gapMinutes` — exactly the
  * batch q46 rule (`gap > threshold` starts a new session), so the two
  * formulations agree on every input.
  *
  * At 100 TB scale the aggregation hash-partitions on user_id only — the
  * session merge happens inside each user's state partition, so a
  * billion-user stream shards evenly and no global ordering is needed.
  */
object StreamingSessionize {

  case class EventIn(event_id: Long, user_id: Long, epoch_us: Long)

  /** Works unchanged on a batch Dataset (watermark is a no-op there) —
    * batch ≡ stream is asserted in StreamingSessionizeSpec. */
  def sessions(events: Dataset[EventIn], gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): DataFrame =
    events.toDF()
      .withColumn("ts", timestamp_micros(col("epoch_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("epoch_us")).as("session_start_us"),
        max(col("epoch_us")).as("session_end_us"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
}
