package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — the streaming twin of the batch
  * interval join (q67) and the "click before error" correlation (q17):
  * every error event pairs with the same user's clicks from the preceding
  * `windowMinutes`.
  *
  * This is the one streaming primitive where BOTH sides carry state:
  * Spark buffers each side keyed by user_id and evicts a buffered row as
  * soon as the other side's watermark proves no future match can arrive —
  * the time-range conjunct is what makes the state provably bounded
  * (without it the join is unbounded-buffer and Spark rejects it in
  * append mode). State size ~ events per user per (window + watermark
  * delay), independent of stream length.
  *
  * At scale both input streams shuffle-partition on user_id (the equi
  * key), so correlation state shards evenly across executors exactly like
  * the batch join's hash partitioning.
  */
object StreamingCorrelate {

  case class Click(user_id: Long, click_id: Long, click_us: Long)
  case class Err(user_id: Long, err_id: Long, err_us: Long)

  /** Works unchanged on batch Datasets (watermarks are no-ops there) —
    * batch ≡ stream asserted in StreamingCorrelateSpec. */
  def clicksBeforeErrors(clicks: Dataset[Click], errors: Dataset[Err],
      windowMinutes: Int = 10, delay: String = "30 minutes"): DataFrame = {
    val c = clicks.toDF()
      .withColumn("click_ts", timestamp_micros(col("click_us")))
      .withWatermark("click_ts", delay)
    val e = errors.toDF()
      .withColumnRenamed("user_id", "err_user_id")
      .withColumn("err_ts", timestamp_micros(col("err_us")))
      .withWatermark("err_ts", delay)
    c.join(e,
        col("user_id") === col("err_user_id") &&
        col("click_ts") <= col("err_ts") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("err_id"),
        col("click_us"), col("err_us"))
  }
}
