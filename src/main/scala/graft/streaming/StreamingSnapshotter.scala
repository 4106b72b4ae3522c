package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions.hash_featurize

/** Structured-Streaming re-expression of the reference's consumer loop
  * (`/root/reference/pipeline/kafka_consumer.py:558-605` → SURVEY §2.10).
  *
  * The reference hand-rolls: tumbling 60 s windows via floor-bucketing, a
  * "window closed" check at now − 2·W (a hard-coded watermark), one
  * snapshot per distinct source timestamp, at-least-once delivery with
  * idempotent inserts. Spark-native equivalents: `window()` grouping,
  * `withWatermark` + append mode (emit exactly when the window is
  * finalized), checkpointing for resume (replacing both Kafka committed
  * offsets S3 and the path3 watermark file).
  */
object StreamingSnapshotter {

  /** Producer-message schema (kafka_producer.py:149-158, 8 fields). */
  val messageSchema: StructType = StructType(Seq(
    StructField("device_id", StringType), StructField("device_type", StringType),
    StructField("timestamp", TimestampType), StructField("metric_name", StringType),
    StructField("metric_value", DoubleType), StructField("unit", StringType),
    StructField("location", StringType), StructField("building_id", StringType)))

  /** S2: readings → Kafka-shaped (key, value) JSON messages, keyed by
    * device_id (preserves the reference's per-device ordering contract). */
  def toJsonMessages(readings: DataFrame): DataFrame =
    readings.select(
      col("device_id").cast("string").as("key"),
      to_json(struct(
        col("device_id"), col("device_type"), col("timestamp"), col("metric_name"),
        col("metric_value"), col("unit"), col("location"), col("building_id"))).as("value"))

  /** S3: Kafka-shaped (value) JSON messages → typed readings (works on
    * batch or streaming frames; plug after
    * `spark.readStream.format("kafka")`). Corrupt or key-incomplete
    * messages are DROPPED, mirroring the reference consumer's
    * skip-on-parse-error loop (kafka_consumer.py:110-139) — route them to
    * a quarantine sink with [[deadLetters]] instead of letting from_json's
    * permissive nulls masquerade as readings. */
  def fromJsonMessages(messages: DataFrame): DataFrame =
    parsed(messages)
      .filter(wellFormed)
      .select(col("r.*"))
      .withColumn("date", date_format(col("timestamp"), "yyyy-MM-dd"))

  /** The rejects of [[fromJsonMessages]], with the raw payload preserved
    * for replay/debugging — the dead-letter-queue half of the ingest
    * front door. Stateless filters, so both legs run on the same stream
    * (or batch) source. */
  def deadLetters(messages: DataFrame): DataFrame =
    parsed(messages).filter(!wellFormed).select(col("_raw").as("raw_value"))

  private def parsed(messages: DataFrame): DataFrame =
    messages.select(col("value").cast("string").as("_raw"),
      from_json(col("value").cast("string"), messageSchema).as("r"))

  /** A reading must carry its key fields; everything else may be null. */
  private def wellFormed =
    col("r").isNotNull && col("r.device_id").isNotNull &&
      col("r.timestamp").isNotNull && col("r.metric_name").isNotNull &&
      col("r.metric_value").isNotNull

  /** Streaming snapshot build: group on (device, exact source timestamp)
    * with a watermark on that same event-time column. Grouping on the tick
    * timestamp itself (not a window) keeps the reference's
    * one-snapshot-per-source-timestamp granularity (A3,
    * kafka_consumer.py:421-446 — collapsing to one-row-per-window would be
    * wrong); the watermark delay plays the reference's `now − 2·W`
    * finalization rule (A2): in append mode a snapshot is emitted exactly
    * when the watermark passes its tick, and later-arriving rows for that
    * tick are dropped (the reference's buffer-TTL lateness bound).
    *
    * `windowDuration` is kept in the signature for documentation parity:
    * set `watermarkDelay` ≈ 2× the reference window. */
  def snapshots(
      readings: DataFrame,
      dim: Int = 384,
      windowDuration: String = "60 seconds",
      watermarkDelay: String = "120 seconds"): DataFrame =
    readings
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(col("device_id"), col("timestamp"))
      .agg(
        first(col("device_type")).as("device_type"),
        first(col("location")).as("location"),
        first(col("building_id")).as("building_id"),
        array_sort(collect_list(struct(col("metric_name"), col("metric_value"))))
          .as("_entries"))
      .withColumn("metrics",
        map_from_entries(graft.operators.Snapshotter.dedupEntries(col("_entries"))))
      .drop("_entries")
      .select(
        col("device_id"),
        date_format(col("timestamp"), "yyyy-MM-dd").as("date"),
        col("timestamp").as("snapshot_time"),
        col("device_type"), col("location"), col("building_id"),
        col("metrics"),
        hash_featurize(col("metrics"), dim).as("embedding"),
        lit("hash_projection").as("embedding_method"))
}

/** Per-device high-water-mark dedup/resume — the reference's path3
  * watermark file (`path3_vector_search.py:255-312`: persist last processed
  * snapshot_time, resume strictly after it) as typed streaming state. */
object HighWaterMark {

  case class Keyed(device_id: String, epoch_us: Long)

  /** Batch/incremental filter: keep rows strictly newer than each key's
    * stored high-water mark, advancing the state as rows pass. With
    * `mapGroupsWithState` + checkpointing this survives restarts exactly
    * like the reference's watermark file — but per device, not global.
    *
    * The batch iterator is consumed in one streaming pass: rows at or below
    * the stored mark are dropped without buffering (a hot device replaying
    * history costs O(1) memory), only genuinely fresh rows are buffered
    * (downstream holds them anyway), and equal-epoch duplicates within one
    * batch are deduplicated — matching the reference watermark file's
    * strictly-after contract (path3_vector_search.py:255-312). */
  def filterNew(
      rows: Dataset[Keyed]): Dataset[Keyed] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.device_id)
      .flatMapGroupsWithState[Long, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Keyed], state: GroupState[Long]) =>
          val stored = state.getOption.getOrElse(Long.MinValue)
          val seen = new java.util.HashSet[java.lang.Long]()
          val fresh = scala.collection.mutable.ArrayBuffer.empty[Keyed]
          var maxSeen = stored
          it.foreach { k =>
            if (k.epoch_us > stored && seen.add(k.epoch_us)) {
              fresh += k
              if (k.epoch_us > maxSeen) maxSeen = k.epoch_us
            }
          }
          if (maxSeen > stored) state.update(maxSeen)
          fresh.iterator
      }
  }
}
