package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The Kafka ingestion front door (reference
  * `/root/reference/pipeline/kafka_consumer.py:94-140` and
  * `kafka_producer.py:149-170`), re-expressed as Structured Streaming
  * source/sink configuration.
  *
  * The reference's consumer-group bootstrap logic maps onto Spark like so:
  *
  *  - committed group offsets → the STREAMING CHECKPOINT. A restarted
  *    query resumes from the offsets in `checkpointLocation`; Kafka's
  *    `group.id` bookkeeping is not used for progress (Spark manages its
  *    own offsets, the documented Structured Streaming contract).
  *  - "no committed offset → seek to N minutes ago"
  *    (`kafka_consumer.py:109-140`) → `startingTimestamp = now − lookback`,
  *    which Kafka resolves per partition via offsetsForTimes — the same
  *    `ListOffsetsRequest` the reference issues, but declared once as an
  *    option instead of hand-seeking. It applies ONLY on first start
  *    (no checkpoint yet); afterwards the checkpoint wins.
  *  - at-least-once + idempotent inserts → at-least-once sink delivery +
  *    the downstream dedup/upsert (Maintenance.upsertPartition /
  *    Dedup.streamingExactDedup).
  *
  * The option maps are pure functions (unit-tested offline); `readings` /
  * `writeReadings` wire them to `format("kafka")`, which needs the
  * spark-sql-kafka connector on the classpath at runtime (not present in
  * this container — the JSON codec + watermarked snapshotter downstream of
  * the source are e2e-tested via MemoryStream in StreamingSpec).
  */
object KafkaFrontDoor {

  /** Source configuration; `lookbackMs` plays the reference's
    * `OFFSET_RESET_MINUTES` first-start rewind. */
  case class SourceConfig(
      bootstrapServers: String,
      topic: String,
      lookbackMs: Option[Long] = None,
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false)

  /** Kafka source options for `spark.readStream.format("kafka")`.
    * `nowMs` is injected so option construction is deterministic/testable;
    * production callers pass `System.currentTimeMillis()`. */
  def sourceOptions(cfg: SourceConfig, nowMs: Long): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      // the reference tolerates compacted/expired offsets by seeking to
      // the earliest available; failOnDataLoss=false is that policy
      "failOnDataLoss" -> cfg.failOnDataLoss.toString)
    val starting = cfg.lookbackMs match {
      // first start: rewind N minutes (offsetsForTimes semantics);
      // restarts ignore this in favor of the checkpoint
      case Some(lb) => Map("startingTimestamp" -> (nowMs - lb).toString)
      case None => Map("startingOffsets" -> "latest")
    }
    val rate = cfg.maxOffsetsPerTrigger
      .map(n => Map("maxOffsetsPerTrigger" -> n.toString)).getOrElse(Map.empty)
    base ++ starting ++ rate
  }

  /** Sink options for `writeStream.format("kafka")` (S2: the producer
    * half; keying by device_id preserves the reference's per-device
    * ordering contract — see [[StreamingSnapshotter.toJsonMessages]]). */
  def sinkOptions(bootstrapServers: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic)

  /** S3 live wiring: Kafka source → typed readings stream. Requires the
    * spark-sql-kafka connector at runtime. */
  def readings(spark: SparkSession, cfg: SourceConfig,
      nowMs: Long = System.currentTimeMillis()): DataFrame =
    StreamingSnapshotter.fromJsonMessages(
      spark.readStream.format("kafka").options(sourceOptions(cfg, nowMs)).load())

  /** S2 live wiring: readings stream → Kafka JSON messages. Start with
    * `.start()`; exactly-once progress lives in `checkpointLocation`. */
  def writeReadings(readings: DataFrame, bootstrapServers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    StreamingSnapshotter.toJsonMessages(readings)
      .writeStream.format("kafka")
      .options(sinkOptions(bootstrapServers, topic))
      .option("checkpointLocation", checkpointLocation)

  /** One micro-batch of the exactly-once parquet landing: the batch's
    * rows land under `_batch_id=<id>` with DYNAMIC partition overwrite,
    * so only that batch's partition is replaced — earlier batches are
    * untouched, and a REPLAYED trigger (at-least-once delivery after a
    * crash before the checkpoint commit) rewrites its own partition with
    * the same deterministic rows, leaving the table content-identical.
    * This is the reference's at-least-once + idempotent-PK-insert
    * discipline (`kafka_consumer.py:100-106,464-468` — `INSERT` into a
    * primary-keyed table, where a replayed message overwrites itself)
    * re-expressed as a partition-overwrite contract the storage layer
    * enforces. Factored out of the stream wiring so the replay
    * idempotence is directly testable (StreamingSinkSpec re-fires a
    * batch and gates on [[graft.operators.Audit.tableChecksum]]). */
  def landBatch(batch: DataFrame, batchId: Long, outPath: String): Unit =
    batch
      .withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(outPath)

  /** Exactly-once-in-effect parquet landing zone for the front door:
    * `foreachBatch` + [[landBatch]]. Spark's micro-batch replay after a
    * crash re-fires the SAME batch id with the SAME source offsets (the
    * checkpoint contract), so the overwrite is a byte-for-byte no-op and
    * end-to-end delivery is exactly-once in effect — without a
    * transactional table format. Downstream batch readers should drop
    * the `_batch_id` bookkeeping column (or prune on it for incremental
    * consumption — it is monotonically increasing). */
  def landToParquet(stream: DataFrame, outPath: String,
      checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, outPath)
      }
}
