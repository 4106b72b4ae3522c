package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Snapshotter
import graft.sources.IoTSimulator

/** The reference's delivery semantics (SURVEY §2.10): at-least-once Kafka
  * consumption + idempotent inserts. Spark-native replacement: checkpointed
  * streaming with a transactional file sink = exactly-once. This spec
  * kills a streaming snapshot query mid-stream and restarts it from the
  * checkpoint: the final output must be exactly the batch result — no
  * duplicates, no gaps.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("streaming snapshotter resumes from checkpoint exactly-once") {
    val src = Files.createTempDirectory("graft_src").toString
    val sink = Files.createTempDirectory("graft_sink").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    val all = IoTSimulator.readings(spark, 60).where($"device_id" === "RTU-001").cache()
    val schema = all.schema
    def appendBatch(fromTick: Int, untilTick: Int): Unit =
      all.where($"timestamp" >= timestamp_seconds(lit(1704067200L + fromTick * 10)) &&
          $"timestamp" < timestamp_seconds(lit(1704067200L + untilTick * 10)))
        .coalesce(1).write.mode("append").parquet(src)

    def startQuery() = {
      val stream = spark.readStream.schema(schema).parquet(src)
      StreamingSnapshotter.snapshots(stream, dim = 16,
          watermarkDelay = "0 seconds")
        .drop("metrics") // parquet sink-friendly (and not needed for the check)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink)
        .start()
    }

    // phase 1: first half, then stop (simulated crash)
    appendBatch(0, 30)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterPhase1 = spark.read.parquet(sink).count()

    // phase 2: second half arrives while "down"; restart from checkpoint
    appendBatch(30, 60)
    val q2 = startQuery()
    q2.processAllAvailable()
    // and a sentinel far ahead so the watermark finalizes everything
    all.limit(1).withColumn("timestamp", timestamp_seconds(lit(1704067200L + 100000)))
      .coalesce(1).write.mode("append").parquet(src)
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(sink)
      .filter($"snapshot_time" < timestamp_seconds(lit(1704067200L + 90000)))
      .select($"device_id", $"snapshot_time")
    val batch = Snapshotter.snapshots(all, dim = 16)
      .select($"device_id", $"snapshot_time")

    assert(afterPhase1 > 0, "phase 1 must have emitted finalized snapshots")
    assert(streamed.count() == 60, s"got ${streamed.count()} of 60")
    assert(streamed.distinct().count() == 60, "no duplicates across restart")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup state survives restart: replayed duplicates stay suppressed") {
    val src = Files.createTempDirectory("dedup_src").toString
    val sink = Files.createTempDirectory("dedup_sink").toString
    val ckpt = Files.createTempDirectory("dedup_ckpt").toString

    def ts(sec: Long) = new java.sql.Timestamp((1704067200L + sec) * 1000)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def append(rows: (java.sql.Timestamp, Long, String)*): Unit =
      rows.toSeq.toDF("ts", "doc_id", "text").coalesce(1).write.mode("append").parquet(src)

    def startQuery() = {
      val stream = spark.readStream.schema(schema).parquet(src)
      graft.operators.Dedup.streamingExactDedup(stream, "ts", "text",
          watermarkDelay = "1 hour")
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink)
        .start()
    }

    // phase 1: two distinct texts
    append((ts(0), 1L, "alpha beta"), (ts(1), 2L, "gamma delta"))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // phase 2 after "crash": a duplicate of doc 1's text (within the
    // 1-hour state window) plus one genuinely new text
    append((ts(10), 3L, "ALPHA   BETA"), (ts(11), 4L, "epsilon zeta"))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(sink).select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L),
      s"duplicate must stay suppressed across restart, got $got")
  }

  test("streaming path-3 lookback state survives restart: verdicts equal batch") {
    import graft.core.DetectionConfig
    import graft.operators.{Detection, Profiles}
    import StreamingPathThree._

    val src = Files.createTempDirectory("graft_p3src").toString
    val sink = Files.createTempDirectory("graft_p3sink").toString
    val ckpt = Files.createTempDirectory("graft_p3ckpt").toString

    val readings = IoTSimulator.readings(spark, nTicks = 80,
      injections = IoTSimulator.compressorFailure("RTU-001", 50, 70))
    val snaps = Snapshotter.snapshots(readings, dim = 16)
    val profiles = Profiles.build(snaps.filter(
      $"snapshot_time" < timestamp_seconds(lit(1704067200L + 40 * 10))))
    val detected = Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone).cache()
    val cfg = DetectionConfig.VectorSearch
    val inRows = detected.select(
        $"device_id", unix_micros($"snapshot_time").as("epoch_us"),
        $"embedding", coalesce($"is_anomalous", lit(false)).as("is_anomalous"))
      .as[SnapIn].cache()
    val schema = inRows.schema

    val splitUs = (1704067200L + 40 * 10) * 1000000L
    def startQuery() = {
      val stream = spark.readStream.schema(schema).parquet(src).as[SnapIn]
      verdicts(stream, cfg)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink)
        .start()
    }

    // phase 1: first half, crash
    inRows.filter($"epoch_us" < splitUs).coalesce(1).write.mode("append").parquet(src)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // phase 2: rest arrives while down; restart from checkpoint — the
    // second half's corpus/match counts depend on state built in phase 1
    inRows.filter($"epoch_us" >= splitUs).coalesce(1).write.mode("append").parquet(src)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(sink)
      .select($"device_id", $"epoch_us", $"corpus_n", $"match_n", $"path3_triggered")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
      .sortBy(r => (r._1, r._2)).toSeq
    val expected = Detection.pathThreeAfterOneTwo(detected, cfg)
      .select($"device_id", unix_micros($"snapshot_time").as("epoch_us"),
        $"corpus_n", $"match_n", $"path3_triggered")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == expected,
      "restarted stream must judge phase-2 snapshots against phase-1 state")
  }
}
