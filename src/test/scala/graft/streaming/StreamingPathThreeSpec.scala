package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DetectionConfig
import graft.operators.{Detection, Profiles, Snapshotter}
import graft.sources.IoTSimulator

class StreamingPathThreeSpec extends SparkSpec {
  import spark.implicits._
  import StreamingPathThree._

  private val t0 = 1704067200L
  private lazy val detected = {
    val readings = IoTSimulator.readings(spark, nTicks = 120,
      injections = IoTSimulator.compressorFailure("RTU-001", 80, 110))
    val snaps = Snapshotter.snapshots(readings, dim = 32)
    val profiles = Profiles.build(snaps.filter(
      col("snapshot_time") < timestamp_seconds(lit(t0 + 60 * 10))))
    Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone).cache()
  }
  private lazy val snapIn = detected.select(
      $"device_id", unix_micros($"snapshot_time").as("epoch_us"),
      $"embedding", coalesce($"is_anomalous", lit(false)).as("is_anomalous"))
    .as[SnapIn].collect().sortBy(r => (r.device_id, r.epoch_us)).toSeq

  private lazy val batchExpected =
    Detection.pathThreeAfterOneTwo(detected, DetectionConfig.VectorSearch)
      .select($"device_id", unix_micros($"snapshot_time").as("epoch_us"),
        $"corpus_n", $"match_n", $"path3_triggered")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))
      .sortBy(r => (r._1, r._2)).toSeq

  test("streaming path-3 verdicts equal the batch self-join, across triggers") {
    val mem = MemoryStream[SnapIn](spark)
    val q = verdicts(mem.toDS(), DetectionConfig.VectorSearch)
      .writeStream.format("memory").queryName("p3_stream")
      .outputMode("append").start()
    try {
      // two triggers split mid-history: the second batch's verdicts depend
      // on state carried over from the first
      val splitUs = (t0 + 60 * 10) * 1000000L
      mem.addData(snapIn.filter(_.epoch_us < splitUs): _*)
      q.processAllAvailable()
      val afterFirst = spark.table("p3_stream").count()
      mem.addData(snapIn.filter(_.epoch_us >= splitUs): _*)
      q.processAllAvailable()
      val got = spark.table("p3_stream")
        .as[Verdict].collect()
        .map(v => (v.device_id, v.epoch_us, v.corpus_n, v.match_n, v.path3_triggered))
        .sortBy(r => (r._1, r._2)).toSeq
      assert(afterFirst > 0 && afterFirst < got.size, "both triggers must emit")
      assert(got == batchExpected)
    } finally q.stop()
  }

  test("late and duplicate rows are dropped at the device high-water mark") {
    val dev = snapIn.filter(_.device_id == "RTU-001")
    val mid = dev(dev.size / 2)
    val mem = MemoryStream[SnapIn](spark)
    val q = verdicts(mem.toDS(), DetectionConfig.VectorSearch)
      .writeStream.format("memory").queryName("p3_hwm")
      .outputMode("append").start()
    try {
      mem.addData(dev: _*)
      q.processAllAvailable()
      assert(spark.table("p3_hwm").count() == dev.size)
      // next trigger replays a duplicate and a fabricated row below the
      // device's high-water mark — both must be dropped (the reference's
      // strictly-after watermark-file contract)
      mem.addData(mid, mid.copy(epoch_us = mid.epoch_us + 1))
      q.processAllAvailable()
      assert(spark.table("p3_hwm").count() == dev.size,
        "late/duplicate deliveries must not re-emit or corrupt state")
    } finally q.stop()
  }
}
