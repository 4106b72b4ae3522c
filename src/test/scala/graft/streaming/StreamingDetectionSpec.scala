package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.core.{DetectionConfig, MetricReading}
import graft.operators.{Detection, Profiles, Snapshotter}
import graft.sources.IoTSimulator

/** The reference's main path (§3.1) in streaming mode: kafka-shaped stream
  * → watermarked snapshotting → broadcast profile join → inline paths-1+2
  * detection → anomaly events, all as one continuous query.
  */
class StreamingDetectionSpec extends SparkSpec {
  import spark.implicits._

  test("stream -> snapshots -> detection -> events flags the injected window inline") {
    val inject = IoTSimulator.compressorFailure("RTU-001", 400, 450)
    val readings = IoTSimulator.readings(spark, 600, injections = inject)
      .where($"device_id" === "RTU-001")

    // profiles trained batch-side on the clean period (reference: profile
    // build is a separate batch job; the stream joins it as a static side)
    val profiles = Profiles.build(
      Snapshotter.snapshots(
        IoTSimulator.readings(spark, 300).where($"device_id" === "RTU-001"), dim = 32))

    val mem = MemoryStream[MetricReading](spark)
    val snaps = StreamingSnapshotter.snapshots(mem.toDF(), dim = 32)
    // narrow rules are a pure projection -> legal inside a streaming query
    val ruled = graft.operators.Rules.evaluateNarrow(
      Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone))
    val detected = ruled
    val events = Detection.anomalyEvents(detected)
    val q = events.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_events").start()

    mem.addData(readings.as[MetricReading].collect().toSeq)
    // sentinel reading far ahead finalizes all real ticks
    mem.addData(MetricReading("RTU-001", "rooftop_unit",
      new Timestamp((1704067200L + 100000) * 1000), "mx", 0.0, "x", "b", "b", "2024-01-02"))
    q.processAllAvailable()

    val out = spark.table("stream_events")
    val injStart = new Timestamp((1704067200L + 400 * 10) * 1000)
    val injEnd = new Timestamp((1704067200L + 450 * 10) * 1000)
    val inWindow = out.filter($"snapshot_time" >= injStart && $"snapshot_time" < injEnd).count()
    val outside = out.filter($"snapshot_time" < injStart).count()
    assert(inWindow >= 45, s"expected >=45 injected events, got $inWindow")
    assert(outside <= 3, s"false positives outside window: $outside")
    q.stop()
  }
}
