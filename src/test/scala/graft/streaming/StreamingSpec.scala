package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.core.MetricReading
import graft.operators.Snapshotter
import graft.sources.IoTSimulator

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp((1704067200L + sec) * 1000)

  private def reading(dev: String, sec: Long, metric: String, v: Double) =
    MetricReading(dev, "rooftop_unit", ts(sec), metric, v, "x", "b-A", "b1",
      "2024-01-01")

  test("json message codec round-trips readings (S2/S3)") {
    val r = IoTSimulator.readings(spark, 5)
    val back = StreamingSnapshotter.fromJsonMessages(StreamingSnapshotter.toJsonMessages(r))
    assert(back.schema.fieldNames.toSeq == r.schema.fieldNames.toSeq)
    val a = r.orderBy("device_id", "timestamp", "metric_name").collect().toSeq
    val b = back.orderBy("device_id", "timestamp", "metric_name").collect().toSeq
    assert(a == b)
  }

  test("corrupt messages go to the dead-letter leg, never become null readings") {
    val good = StreamingSnapshotter.toJsonMessages(IoTSimulator.readings(spark, 2))
    val bad = Seq(
      ("k1", "{not json at all"),
      ("k2", """{"device_id": null, "metric_name": "m"}"""), // missing keys
      ("k3", """{"some": "other schema"}"""),
    ).toDF("key", "value")
    val mixed = good.unionByName(bad)
    val ok = StreamingSnapshotter.fromJsonMessages(mixed)
    val dlq = StreamingSnapshotter.deadLetters(mixed)
    assert(ok.count() == good.count(), "a corrupt message leaked into readings")
    assert(ok.filter($"device_id".isNull || $"metric_value".isNull).count() == 0)
    assert(dlq.count() == 3)
    assert(dlq.filter($"raw_value".contains("not json")).count() == 1)
  }

  test("streaming snapshots: append emits only watermark-finalized windows, per-tick granularity") {
    val mem = MemoryStream[MetricReading](spark)
    val out = StreamingSnapshotter.snapshots(mem.toDF(), dim = 16,
      windowDuration = "60 seconds", watermarkDelay = "120 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("snaps").start()

    // two ticks inside minute 0, two metrics each
    mem.addData(
      reading("RTU-001", 10, "m1", 1.0), reading("RTU-001", 10, "m2", 2.0),
      reading("RTU-001", 20, "m1", 1.5), reading("RTU-001", 20, "m2", 2.5))
    q.processAllAvailable()
    assert(spark.table("snaps").count() == 0, "window not passed by watermark yet")

    // an event far in the future pushes the watermark past minute 0
    mem.addData(reading("RTU-001", 400, "m1", 9.9))
    q.processAllAvailable()
    val rows = spark.table("snaps").collect()
    assert(rows.length == 2, s"expected 2 per-tick snapshots, got ${rows.length}")
    val m = spark.table("snaps").orderBy("snapshot_time")
      .select($"metrics")
      .as[Map[String, Double]].collect()
    assert(m(0) == Map("m1" -> 1.0, "m2" -> 2.0))
    assert(m(1) == Map("m1" -> 1.5, "m2" -> 2.5))

    // late data behind the watermark is dropped
    mem.addData(reading("RTU-001", 15, "m1", 7.7))
    q.processAllAvailable()
    assert(spark.table("snaps").count() == 2, "late row must not create a snapshot")
    q.stop()
  }

  test("streaming snapshots agree with the batch snapshotter on closed windows") {
    val readings = IoTSimulator.readings(spark, 30).where($"device_id" === "RTU-001")
    val typed = readings.as[MetricReading]
    val mem = MemoryStream[MetricReading](spark)
    val out = StreamingSnapshotter.snapshots(mem.toDF(), dim = 16)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("snaps2").start()
    mem.addData(typed.collect().toSeq)
    // sentinel far ahead closes every real window
    mem.addData(reading("RTU-001", 100000, "mx", 0.0))
    q.processAllAvailable()
    // map columns don't support set ops -> compare via sorted entries
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"device_id", $"snapshot_time",
        array_sort(map_entries($"metrics")).as("m"), $"embedding")
    val streamed = canon(spark.table("snaps2").filter($"snapshot_time" < ts(90000)))
    val batch = canon(Snapshotter.snapshots(readings, dim = 16))
    assert(streamed.count() == 30)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    q.stop()
  }

  test("high-water mark state passes only strictly newer rows per device") {
    import HighWaterMark.Keyed
    val mem = MemoryStream[Keyed](spark)
    val q = HighWaterMark.filterNew(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hwm").start()
    mem.addData(Keyed("a", 10), Keyed("a", 20), Keyed("b", 5))
    q.processAllAvailable()
    mem.addData(Keyed("a", 15), Keyed("a", 25), Keyed("b", 5), Keyed("b", 6))
    q.processAllAvailable()
    val got = spark.table("hwm").as[Keyed].collect().toSet
    assert(got == Set(Keyed("a", 10), Keyed("a", 20), Keyed("b", 5),
      Keyed("a", 25), Keyed("b", 6)), s"got $got")
    q.stop()
  }

  test("streaming exact dedup: only the first arrival of each canonical text emits") {
    val mem = MemoryStream[(Timestamp, Long, String)](spark)
    val out = graft.operators.Dedup.streamingExactDedup(
      mem.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdedup").start()
    mem.addData(
      (ts(0), 1L, "the quick fox"),
      (ts(1), 2L, "THE  QUICK   FOX"), // same canonical form
      (ts(2), 3L, "something else"))
    q.processAllAvailable()
    mem.addData((ts(3), 4L, "the quick fox")) // later batch duplicate
    q.processAllAvailable()
    val got = spark.table("sdedup").select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L), s"got $got")
    q.stop()
  }

  test("streaming session windows: gap-based sessions emit once closed by the watermark") {
    val mem = MemoryStream[(Timestamp, String)](spark)
    val sessions = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 seconds")
      .groupBy($"user", session_window($"ts", "30 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user", $"session_window.start".as("s"), $"n_events")
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess").start()
    // user a: events at 0s,10s,20s (one session), then 100s (new session:
    // gap 80s > 30s); user b: single event
    mem.addData((ts(0), "a"), (ts(10), "a"), (ts(20), "a"), (ts(100), "a"), (ts(5), "b"))
    q.processAllAvailable()
    // close everything: watermark past 100s + 30s gap + 10s delay
    mem.addData((ts(500), "z"))
    q.processAllAvailable()
    val got = spark.table("sess").select($"user", $"n_events")
      .as[(String, Long)].collect().toSet
    assert(got.contains(("a", 3L)) && got.contains(("a", 1L)) && got.contains(("b", 1L)),
      s"got $got")
    q.stop()
  }

  test("high-water mark dedups equal-epoch duplicates within a batch") {
    import HighWaterMark.Keyed
    val mem = MemoryStream[Keyed](spark)
    val q = HighWaterMark.filterNew(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hwm_dup").start()
    // same epoch three times in one batch -> exactly one passes
    mem.addData(Keyed("a", 10), Keyed("a", 10), Keyed("a", 10), Keyed("a", 7))
    q.processAllAvailable()
    val got = spark.table("hwm_dup").as[Keyed].collect().toSeq
    assert(got.count(_ == Keyed("a", 10)) == 1, s"got $got")
    assert(got.count(_ == Keyed("a", 7)) == 1, s"got $got")
    q.stop()
  }
}
