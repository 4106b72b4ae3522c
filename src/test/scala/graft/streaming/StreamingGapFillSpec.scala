package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Timeseries
import StreamingGapFill._

class StreamingGapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Long, min: Int = 0): Timestamp =
    new Timestamp(hour * 3600000L + min * 60000L)

  private val obs = Seq(
    Obs(1L, ts(100, 10), 1000L), Obs(1L, ts(100, 20), 250L),
    Obs(1L, ts(103, 5), 700L), // hours 101, 102 are gaps
    Obs(2L, ts(200, 0), 100L))

  // the batch operator's view of the same events (cents/100 is exact here)
  private def batchRows: Set[(Long, Long, Long, Long, Boolean)] =
    Timeseries.gapFillHourlyLocf(
      obs.map(o => (o.key, o.ts, o.cents / 100.0)).toDF("user_id", "ts", "value"),
      "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet

  test("drained stream emits exactly the batch grid (gaps included)") {
    val mem = MemoryStream[Obs](spark)
    val q = fill(mem.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gapf").start()
    val ordered = obs.sortBy(_.ts.getTime)
    mem.addData(ordered.take(2): _*)
    q.processAllAvailable()
    mem.addData(ordered.drop(2): _*)
    q.processAllAvailable()
    // sentinel key advances the watermark past every open hour
    mem.addData(Obs(99L, ts(300), 0L))
    q.processAllAvailable()
    mem.addData(Obs(99L, ts(301), 0L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gapf")
      .as[HourRow].collect().toSeq
      .filter(_.key != 99L)
      .map(r => (r.key, r.hr, r.n_events, r.cents_filled, r.is_gap)).toSet
    assert(streamed == batchRows, s"streamed $streamed vs batch $batchRows")
  }

  test("late event at or before a finalized hour is dropped") {
    val mem = MemoryStream[Obs](spark)
    val q = fill(mem.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gapl").start()
    mem.addData(Obs(1L, ts(10), 100L))
    q.processAllAvailable()
    mem.addData(Obs(1L, ts(12), 300L)) // closes hour 10, gap 11
    q.processAllAvailable()
    mem.addData(Obs(1L, ts(10, 30), 999L)) // late into finalized hour 10
    q.processAllAvailable()
    mem.addData(Obs(99L, ts(50), 0L)) // drain hour 12
    q.processAllAvailable()
    mem.addData(Obs(99L, ts(51), 0L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("gapl").as[HourRow].collect().toSeq
      .filter(_.key == 1L)
      .map(r => (r.hr, r.n_events, r.cents_filled, r.is_gap)).toSet
    // hour 10 keeps its pre-late sum; the 999 late event left no trace
    assert(rows == Set(
      (10L, 1L, 100L, false), (11L, 0L, 100L, true), (12L, 1L, 300L, false)))
  }
}
