package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

case class SeasonalEv(ts: Timestamp, user_id: Long)

/** Stream-static seasonal monitor: the windowed counts close on the
  * watermark, the 168-row baseline rides every trigger by broadcast, and
  * the drained stream's residual rows equal the batch run of the SAME
  * function — which is what lets q212 put this code under the driver's
  * DuckDB hash gate.
  */
class StreamingSeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def at(day: Int, hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$minute%02d:00")

  // two Mondays + one burst Monday at 10:00, plus a Tuesday hour
  private val events = Seq(
    at(1, 10, 1), at(1, 10, 2), at(1, 10, 3),
    at(8, 10, 1), at(8, 10, 2),
    at(15, 10, 1), at(15, 10, 2), at(15, 10, 3), at(15, 10, 4),
    at(15, 10, 5), at(15, 10, 6),
    at(2, 9, 30), at(2, 9, 45)).zipWithIndex.map { case (t, i) => SeasonalEv(t, i.toLong) }

  test("drained stream residuals equal the batch run of the same function") {
    val batchDf = events.toDF()
    val base = StreamingSeasonal.baseline(batchDf, $"ts")
    val expected = StreamingSeasonal.residuals(batchDf, base, "ts")
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[SeasonalEv](spark)
    val q = StreamingSeasonal.residuals(mem.toDF(), base, "ts",
        watermark = Some("0 seconds"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("seasonal").start()
    val ordered = events.sortBy(_.ts.getTime)
    mem.addData(ordered.take(5): _*)
    q.processAllAvailable()
    mem.addData(ordered.drop(5): _*)
    q.processAllAvailable()
    // sentinel advances the watermark past the last open hour
    mem.addData(SeasonalEv(at(20, 0, 0), 999L))
    q.processAllAvailable()
    mem.addData(SeasonalEv(at(21, 0, 0), 999L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("seasonal")
      .filter(!$"slot".isin("2024-01-20 00", "2024-01-21 00"))
      .collect().map(_.toSeq).toSet
    assert(streamed === expected)
  }

  test("the burst hour carries the exact integer residual") {
    val batchDf = events.toDF()
    val out = StreamingSeasonal.residuals(batchDf,
        StreamingSeasonal.baseline(batchDf, $"ts"), "ts")
      .collect().map(r => r.getAs[String]("slot") -> r.getAs[Long]("residual_ppm"))
      .toMap
    // Monday-10:00 slots: counts 3, 2, 6 over 3 slots, total 11
    assert(out("2024-01-15 10") === (6L * 3 - 11) * 1000000 / 11)
    assert(out("2024-01-08 10") === -((11L - 2 * 3) * 1000000 / 11))
  }
}
