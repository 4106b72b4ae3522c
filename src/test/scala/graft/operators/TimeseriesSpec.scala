package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Long, min: Int = 0): Timestamp =
    new Timestamp(hour * 3600000L + min * 60000L)

  test("gap fill: dense grid, LOCF values, gap flags") {
    val events = Seq(
      (1L, ts(100, 10), 10.0),
      (1L, ts(100, 20), 2.5),
      (1L, ts(103, 5), 7.0), // hours 101, 102 are gaps
      (2L, ts(200, 0), 1.0)  // single-hour key: no gaps
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillHourlyLocf(events, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 100L, 2L, 1250L, false), // 10.0 + 2.5 = 12.50 -> 1250 cents
      (1L, 101L, 0L, 1250L, true),  // carried forward
      (1L, 102L, 0L, 1250L, true),
      (1L, 103L, 1L, 700L, false),
      (2L, 200L, 1L, 100L, false)))
  }

  test("gap fill: empty input yields empty output") {
    val empty = Seq.empty[(Long, Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(Timeseries.gapFillHourlyLocf(empty, "user_id", "ts", "value")
      .count() == 0)
  }
}
