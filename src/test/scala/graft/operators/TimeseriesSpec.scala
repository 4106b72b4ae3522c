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

  test("snapshot diff: added/removed/changed statuses, unchanged dropped") {
    import org.apache.spark.sql.functions.{col, lit}
    val events = Seq(
      (1L, ts(10), 100L, 5.0), (1L, ts(30), 101L, 9.0),  // changed 5 -> 9
      (2L, ts(10), 102L, 3.0), (2L, ts(15), 103L, 3.0),  // same value: unchanged
      (3L, ts(25), 104L, 7.0),                           // added after old cutoff
      (4L, ts(10), 105L, 2.0),                           // single event in both: unchanged
      (5L, ts(40), 106L, 1.0)                            // outside both windows: dropped
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.snapshotDiff(events, "user_id", "ts", "event_id",
        "value", oldUpTo = lit(ts(20)), newUpTo = lit(ts(35)))
      .as[(Long, String, Option[Double], Option[Double])].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "changed", Some(5.0), Some(9.0)),
      (3L, "added", None, Some(7.0))))
  }

  test("snapshot diff: non-nested windows surface removals") {
    import org.apache.spark.sql.functions.lit
    // removal arises when the old window sees a key the new one doesn't
    // (newUpTo < oldUpTo models a compaction/rewind diff)
    val events = Seq(
      (1L, ts(9), 1L, 4.0),  // in [.., h10] but not [.., h8] -> removed
      (2L, ts(5), 2L, 6.0)   // in both -> unchanged, dropped
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.snapshotDiff(events, "user_id", "ts", "event_id",
        "value", oldUpTo = lit(ts(10)), newUpTo = lit(ts(8)))
      .as[(Long, String, Option[Double], Option[Double])].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, "removed", Some(4.0), None)))
  }

  test("scd2Intervals: runs become intervals; ties broken by seq; last is current") {
    import org.apache.spark.sql.functions._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val log = Seq(
      (7L, ts(10), 1L, "A"), (7L, ts(20), 2L, "A"), (7L, ts(30), 3L, "B"),
      (7L, ts(40), 4L, "A"),
      // equal timestamps: seq decides the run order deterministically
      (8L, ts(10), 1L, "X"), (8L, ts(10), 2L, "Y"),
      (9L, ts(5), 1L, "Z")).toDF("user_id", "ts", "event_id", "event_type")
    val out = Timeseries.scd2Intervals(log, "user_id", "ts", "event_id", "event_type")
      .orderBy($"user_id", $"valid_from")
      .select($"user_id", $"event_type",
        unix_micros($"valid_from").as("f"), unix_micros($"valid_to").as("t"),
        $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2) / 1000000L,
        if (r.isNullAt(3)) -1L else r.getLong(3) / 1000000L,
        r.getBoolean(4))).toSeq
    assert(out == Seq(
      (7L, "A", 10L, 30L, false), (7L, "B", 30L, 40L, false),
      (7L, "A", 40L, -1L, true),
      (8L, "X", 10L, 10L, false), (8L, "Y", 10L, -1L, true),
      (9L, "Z", 5L, -1L, true)))
  }

  test("hourlyAcf ≡ naive per-key ACF; constant and too-short series yield null") {
    // key 1: alternating series -> strong negative lag-1, positive lag-2
    // key 2: constant series -> zero denominator -> null at every lag
    // key 3: 2 points -> lags 2,3 have no pairs -> null
    val events =
      (0 until 10).map(h => (1L, ts(h.toLong), if (h % 2 == 0) 1.0 else 5.0)) ++
      (0 until 6).map(h => (2L, ts(h.toLong), 3.0)) ++
      Seq((3L, ts(0), 1.0), (3L, ts(1), 2.0))
    val df = events.toDF("user_id", "ts", "value")
    val out = Timeseries.hourlyAcf(df, "user_id", "ts", "value", maxLag = 3)
      .as[(Long, Int, Option[Double], Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def naive(xs: Seq[Double], k: Int): Option[Double] = {
      val n = xs.length
      if (n <= k) return None
      val mean = xs.sum / n
      val den = xs.map(x => (x - mean) * (x - mean)).sum
      if (den == 0) return None
      Some((0 until n - k).map(t => (xs(t) - mean) * (xs(t + k) - mean)).sum / den)
    }
    val s1 = (0 until 10).map(h => if (h % 2 == 0) 100.0 else 500.0) // cents
    for (k <- 1 to 3) {
      val (acf, m) = out((1L, k))
      assert(m == 10 - k)
      assert(math.abs(acf.get - naive(s1, k).get) < 1e-5, s"lag $k")
    }
    for (k <- 1 to 3) assert(out((2L, k))._1.isEmpty)       // constant
    assert(out((3L, 1))._1.isDefined && out((3L, 2))._1.isEmpty &&
      out((3L, 3))._1.isEmpty)                              // short series
    assert(out((3L, 2))._2 == 0L && out((3L, 3))._2 == 0L)
  }

  test("interArrivalStats: metronome CV=0, bursty CV>1, singletons absent, zero-gap null") {
    def at(sec: Long) = new Timestamp(sec * 1000L)
    val events =
      // key 1: metronome every 60 s -> CV = 0
      (0 until 10).map(i => (1L, at(i * 60L), i.toLong)) ++
      // key 2: burst of 5 within 4 s then a 3600 s silence, twice
      (0 until 2).flatMap(b => (0 until 5).map(i =>
        (2L, at(b * 3604L + i.toLong), (100 + b * 5 + i).toLong))) ++
      // key 3: single event -> no gaps -> no row
      Seq((3L, at(0), 200L)) ++
      // key 4: two events at the SAME second -> one zero gap -> null CV
      Seq((4L, at(5), 300L), (4L, at(5), 301L))
    val df = events.toDF("user_id", "ts", "event_id")
    val out = Timeseries.interArrivalStats(df, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((9L, 60L, Some(0.0))))
    val (n2, mean2, cv2) = out(2L)
    assert(n2 == 9L && cv2.get > 1.5, out(2L)) // burst-dominated
    // naive check of mean: total span 3604+4 over 9 gaps
    assert(mean2 == (3604L + 4L) / 9L)
    assert(!out.contains(3L))
    assert(out(4L) == ((1L, 0L, None)))
  }

  test("transitionMatrix: counts and per-origin rates; no cross-user pairs") {
    def at(sec: Long) = new Timestamp(sec * 1000L)
    val events = Seq(
      (1L, at(0), 0L, "view"), (1L, at(1), 1L, "click"),
      (1L, at(2), 2L, "view"), (1L, at(3), 3L, "click"),
      (2L, at(0), 4L, "click"), (2L, at(1), 5L, "buy"),
      (3L, at(0), 6L, "view") // single event: no transition
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Timeseries.transitionMatrix(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // from "view": 2 transitions, both to click; from "click": view|buy
    assert(out(("view", "click")) == ((2L, 1000000L)))
    assert(out(("click", "view")) == ((1L, 500000L)))
    assert(out(("click", "buy")) == ((1L, 500000L)))
    assert(out.size == 3) // user 3 and cross-user boundaries add nothing
  }

  test("replayDuplicates: in-window repeats flagged, identity and window respected") {
    def at(sec: Long) = new Timestamp(sec * 1000L)
    val events = Seq(
      (1L, at(0), 0L, "click"), (1L, at(5), 1L, "click"),   // 5 s repeat -> dup
      (1L, at(400), 2L, "click"),                           // outside 300 s
      (1L, at(401), 3L, "view"),                            // different type
      (2L, at(402), 4L, "view"),                            // different user
      (2L, at(402), 5L, "view")                             // same-second repeat -> dup
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Timeseries.replayDuplicates(events,
        Seq("user_id", "event_type"), "ts", "event_id", windowSec = 300L)
      .select($"event_id", $"prev_seq", $"gap_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 5000000L), (5L, 4L, 0L)))
  }

  test("forecastBacktest: period-2 series -> seasonal-naive wins exactly") {
    def at(h: Int): Timestamp = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))
    // x(h) = 2 + h%2: lag24 exact (24 even), lag1 off by 1, ma24 = 2 (floor)
    val events = (0 until 300).flatMap { h =>
      Seq.fill(2 + h % 2)(("a", at(h)))
    }.toDF("event_type", "ts")
    val r = Timeseries.forecastBacktest(events, "event_type", "ts",
      holdout = 168).head()
    assert(r.getAs[Long]("n_eval") === 168L)
    assert(r.getAs[Long]("mae_snaive_milli") === 0L)
    assert(r.getAs[Long]("mae_naive_milli") === 1000L)
    // |x - 2| averages 0.5 over alternating parity
    assert(r.getAs[Long]("mae_ma24_milli") === 500L)
    assert(r.getAs[String]("best") === "snaive")
  }

  test("forecastBacktest: constant series ties -> simplest model wins") {
    def at(h: Int): Timestamp = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))
    val events = (0 until 250).map(h => ("b", at(h))).toDF("event_type", "ts")
    val r = Timeseries.forecastBacktest(events, "event_type", "ts",
      holdout = 168).head()
    assert(r.getAs[Long]("mae_naive_milli") === 0L)
    assert(r.getAs[String]("best") === "naive")
  }

  test("stepDecayedCounts: dyadic half-life weights, cap, exact rollup") {
    def day(d: Int): Timestamp = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(d.toLong))
    val events = Seq(
      ("a", 600), ("a", 600),     // as-of day: weight 1_000_000 each
      ("a", 600 - 56),            // 2 half-lives (28d): 250_000
      ("a", 0),                   // 600 days old -> 21 half-lives, cap 20 -> 0
      ("b", 600 - 28)             // 1 half-life: 500_000
    ).map { case (k, d) => (k, day(d)) }.toDF("k", "ts")
    val out = Timeseries.stepDecayedCounts(events, "k", "ts", halfLifeDays = 28)
      .orderBy($"k").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 4L, 2250000L), ("b", 1L, 500000L)))
  }
}
