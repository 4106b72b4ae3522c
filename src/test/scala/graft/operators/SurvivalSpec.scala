package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.hash32

/** Kaplan-Meier survival + Poisson-bootstrap CI. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, hour: Long): (Long, Timestamp) =
    (user, new Timestamp(hour * 3600L * 1000L))

  test("kaplanMeier matches a hand-computed KM table") {
    // corpus end hour = 100 (user 9). quietHours = 24.
    //   u1: hours 0..10  -> t=10, quiet 90 -> death
    //   u2: hours 0..10  -> t=10, quiet 90 -> death
    //   u3: hours 5..25  -> t=20, quiet 75 -> death
    //   u4: hours 50..90 -> t=40, quiet 10 -> censored
    //   u9: hours 40..100-> t=60, quiet 0  -> censored
    val events = Seq(
      ev(1, 0), ev(1, 10), ev(2, 0), ev(2, 10), ev(3, 5), ev(3, 25),
      ev(4, 50), ev(4, 90), ev(9, 40), ev(9, 100)
    ).toDF("user_id", "ts")
    val km = Survival.kaplanMeier(events, "user_id", "ts", quietHours = 24)
      .collect()
    // death times: t=10 (d=2, n=5) and t=20 (d=1, n=3)
    assert(km.map(_.getAs[Long]("t_hours")).toSeq === Seq(10L, 20L))
    val r10 = km(0); val r20 = km(1)
    assert(r10.getAs[Long]("n_risk") === 5L)
    assert(r10.getAs[Long]("n_events") === 2L)
    assert(r10.getAs[Long]("s_ppm") === 1000000L * 3 / 5) // 600000
    assert(r20.getAs[Long]("n_risk") === 3L)
    assert(r20.getAs[Long]("n_events") === 1L)
    // 600000 * (3-1)/3 floor-rounded
    assert(r20.getAs[Long]("s_ppm") === 600000L * 2 / 3)
    assert(r20.getAs[Long]("hazard_ppm") === 1000000L / 3)
  }

  test("kaplanMeier risk accounting and monotonicity on real events") {
    val events = spark.read.parquet(sf("sf0.01") + "/events.parquet")
    val km = Survival.kaplanMeier(events, "user_id", "ts", quietHours = 24)
      .collect()
    assert(km.nonEmpty)
    // survival is non-increasing; risk set strictly decreasing in t
    km.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("s_ppm") >= b.getAs[Long]("s_ppm"))
      assert(a.getAs[Long]("n_risk") > b.getAs[Long]("n_risk"))
    case _ => ()
    }
    // n_risk at t = |users with lifetime >= t| (independent recomputation)
    val hours = events
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .groupBy("user_id").agg(min($"h").as("f"), max($"h").as("l"))
      .select(($"l" - $"f").as("t")).as[Long].collect()
    km.foreach { r =>
      val t = r.getAs[Long]("t_hours")
      assert(r.getAs[Long]("n_risk") === hours.count(_ >= t))
    }
  }

  test("attribution models: hand-computed splits conserve revenue") {
    def e(u: Long, s: Int, id: Long, t: String, v: Double) =
      (u, new Timestamp(s * 1000L), id, t, v)
    val events = Seq(
      // user 1: view, click, signup -> purchase 10.00 (k = 3)
      e(1, 1, 1, "view", 0), e(1, 2, 2, "click", 0), e(1, 3, 3, "signup", 0),
      e(1, 4, 4, "purchase", 10.0),
      // user 2: view -> purchase 5.00 (k = 1: all models give all credit)
      e(2, 1, 5, "view", 0), e(2, 2, 6, "purchase", 5.0),
      // user 3: bare purchase -> unattributable, dropped
      e(3, 1, 7, "purchase", 99.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Attribution.modelComparison(events, "user_id", "ts",
        "event_id", "event_type", "value").orderBy("channel")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("last_cents"),
         r.getAs[Long]("linear_cents"), r.getAs[Long]("ushape_cents"))).toMap
    // k=3: linear 333/333/334 (remainder to latest), ushape 400/200/400
    assert(out("view") === ((2L, 500L, 833L, 900L)))
    assert(out("click") === ((1L, 0L, 333L, 200L)))
    assert(out("signup") === ((1L, 1000L, 334L, 400L)))
    // every model conserves the 1500 attributable cents
    Seq(out.values.map(_._2).sum, out.values.map(_._3).sum,
      out.values.map(_._4).sum).foreach(s => assert(s === 1500L))
  }

  test("edge cases: empty inputs and too-short series degrade to empty") {
    val noEvents = Seq.empty[(Long, Timestamp)].toDF("user_id", "ts")
    assert(Survival.kaplanMeier(noEvents, "user_id", "ts").count() === 0L)
    // no conversions -> no attributed rows, not an error
    val noConv = Seq((1L, new Timestamp(1000L), 1L, "view", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    assert(Attribution.modelComparison(noConv, "user_id", "ts",
      "event_id", "event_type", "value").count() === 0L)
    // single-customer RFM: every quintile collapses to one bucket
    val one = Seq((7L, new Timestamp(1000L), 12.5))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = Histogram.rfmSegments(one, "o_custkey", "o_orderdate",
      "o_totalprice").head()
    assert(r.getAs[Long]("n_customers") === 1L)
    assert(r.getAs[Long]("total_cents") === 1250L)
    // series shorter than 2*minSeg: no candidate split -> key drops out
    val short = (0 until 10).map(h => ("a", ev(1, h)._2)).toDF("event_type", "ts")
    assert(Timeseries.changepoint(short, "event_type", "ts", minSeg = 24)
      .count() === 0L)
    // all-censored corpus (every user active at the edge): no death rows
    val active = Seq(ev(1, 0), ev(1, 100), ev(2, 50), ev(2, 100))
      .toDF("user_id", "ts")
    assert(Survival.kaplanMeier(active, "user_id", "ts", quietHours = 24)
      .count() === 0L)
  }

  test("cohort KM curves equal per-cohort runs of the ungrouped operator") {
    val events = spark.read.parquet(sf("sf0.01") + "/events.parquet")
    val byCohort = Survival.kaplanMeierByCohort(events, "user_id", "ts",
      quietHours = 24).collect()
    assert(byCohort.map(_.getAs[Long]("cohort_day")).distinct.length >= 2)
    // users of each cohort, re-run through the ungrouped KM, must match
    val firstDay = events
      .select($"user_id", expr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .groupBy($"user_id").agg(min($"h").as("f"))
      .select($"user_id", expr("f div 24").as("cd"))
    for (cd <- byCohort.map(_.getAs[Long]("cohort_day")).distinct) {
      val cohortUsers = firstDay.filter($"cd" === cd).select($"user_id")
      val solo = Survival.kaplanMeier(
          events.join(cohortUsers, Seq("user_id"), "left_semi"),
          "user_id", "ts", quietHours = 24)
        .select($"t_hours", $"n_risk", $"n_events", $"s_ppm")
        .collect().map(_.toSeq).toSeq
      val grouped = byCohort.filter(_.getAs[Long]("cohort_day") == cd)
        .map(r => Seq(r.getAs[Long]("t_hours"), r.getAs[Long]("n_risk"),
          r.getAs[Long]("n_events"), r.getAs[Long]("s_ppm"))).toSeq
      // NOTE: the solo run's censor cutoff is the cohort's own max hour,
      // which can differ from the corpus cutoff only if the cohort dies
      // out early — tolerate by comparing only when cutoffs agree
      val corpusEnd = events.agg(max(expr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"))).head().getLong(0)
      val cohortEnd = events.join(cohortUsers, Seq("user_id"), "left_semi")
        .agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000")))
        .head().getLong(0)
      if (cohortEnd == corpusEnd) assert(solo === grouped, s"cohort $cd")
    }
  }

  test("poissonWeight reproduces the inverse CDF at the thresholds") {
    val df = Seq(0L, 1580030167L, 1580030168L, 3160060336L, 3160060337L,
      4294609777L, 4294967295L).toDF("h")
    val w = df.select(Sampling.poissonWeight(col("h")).as("w"))
      .as[Long].collect().toSeq
    assert(w === Seq(0L, 0L, 1L, 1L, 2L, 7L, 7L))
  }

  test("poisson weights average ~1 over the hash family") {
    val n = 20000
    val df = (1 to n).map(_.toString).toDF("k")
    val mean = df.select(
        Sampling.poissonWeight(hash32(col("k"), 33)).cast("double").as("w"))
      .agg(avg($"w")).as[Double].head()
    assert(math.abs(mean - 1.0) < 0.02, s"mean Poisson weight $mean")
  }

  test("changepoint finds an exact level shift and breaks ties earliest") {
    // key "a": 2 events/hour for hours 0..49, then 5/hour for 50..99
    val shifted = (0 until 100).flatMap { h =>
      val c = if (h < 50) 2 else 5
      Seq.fill(c)(("a", new Timestamp(h * 3600L * 1000L)))
    }
    // key "b": perfectly uniform -> all scores 0 -> earliest candidate
    val flat = (0 until 100).map(h =>
      ("b", new Timestamp(h * 3600L * 1000L)))
    val events = (shifted ++ flat).toDF("event_type", "ts")
    val out = Timeseries.changepoint(events, "event_type", "ts", minSeg = 24)
      .orderBy("event_type").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("split_t") === 49L)
    assert(a.getAs[Long]("left_mean_milli") === 2000L)
    assert(a.getAs[Long]("right_mean_milli") === 5000L)
    // exact score at the true split: d = s1·n2 − s2·n1 = 100·50−250·50
    assert(a.getAs[Long]("score") === {
      val d = 100L * 50 - 250L * 50; d * d / (50L * 50)
    })
    assert(b.getAs[Long]("split_t") === 23L) // i = minSeg, earliest tie
    assert(b.getAs[Long]("score") === 0L)
  }

  test("poissonBootstrapCi is deterministic and brackets the point mean") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val a = Sampling.poissonBootstrapCi(orders, "o_orderkey",
      "o_orderpriority", "o_totalprice", b = 100, seed = 33)
      .orderBy("o_orderpriority").collect()
    val b = Sampling.poissonBootstrapCi(orders, "o_orderkey",
      "o_orderpriority", "o_totalprice", b = 100, seed = 33)
      .orderBy("o_orderpriority").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val lo = r.getAs[Long]("ci_lo_cents"); val hi = r.getAs[Long]("ci_hi_cents")
      val m = r.getAs[Long]("mean_cents")
      assert(lo <= hi)
      // 90% CI of the mean over ~3k orders: the point mean sits inside
      assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
      // and the interval is tight relative to the mean (sanity: the
      // bootstrap spread of a 3k-row mean is a few percent at most)
      assert(hi - lo < m / 5, s"CI [$lo, $hi] implausibly wide")
    }
  }

  test("poissonBootstrapCi on 1-row groups drops zero-weight replicates and stays NULL-free") {
    // a 1-row group loses ~37% of replicates to total-weight 0; those are
    // DROPPED (never NULL — engines sort NULLs differently) and the CI
    // ranks adapt to the surviving count. The single value is every
    // surviving replicate's mean, so the CI collapses onto it.
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 50.0))
      .toDF("g", "id", "v")
    val out = Sampling.poissonBootstrapCi(df, "id", "g", "v", b = 100, seed = 7)
      .orderBy("g").collect()
    assert(out.length === 2)
    out.foreach { r =>
      Seq("mean_cents", "ci_lo_cents", "ci_hi_cents").foreach(c =>
        assert(!r.isNullAt(r.fieldIndex(c)), s"$c NULL for ${r.getString(0)}"))
    }
    val b = out(1)
    assert(b.getAs[Long]("mean_cents") === 5000L)
    assert(b.getAs[Long]("ci_lo_cents") === 5000L)
    assert(b.getAs[Long]("ci_hi_cents") === 5000L)
  }
}
