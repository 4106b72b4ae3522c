package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Event-stream operator suite over the `events` table: the reference's
  * windowing/detection semantics (SURVEY §2.4 A1-A3/A8-A9, §2.7 F3/F8,
  * §2.8 rules, §2.3 J5 as-of) re-expressed as batch dataflow. `user_id`
  * plays `device_id`, `event_type` plays `metric_name`.
  *
  * Timestamps are exported as epoch seconds/micros (bigint) — engine-neutral,
  * unlike raw timestamp columns whose parquet logical types differ.
  */
object Events {

  val queries: Map[String, QueryFn] = Map(
    // Activity inequality (Gini) over events-per-user, exactly, with NO
    // per-user rank window: users collapse to (activity count → user
    // count) value groups, tied-rank blocks contribute in closed form
    // (Σ rank·x over a tie block = c·(m·cum_before + m(m+1)/2)), and the
    // Gini is one integer fraction (2Σrx − (n+1)Σx)·1e6 div (n·Σx) — the
    // ordered window runs over the COUNT DOMAIN, never the user set. The
    // concentration readout beside q194's HHI and q186's Pareto knees.
    "q220_activity_gini" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val per = t(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val vc = per.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val byC = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      vc.withColumn("cum_before",
          coalesce(sum(col("m")).over(byC), lit(0L)))
        .agg(
          sum(col("m")).as("n_users"),
          sum(col("c") * col("m")).as("total_events"),
          sum(col("c") * (col("m") * col("cum_before") * 2 +
            col("m") * (col("m") + 1))).as("rx2"))
        .select(col("n_users"), col("total_events"),
          expr("(rx2 - (n_users + 1) * total_events) * 1000000" +
            " div (n_users * total_events)").as("gini_ppm"))
    }),

    // Cohort survival comparison: one KM curve per signup-day cohort
    // under a shared observation cutoff — "did retention improve for
    // later signups?" beside q87's return-rate grid. Same exact integer
    // recurrence as q224, folded per cohort.
    "q238_cohort_survival" -> ((s, dir) =>
      graft.operators.Survival.kaplanMeierByCohort(
        t(s, dir, "events"), "user_id", "ts", quietHours = 24)),

    // Multi-touch attribution model comparison: last vs linear vs
    // U-shaped (40/20/40) credit of each purchase's cents across its <=
    // 10 preceding touches, per channel — exact milli splits that
    // conserve revenue under every model. The which-rule-changes-the-
    // answer table beside q217's last-touch lag histogram.
    "q234_attribution_models" -> ((s, dir) =>
      graft.operators.Attribution.modelComparison(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          "value", conversionType = "purchase", maxTouches = 10)
        .orderBy(col("channel"))),

    // Forecast backtest per event type: naive vs seasonal-naive vs
    // 24-hour moving average on the last week of the hourly grid,
    // integer-milli MAE and the winner (ties prefer simpler). The
    // ship-a-baseline-first model-selection readout beside q201's
    // decomposition and q149's ACF.
    "q233_forecast_backtest" -> ((s, dir) =>
      graft.operators.Timeseries.forecastBacktest(
          t(s, dir, "events"), "event_type", "ts", holdout = 168)
        .orderBy(col("event_type"))),

    // Exact single-changepoint per event type: the split of the hourly
    // count series maximizing between-segment SSE reduction, pure-int64
    // score algebra so the argmax is engine-exact (ties to the earliest
    // split). q139's CUSUM says "a shift happened"; this pins down WHERE.
    "q230_changepoint" -> ((s, dir) =>
      graft.operators.Timeseries.changepoint(
          t(s, dir, "events"), "event_type", "ts", minSeg = 24)
        .orderBy(col("event_type"))),

    // Kaplan-Meier survival over user lifetimes: censoring done right
    // (users active near the corpus edge leave the risk set without
    // counting as churn), exact integer ppm via a sequential rounded
    // product over the lifetime DOMAIN — the corpus pays one
    // groupBy(user); the ordered recurrence runs over <= hours-of-history
    // rows inside one aggregate HOF.
    "q224_survival_km" -> ((s, dir) =>
      graft.operators.Survival.kaplanMeier(
        t(s, dir, "events"), "user_id", "ts", quietHours = 24)),

    // Exact DAU + rolling 7-day WAU per day. Sliding-window DISTINCT is
    // the classic trap (a range self-join degenerates to a nested loop);
    // here each (user, day) row EXPANDS to the ≤7 window days it serves
    // (bounded fan-out, equi-join shape end to end), then one distinct
    // count per day — day-domain-sized output, no non-equi join anywhere.
    "q219_rolling_wau" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = ud.select(col("day")).distinct()
      val contrib = ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      val wau = contrib.join(days, Seq("day"), "left_semi")
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      dau.join(wau, Seq("day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"))
        .orderBy(col("day"))
    }),

    // Last-touch attribution: each purchase credited to the user's most
    // recent preceding view within 7 days, with the view→purchase lag
    // bucketed — the marketing conversion-window readout. One per-user
    // ignore-nulls `last` window; no self-join.
    "q217_last_touch_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .withColumn("last_view_us",
          last(when(col("event_type") === "view", unix_micros(col("ts"))),
            ignoreNulls = true).over(byUser))
        .filter(col("event_type") === "purchase" &&
          col("last_view_us").isNotNull)
        .withColumn("lag_s",
          expr("(unix_micros(ts) - last_view_us) div 1000000"))
        .filter(col("lag_s") <= 7L * 24 * 3600)
        .withColumn("bucket",
          when(col("lag_s") < 60, "0_under_1m")
            .when(col("lag_s") < 600, "1_under_10m")
            .when(col("lag_s") < 3600, "2_under_1h")
            .when(col("lag_s") < 86400, "3_under_1d")
            .otherwise("4_under_7d"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_purchases"),
          expr("sum(lag_s) div count(1)").as("mean_lag_s"))
        .orderBy(col("bucket"))
    }),

    // The STREAMING seasonal monitor run in batch mode — same code path,
    // same integer arithmetic as its stream form (stream-static broadcast
    // baseline join + windowed counts), so the online operator itself
    // sits under the DuckDB hash gate (q107/q147/q157 discipline).
    "q212_streaming_seasonal_batch" -> ((s, dir) => {
      import graft.streaming.StreamingSeasonal
      val ev = t(s, dir, "events")
      StreamingSeasonal.residuals(ev,
          StreamingSeasonal.baseline(ev, col("ts")), "ts")
        .orderBy(col("slot"))
    }),

    // Per-event-type dwell time: seconds until the user's NEXT in-session
    // event (q46's 1800 s gap rule bounds a dwell) — which screens hold
    // attention and which bounce. One per-user lead window, exact integer
    // micros folded per type.
    "q207_session_dwell" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", lead(col("us"), 1).over(byUser) - col("us"))
        .filter(col("gap_us").isNotNull && col("gap_us") <= 1800L * 1000000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_dwells"),
          expr("(sum(gap_us) div count(1)) div 1000").as("mean_dwell_ms"),
          expr("max(gap_us) div 1000").as("max_dwell_ms"))
        .orderBy(col("event_type"))
    }),

    // Seasonal-baseline residuals: each observed hour's traffic vs its
    // (day-of-week, hour) baseline mean — the weekly-seasonality-aware
    // burst/dip detector (q172's heatmap is the baseline; this ranks the
    // hours that break it). Exact integer cross-difference, top 20.
    "q201_seasonal_residual" -> ((s, dir) => {
      graft.operators.Timeseries.seasonalResiduals(
        t(s, dir, "events"), col("ts"), topN = 20)
    }),

    // SCD2 dimension build from the event change log: per user, each
    // maximal run of equal event_type becomes one validity interval
    // (valid_from, valid_to, is_current) — the warehouse point-in-time
    // join primitive. Gaps-and-islands windows per user; event_id breaks
    // equal-timestamp ties deterministically.
    "q145_scd2_intervals" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Timeseries.scd2Intervals(
          t(s, dir, "events").filter($"user_id" < 20),
          "user_id", "ts", "event_id", "event_type")
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("from_us"),
          unix_micros($"valid_to").as("to_us"), $"is_current")
        .orderBy($"user_id", $"from_us")
    }),

    // Tumbling 60 s window aggregation (reference A1: floor-to-window
    // bucketing, kafka_consumer.py:285-289) via Spark's window().
    "q10_window_tumbling" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "60 seconds").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value", 2).as("sum_value"))
        .select($"w.start".cast("long").as("window_start"), $"event_type", $"n", $"sum_value")
        .orderBy($"window_start", $"event_type")
    }),

    // Sliding 5 min / 1 min windows (Spark window(ts, len, slide)).
    "q11_window_sliding" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "300 seconds", "60 seconds").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".cast("long").as("window_start"), $"event_type", $"n")
        .orderBy($"window_start", $"event_type")
    }),

    // Narrow→wide pivot (reference A3: rows → per-entity metric map,
    // kafka_consumer.py:421-446): per-user average value per event type as
    // wide columns, all in exact decimal arithmetic.
    "q12_pivot_wide" -> ((s, dir) => {
      import s.implicits._
      def avgFor(tpe: String) = {
        val cnt = count(when($"event_type" === tpe, 1))
        val total = sum(when($"event_type" === tpe, $"value").cast(DecimalType(30, 2))).cast("double")
        when(cnt > 0, total / cnt)
      }
      t(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          avgFor("click").as("click_avg"), avgFor("error").as("error_avg"),
          avgFor("purchase").as("purchase_avg"), avgFor("signup").as("signup_avg"),
          avgFor("view").as("view_avg"))
        .orderBy($"user_id")
    }),

    // Path 1 statistical outliers (reference F8/z-score,
    // anomaly_detection.py:47-73): z vs per-event-type population stats,
    // flag z > 3. Stats via exact decimal sums so both engines derive
    // identical doubles.
    "q14_zscore_outliers" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val stats = ev.groupBy($"event_type").agg(
        (dsum($"value", 2) / count(lit(1))).as("mu"),
        sqrt((dsum($"value" * $"value", 4) / count(lit(1))) -
          (dsum($"value", 2) / count(lit(1))) *
            (dsum($"value", 2) / count(lit(1)))).as("sigma"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", abs($"value" - $"mu") / $"sigma")
        .filter($"sigma" > 0 && $"z" > 3)
        .select($"event_id", $"event_type", round($"z", 4).as("z"))
        .orderBy($"event_id")
    }),

    // Per-entity profile stats (reference A5: mean/std/min/max per metric,
    // build_profiles.py:108-135; std is population std for NumPy parity).
    "q15_user_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          (dsum($"value", 2) / count(lit(1))).as("mean_value"),
          // mu*mu, not pow(mu,2): multiplication is a single correctly-
          // rounded IEEE op in every engine, while pow() differs by 1 ulp
          // between libm implementations (seen at sf0.1)
          sqrt((dsum($"value" * $"value", 4) / count(lit(1))) -
            (dsum($"value", 2) / count(lit(1))) *
            (dsum($"value", 2) / count(lit(1)))).as("std_value"),
          min($"value").as("min_value"),
          max($"value").as("max_value"))
        .orderBy($"user_id")
    }),

    // Latest row per entity (reference A11 argmax / W3 ORDER BY ... LIMIT 1,
    // dashboard/app.py:147-154) via max_by over a composite order key.
    "q16_latest_event_per_user" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .agg(max_by(
          struct($"event_id", $"event_type", $"value", unix_micros($"ts").as("ts_us")),
          struct($"ts", $"event_id")).as("e"))
        .select($"user_id", $"e.event_id".as("event_id"), $"e.event_type".as("event_type"),
          $"e.value".as("value"), $"e.ts_us".as("ts_us"))
        .orderBy($"user_id")
    }),

    // As-of join (reference J5, dashboard/app.py:532-541 bucket-matching,
    // strengthened to a true as-of): each error event paired with the most
    // recent click of the same user at-or-before it — last_value over an
    // ordered window, no self-join.
    "q17_asof_click_before_error" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .withColumn("click_us",
          last(when($"event_type" === "click", unix_micros($"ts")), ignoreNulls = true).over(w))
        .filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"click_us")
        .orderBy($"event_id")
    }),

    // Consensus vote (reference A9: >=2 of 3 methods agree,
    // detect_anomalies_all.py:219-231).
    "q18_consensus_flags" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("n_flags",
          ($"value" > 100).cast("int") + ($"event_type" === "error").cast("int") +
            (hour($"ts") < 6).cast("int"))
        .filter($"n_flags" >= 1)
        .select($"event_id", $"n_flags".cast("bigint").as("n_flags"),
          ($"n_flags" >= 2).as("is_consensus"))
        .orderBy($"event_id")
    }),

    // Rules engine + score (reference R1/R2 threshold+relationship rules and
    // F11 score min(1, 0.3*crit + 0.1*warn), detect_anomalies_rules.py):
    // per (user, 60 s window): critical if error-value sum > 100; warnings
    // for click-without-purchase and any value > 400.
    "q19_rules_score" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", window($"ts", "60 seconds").as("w"))
        .agg(
          sum(when($"event_type" === "error", $"value").cast(DecimalType(30, 2)))
            .cast("double").as("err_sum"),
          count(when($"event_type" === "click", 1)).as("n_click"),
          count(when($"event_type" === "purchase", 1)).as("n_purchase"),
          max($"value").as("max_value"))
        .select(
          $"user_id", $"w.start".cast("long").as("window_start"),
          (coalesce($"err_sum", lit(0.0)) > 100).cast("int").as("crit"),
          (($"n_click" > 0 && $"n_purchase" === 0).cast("int") +
            ($"max_value" > 400).cast("int")).as("warn"))
        .withColumn("n_crit", $"crit".cast("bigint"))
        .withColumn("n_warn", $"warn".cast("bigint"))
        .withColumn("score", least(lit(1.0), $"crit" * 0.3 + $"warn" * 0.1))
        .filter($"n_crit" + $"n_warn" > 0)
        .select($"user_id", $"window_start", $"n_crit", $"n_warn", $"score")
        .orderBy($"user_id", $"window_start")
    }),
    // Top-3 outliers per entity (reference W6: worst 3 z-scores shown in
    // details, anomaly_detection.py:156-159) — rank within partition.
    "q13_top3_outliers_per_user" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val stats = ev.groupBy($"event_type").agg(
        (dsum($"value", 2) / count(lit(1))).as("mu"),
        sqrt((dsum($"value" * $"value", 4) / count(lit(1))) -
          (dsum($"value", 2) / count(lit(1))) *
            (dsum($"value", 2) / count(lit(1)))).as("sigma"))
      val w = Window.partitionBy($"user_id").orderBy($"z".desc, $"event_id".asc)
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", abs($"value" - $"mu") / $"sigma")
        .filter($"sigma" > 0)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"user_id", $"rk".cast("bigint").as("rk"), $"event_id", round($"z", 4).as("z"))
        .orderBy($"user_id", $"rk")
    }),

    // Map-diff semantics flattened to rows (reference J4/F13: element-wise
    // % change between two metric maps, find_similar_states.py:152-170):
    // each (user, window, type) sum vs the previous window's, μ=0 guarded.
    "q44_window_metric_diff" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"window_start")
      t(s, dir, "events")
        .groupBy($"user_id", window($"ts", "3600 seconds").as("w"), $"event_type")
        .agg(dsum($"value", 2).as("cur"))
        .select($"user_id", $"w.start".cast("long").as("window_start"), $"event_type", $"cur")
        .withColumn("prev", lag($"cur", 1).over(w))
        .filter($"prev".isNotNull && $"prev" =!= 0.0)
        .select($"user_id", $"window_start", $"event_type",
          round(($"cur" - $"prev") / $"prev" * 100.0, 4).as("pct_change"))
        .orderBy($"user_id", $"window_start", $"event_type")
    }),

    // Gap-based sessionization: a new session starts after 30 min of
    // inactivity per user (lag + cumulative-sum boundary trick — the batch
    // equivalent of streaming session windows).
    "q46_sessionize" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
        .withColumn("is_new",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum($"is_new").over(cum))
        .groupBy($"user_id", $"session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          min(unix_micros($"ts")).as("session_start_us"),
          max(unix_micros($"ts")).as("session_end_us"))
        .orderBy($"user_id", $"session_idx")
    }),

    // Session-level product rollup on q46's boundary rule: per user the
    // session count, bounce share (single-event sessions) and mean
    // session length — the engagement report a sessionized stream feeds.
    // Same one-window session assignment; the rollup adds one keyed
    // aggregate, all-integer readouts.
    "q160_session_summary" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
      val sess = t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
        .withColumn("is_new",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum($"is_new").over(cum))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_ev"),
          min(unix_micros($"ts")).as("s_us"), max(unix_micros($"ts")).as("e_us"))
      sess.groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(when($"n_ev" === 1, 1L).otherwise(0L)).as("bounce_sessions"),
          sum($"n_ev").as("total_events"),
          sum($"e_us" - $"s_us").as("_dur_us"))
        .select($"user_id", $"n_sessions", $"bounce_sessions", $"total_events",
          expr("(_dur_us div 1000000) div n_sessions").as("mean_session_secs"),
          expr("bounce_sessions * 1000000 div n_sessions").as("bounce_ppm"))
        .orderBy($"user_id")
    }),

    // Counter-table recompute (reference A7: device_statistics counters —
    // Spark has no mutable counters; recompute, SURVEY §7.3 hard-part 4).
    "q45_user_counters" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("total_events"),
          count(when($"value" > 100, 1)).as("high_value_count"),
          max(unix_micros($"ts")).as("last_seen_us"))
        .orderBy($"user_id")
    }),

    // Banded interval join (time-window correlation, an operator Spark has
    // no native form of): clicks within ±120 s of each error, per user —
    // pure equi-join on (user_id, time band), never a nested loop; zero-
    // match errors kept via the banded left join (RangeJoin scaladoc).
    "q67_interval_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val err = ev.filter($"event_type" === "error")
        .select($"user_id", $"event_id".as("err_id"), unix_micros($"ts").as("err_us"))
      val clk = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("clk_id"), unix_micros($"ts").as("clk_us"))
      graft.operators.RangeJoin.countWithin(err, clk, Seq("user_id"),
          "err_us", "clk_us", window = 120L * 1000000L,
          rightKey = "clk_id", as = "n_near_clicks")
        .select($"err_id", $"err_us", $"n_near_clicks")
        .orderBy($"err_id")
    }),

    // Retention cohorts: users grouped by first-activity day, distinct
    // actives per (cohort, day offset). The cohort table is |users| rows
    // — it GROWS with the corpus, so it joins back on the SAME user_id
    // key its aggregation partitioned on (exchange reuse, no broadcast:
    // a billion-user cohort table must never be a build side). The
    // product-analytics staple over the events stream. SURVEY §2.4 A6 +
    // §2.6 F1 (date bucketing).
    "q87_retention_cohorts" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events").select($"user_id", to_date($"ts").as("d"))
      val first = e.groupBy($"user_id").agg(min($"d").as("chd"))
      e.join(first, Seq("user_id"))
        .groupBy($"chd", datediff($"d", $"chd").cast("bigint").as("day_n"))
        .agg(countDistinct($"user_id").as("n_users"))
        .select(date_format($"chd", "yyyy-MM-dd").as("cohort"), $"day_n", $"n_users")
        .orderBy($"cohort", $"day_n")
    }),

    // Distribution drift per event type: total-variation distance (ppm)
    // between the first period's and the rest's binned value histograms.
    // ONE conditional-count pass builds both histograms; integer ppm
    // arithmetic keeps the score engine-exact. The train-vs-serve /
    // week-over-week skew monitor at corpus scale.
    "q92_value_drift" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Histogram.tvDrift(t(s, dir, "events"),
          "event_type", "value",
          isA = $"ts" < lit("2024-01-10").cast("timestamp"), binWidth = 5.0)
        .orderBy($"event_type")
    }),

    // Per-type value trend (least-squares slope over time): the moment
    // sums Σx, Σy, Σxy, Σx² accumulate EXACTLY in decimal (x centered to
    // a small epoch offset so products stay inside decimal(38)), and the
    // slope/intercept are a fixed scalar double expression over those
    // exact sums — order-independent at any parallelism, unlike a naive
    // double regr_slope whose partial-sum order drifts. One scan, one
    // shuffle of 5 numbers per group.
    "q98_trend_slope" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.Trend
      val e = t(s, dir, "events").select($"event_type",
        (unix_timestamp($"ts") - 1704067200L).cast(DecimalType(10, 0)).as("x"),
        $"value".cast(DecimalType(12, 2)).as("y"))
      Trend.slope(Trend.momentSums(e, "event_type", "x", "y"),
          "event_type", unitsPerX = 86400d, scale = 6)
        .orderBy($"event_type")
    }),

    // The STREAMING funnel state machine under the correctness gate:
    // StreamingFunnel.track runs the same flatMapGroupsWithState code on
    // a batch Dataset, so the per-user stage frontier it maintains on a
    // stream is hash-checked against the SQL min-chain oracle here —
    // stream semantics, batch-verified.
    "q107_funnel_stages" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.StreamingFunnel
      val ev = t(s, dir, "events")
        .filter($"event_type".isin("view", "click", "purchase"))
        .select($"user_id",
          when($"event_type" === "view", 0)
            .when($"event_type" === "click", 1).otherwise(2).as("stage"),
          unix_micros($"ts").as("epoch_us"))
        .as[StreamingFunnel.FunnelEvent]
      val M = Long.MaxValue
      StreamingFunnel.track(ev, nStages = 3)
        .select($"user_id",
          when($"stageUs"(0) === M, lit(null)).otherwise($"stageUs"(0)).as("v_us"),
          when($"stageUs"(1) === M, lit(null)).otherwise($"stageUs"(1)).as("c_us"),
          when($"stageUs"(2) === M, lit(null)).otherwise($"stageUs"(2)).as("p_us"))
        .orderBy($"user_id")
    }),

    // Semi-structured extraction: the props column is a JSON document;
    // get_json_object pulls the typed field inside whole-stage codegen —
    // no UDF, no schema migration — and the aggregate runs on the
    // extracted value. The scan still prunes to (event_type, props).
    "q104_json_props" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("bigint").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"),
          countDistinct($"k").as("n_distinct_k"))
        .orderBy($"event_type")
    }),

    // Robust outliers via median absolute deviation: MAD tolerates the
    // heavy tails that inflate stddev-based z-scores (q14's method).
    // Two grouped exact percentiles; both the median table and the MAD
    // table are |groups| rows and broadcast back over the scan.
    "q101_mad_outliers" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events").select($"event_type", $"value")
      val med = e.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("m"))
      val dev = e.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs($"value" - $"m"))
      val mad = dev.groupBy($"event_type")
        .agg(expr("percentile(ad, 0.5)").as("madv"), min($"m").as("m"))
      dev.drop("m").join(broadcast(mad), Seq("event_type"))
        .filter($"ad" > lit(4.4478) * $"madv") // 3 x 1.4826 (normal-consistent)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_outliers"),
          round(min($"m"), 6).as("median"), round(min($"madv"), 6).as("mad"))
        .orderBy($"event_type")
    }),

    // Conversion funnel view -> click -> purchase: earliest qualifying
    // event per stage per user (each stage at or after the previous
    // one). Three filtered aggregates chained on the user key — the
    // sequential-pattern staple without any per-user sort; gap averages
    // in whole seconds via integer division.
    "q99_funnel" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      val v = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"us").as("v_us"))
      val c = e.filter($"event_type" === "click").join(v, Seq("user_id"))
        .filter($"us" >= $"v_us")
        .groupBy($"user_id").agg(min($"us").as("c_us"), min($"v_us").as("v_us"))
      val p = e.filter($"event_type" === "purchase").join(c, Seq("user_id"))
        .filter($"us" >= $"c_us")
        .groupBy($"user_id").agg(min($"us").as("p_us"), min($"c_us").as("c_us"))
      // per-user gaps floor to whole seconds BEFORE the sum: a sum of
      // microsecond gaps overflows bigint near 1e9 users x 1-day gaps
      v.agg(count(lit(1)).as("n_view")).crossJoin(
          c.agg(count(lit(1)).as("n_click"),
            expr("sum((c_us - v_us) div 1000000) div count(1)").as("avg_v2c_s")))
        .crossJoin(
          p.agg(count(lit(1)).as("n_purchase"),
            expr("sum((p_us - c_us) div 1000000) div count(1)").as("avg_c2p_s")))
    }),

    // Feature normalization: min-max + z-score + EXACT quantile rank in
    // one operator. The rank avoids the global sort via value-ordered
    // buckets (per-bucket parallel windows + broadcast cumulative
    // offsets); the oracle uses the global window the operator refuses.
    "q112_feature_normalize" -> ((s, dir) => {
      graft.operators.Normalize.featureScale(t(s, dir, "events"),
          "event_id", "value")
        .orderBy(col("event_id"))
    }),

    // Dense hourly per-user series with LOCF gap fill: grid cost is
    // output-sized (exploded from a per-key min/max agg), LOCF window
    // sorts within each key's hour span only — no global sort anywhere.
    "q115_gap_fill_locf" -> ((s, dir) => {
      graft.operators.Timeseries.gapFillHourlyLocf(t(s, dir, "events"),
          "user_id", "ts", "value")
        .orderBy(col("user_id"), col("hr"))
    }),

    // Per-user autocorrelation at lags 1-3 of the hourly value series —
    // the seasonality / burst-persistence feature. One (user, hour)
    // groupBy is the only corpus-sized shuffle; lag windows and moments
    // are per-key; integer moment sums (double-exact) combine in IEEE
    // doubles with an oracle-identical expression shape.
    "q149_hourly_acf" -> ((s, dir) => {
      graft.operators.Timeseries.hourlyAcf(t(s, dir, "events"),
          "user_id", "ts", "value", maxLag = 3)
        .orderBy(col("user_id"), col("lag"))
    }),

    // Inter-arrival burstiness per user: CV of the gap-seconds series —
    // CV ≈ 1 Poisson, ≫ 1 bursty (bots/batch replays), ≈ 0 metronome.
    // One per-key lag window + one keyed aggregate; exact integer gap
    // moments, IEEE-double readout with an oracle-identical shape.
    "q154_interarrival_stats" -> ((s, dir) => {
      graft.operators.Timeseries.interArrivalStats(t(s, dir, "events"),
          "user_id", "ts", "event_id")
        .orderBy(col("user_id"))
    }),

    // First-order event-type transition matrix with per-origin ppm rates
    // — the Markov journey model next to q107's funnel. One per-user lag
    // window; everything downstream is |types|²-sized.
    "q155_event_transitions" -> ((s, dir) => {
      graft.operators.Timeseries.transitionMatrix(t(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type")
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // The STREAMING transition extractor run in batch mode: the
    // flatMapGroupsWithState machine (O(1) last-event state per key)
    // replays each group in (time, seq) order, so its batch output is
    // exactly q155's lag-window pairs — the state-machine code itself
    // sits under the driver's hash gate (the q107/q147 discipline).
    // Replay / double-fire scrub: events whose identical predecessor
    // (same user + type) fired within 300 s — the at-least-once-delivery
    // artifact to drop before counting. The identity shares a window
    // partition by construction: one lag window, no self-join.
    "q159_event_replay_dupes" -> ((s, dir) => {
      graft.operators.Timeseries.replayDuplicates(t(s, dir, "events"),
          Seq("user_id", "event_type"), "ts", "event_id", windowSec = 300L)
        .orderBy(col("event_id"))
    }),

    "q157_streaming_transitions_batch" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.StreamingTransitions
      val ev = t(s, dir, "events")
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("epoch_us"),
          col("event_id").as("seq"), col("event_type").as("etype"))
        .as[StreamingTransitions.Step]
      StreamingTransitions.steps(ev)
        .groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("_tot", sum(col("n")).over(Window.partitionBy(col("prev_type"))))
        .select(col("prev_type"), col("next_type"), col("n"),
          expr("n * 1000000 div _tot").as("rate_ppm"))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // CDC snapshot diff: each user's latest value as of Jan 15 vs Jan 30,
    // emitted as the added/changed delta — BOTH snapshots fall out of one
    // groupBy via conditional max_by (null ordering rows are ignored), so
    // the diff costs one corpus scan and one key shuffle.
    "q123_snapshot_diff" -> ((s, dir) => {
      graft.operators.Timeseries.snapshotDiff(t(s, dir, "events"),
          "user_id", "ts", "event_id", "value",
          oldUpTo = lit("2024-01-15").cast("timestamp"),
          newUpTo = lit("2024-01-30").cast("timestamp"))
        .orderBy(col("user_id"))
    }),

    // Hot-key audit on the event stream's natural join key: the top-10
    // heaviest users with share and heat vs a uniform distribution — the
    // "do I need to salt this join, and by how much" diagnostic.
    "q132_skew_audit" -> ((s, dir) => {
      graft.operators.Skew.skewAudit(t(s, dir, "events"), "user_id", topK = 10)
        .orderBy(col("rk"))
    }),

    // EWMA control chart per user: the memoryful upgrade of the q14
    // z-score test — each reading judged against the exponentially
    // smoothed state of everything before it, not a static mean. The
    // sequential recurrence runs as a codegen'd left-to-right fold over
    // the user's time-ordered series (one shuffle); every fold step is
    // mirrored token-for-token by the oracle's list_reduce.
    "q138_ewma_control" -> ((s, dir) => {
      graft.operators.ControlChart.ewma(t(s, dir, "events"),
          "user_id", "ts", "event_id", "value", alpha = 0.2, nSigma = 3.0)
        .orderBy(col("user_id"))
    }),

    // Two-sided CUSUM drift detector per user: accumulates small
    // persistent shifts the point tests (q14/q138) are blind to, firing
    // and resetting when an accumulator crosses the decision interval.
    // Same fold machinery and oracle discipline as q138.
    "q139_cusum_shift" -> ((s, dir) => {
      graft.operators.ControlChart.cusum(t(s, dir, "events"),
          "user_id", "ts", "event_id", "value", kSigma = 0.5, hSigma = 4.0)
        .orderBy(col("user_id"))
    }),

    // Top event-type TRIGRAM journeys: q155's first-order transition
    // matrix extended one step — the 3-event paths users actually walk,
    // ranked. Per-user lead() windows (identity-partitioned, no
    // self-join), then a type-trigram aggregate whose domain is bounded
    // by |event_type|^3, so the final top-25 sort is broadcast-class.
    "q167_event_trigrams" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("e2", lead(col("event_type"), 1).over(byUser))
        .withColumn("e3", lead(col("event_type"), 2).over(byUser))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(25)
    }),

    // Session-level event-type association (PMI-style lift): for each
    // unordered type pair, how much more often they co-occur in one
    // session than independence predicts — lift_ppm =
    // n_ab·n_sessions·10^6 div (n_a·n_b), exact integers. Sessions are
    // q46's 30-min-gap rule; the pair join is per-session over the
    // bounded distinct-type set, never a row-level self-join.
    "q169_session_pmi" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
      val st = t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(cum))
        .select(col("user_id"), col("session_idx"), col("event_type"))
        .distinct()
        // four consumers (pair sides, marginals, session count) — pin the
        // session×type table (bounded: sessions × |event_type|) so the
        // event-level window runs once
        .localCheckpoint()
      val nSess = st.select(col("user_id"), col("session_idx")).distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val marg = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      val pairs = st.as("a")
        .join(st.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.session_idx") === col("b.session_idx") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(marg.select(col("event_type").as("type_a"),
          col("n_t").as("n_a"))), Seq("type_a"))
        .join(broadcast(marg.select(col("event_type").as("type_b"),
          col("n_t").as("n_b"))), Seq("type_b"))
        .crossJoin(broadcast(nSess))
        .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          expr("n_ab * n_sessions * 1000000 div (n_a * n_b)").as("lift_ppm"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // The streaming streak state machine on a batch frame: one group
    // pass replays each user's full history, so the O(1)-state tracker's
    // output ≡ q176's gaps-and-islands window for ANY input — the
    // q107/q147/q157 discipline; this row puts the STREAMING code path
    // itself under the driver's oracle gate.
    "q179_streaming_streaks_batch" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.StreamingStreaks
      val ev = t(s, dir, "events")
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("epoch_us"),
          col("event_id").as("seq"),
          (col("event_type") === "error").as("is_err"))
        .as[StreamingStreaks.Ev]
      StreamingStreaks.streaks(ev)
        .filter(col("n_errors") > 0)
        .select(col("key").as("user_id"), col("n_errors"), col("max_streak"))
        .orderBy(col("user_id"))
    }),

    // Longest consecutive-error streak per user (gaps-and-islands on the
    // event sequence): the "how broken did it get" reliability readout
    // that point error counts hide. Two row_numbers on the same per-user
    // sort; their difference is constant exactly inside a streak.
    "q176_error_streaks" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byErr = Window.partitionBy(col("user_id"), col("is_err"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("is_err", col("event_type") === "error")
        .withColumn("g",
          row_number().over(byUser) - row_number().over(byErr))
        .filter(col("is_err"))
        .groupBy(col("user_id"), col("g"))
        .agg(count(lit(1)).as("streak"))
        .groupBy(col("user_id"))
        .agg(sum(col("streak")).as("n_errors"),
          max(col("streak")).as("max_streak"))
        .orderBy(col("user_id"))
    }),

    // Weekly activity trend with week-over-week change: calendar rollup
    // plus a lag over the (year, week)-ordered 5-row summary — the
    // trend-line companion to q172's heatmap. The ratio is ONE double
    // division of exact integers (integer div truncation differs between
    // engines on negatives, so the readout stays float, rounded).
    "q177_weekly_trend" -> ((s, dir) => {
      val byWeek = Window.orderBy(col("yr"), col("wk"))
      t(s, dir, "events")
        .groupBy(year(col("ts")).cast("bigint").as("yr"),
          weekofyear(col("ts")).cast("bigint").as("wk"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("prev", lag(col("n_events"), 1).over(byWeek))
        .select(col("yr"), col("wk"), col("n_events"), col("n_users"),
          (col("n_events") - col("prev")).as("wow_diff"),
          round((col("n_events") - col("prev")).cast("double") /
            col("prev").cast("double"), 6).as("wow_ratio"))
        .orderBy(col("yr"), col("wk"))
    }),

    // Top session journey strings: the full ordered event-type path each
    // session walks, ranked by frequency — the funnel-free view of what
    // users actually do. Paths build per session from one sorted-struct
    // aggregate (no window over the corpus beyond q46's session
    // assignment); the final top-20 sorts only distinct paths.
    "q178_journey_paths" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
      val paths = t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(us, event_id, event_type)))," +
            " x -> x.event_type)"), ">").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // Conversion rate by session depth: does a longer session convert
    // more? — sessions bucketed by event count (1, 2-3, 4-7, 8+), each
    // bucket's purchase-containing fraction in exact-integer ppm. Builds
    // on q46's one-window session assignment; everything after the
    // per-session aggregate is bucket-sized.
    "q184_session_conversion" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
      val sess = t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
      sess
        .groupBy(
          when(col("n_events") === 1, "1")
            .when(col("n_events") <= 3, "2-3")
            .when(col("n_events") <= 7, "4-7")
            .otherwise("8+").as("depth_bucket"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("converted")).as("n_converted"))
        .select(col("depth_bucket"), col("n_sessions"), col("n_converted"),
          expr("n_converted * 1000000 div n_sessions").as("cvr_ppm"))
        .orderBy(col("depth_bucket"))
    }),

    // Cold-start integrity check: users whose FIRST event is already a
    // purchase (no preceding view/click/signup) — upstream-loss or bot
    // signal. One per-user min-struct aggregate, no window.
    "q193_cold_start_users" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(struct(unix_micros(col("ts")).as("us"),
          col("event_id").as("eid"), col("event_type").as("et"))).as("f"),
          count(lit(1)).as("n_events"))
        .filter(col("f.et") === "purchase")
        .select(col("user_id"), col("f.us").as("first_us"),
          col("n_events"))
        .orderBy(col("user_id"))
    }),

    // Multi-aggregate pivot: per user, click/view columns carrying BOTH
    // an event count and an exact-decimal value sum — the narrow→wide
    // reshape (q12) generalized to several measures per pivot cell.
    "q191_multi_pivot" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(30, 6))).cast("double").as("val"))
        // pivot yields null (not 0) for an absent (user, type) cell;
        // normalize counts so both engines agree on empty cells
        .select(col("user_id"),
          coalesce(col("click_n"), lit(0L)).as("click_n"), col("click_val"),
          coalesce(col("view_n"), lit(0L)).as("view_n"), col("view_val"))
        .orderBy(col("user_id"))
    }),

    // User lifetime-value deciles: users ranked by total purchase value
    // into ntile(10) bands, each band's population, exact-decimal value
    // mass and share ppm — the targeting/LTV table product analytics
    // builds first. One user-level aggregate; the decile window runs
    // over users.
    "q188_user_value_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val users = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast(DecimalType(30, 6))).as("val"))
      val tot = users.agg(count(lit(1)).as("n"), sum(col("val")).as("total"))
      // distributed rank (PrefixSum — no single-partition window over the
      // user domain) + the SQL-standard ntile formula on (rk, n): the
      // first n%10 buckets get ceil(n/10) rows, the rest floor(n/10) —
      // identical to ntile(10) (PrefixSumSpec) and to DuckDB's.
      graft.operators.PrefixSum.withRunningTotals(users,
          Seq(col("val").desc, col("user_id")), Seq((lit(1L), "rk")))
        .crossJoin(broadcast(tot))
        .withColumn("decile",
          when(col("rk") <= (col("n") % 10) * (expr("n div 10") + 1),
            expr("(rk - 1) div (n div 10 + 1) + 1"))
            .otherwise(expr(
              "n % 10 + (rk - n % 10 * (n div 10 + 1) - 1) div (n div 10) + 1"))
            .cast("bigint"))
        .drop("n", "total")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("val")).as("band_val"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_users"),
          col("band_val").cast("double").as("band_value"),
          round(col("band_val").cast("double") / col("total").cast("double"), 6)
            .as("share"))
        .orderBy(col("decile"))
    }),

    // Day-of-week × hour activity heatmap: event mass and distinct actives
    // per calendar cell, with integer-ppm share of total traffic — the
    // seasonality fingerprint behind load planning and anomaly baselines.
    // One groupBy on the (dow, hr) cell; the share join is a broadcast
    // 1-row total.
    "q172_activity_heatmap" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val tot = ev.agg(count(lit(1)).as("total"))
      ev.groupBy(
          dayofweek(col("ts")).cast("bigint").as("dow"),
          hour(col("ts")).cast("bigint").as("hr"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .crossJoin(broadcast(tot))
        .select(col("dow"), col("hr"), col("n_events"), col("n_users"),
          expr("n_events * 1000000 div total").as("share_ppm"))
        .orderBy(col("dow"), col("hr"))
    }),
  )

  private val statsCte =
    s"""WITH st AS (SELECT event_type,
       |  ${dsumSql("value", 2)} / COUNT(*) AS mu,
       |  sqrt(${dsumSql("value * value", 4)} / COUNT(*)
       |       - (${dsumSql("value", 2)} / COUNT(*))
       |         * (${dsumSql("value", 2)} / COUNT(*))) AS sigma
       |FROM events GROUP BY event_type)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Mirrors q220's closed-form tie blocks over the count domain.
    "q220_activity_gini" ->
      """WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |vc AS (SELECT c, count(*) AS m FROM per GROUP BY 1),
        |cb AS (SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS cum_before FROM vc),
        |agg AS (SELECT CAST(sum(m) AS BIGINT) AS n_users,
        |          CAST(sum(c * m) AS BIGINT) AS total_events,
        |          CAST(sum(c * (m * cum_before * 2 + m * (m + 1))) AS BIGINT)
        |            AS rx2
        |        FROM cb)
        |SELECT n_users, total_events,
        |  (rx2 - (n_users + 1) * total_events) * 1000000
        |    // (n_users * total_events) AS gini_ppm
        |FROM agg""".stripMargin,

    // Mirrors q238: q224's recurrence keyed by cohort in the recursive
    // CTE (join on cohort AND rn).
    "q238_cohort_survival" ->
      """WITH RECURSIVE per AS (
        |  SELECT user_id, min(epoch_us(ts) // 3600000000) AS f,
        |    max(epoch_us(ts) // 3600000000) AS l
        |  FROM events GROUP BY user_id),
        |e AS (SELECT max(l) AS endd FROM per),
        |u AS (SELECT f // 24 AS cw, l - f AS t,
        |        CASE WHEN endd - l >= 24 THEN 1 ELSE 0 END AS ev
        |      FROM per, e),
        |grp AS (SELECT cw, t, CAST(sum(ev) AS BIGINT) AS d,
        |          CAST(count(*) - sum(ev) AS BIGINT) AS c
        |        FROM u GROUP BY cw, t),
        |tot AS (SELECT cw, count(*) AS n FROM u GROUP BY cw),
        |r AS (SELECT g.cw, g.t, g.d, g.c,
        |        CAST(tot.n - coalesce(sum(g.d + g.c) OVER (PARTITION BY g.cw
        |          ORDER BY g.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1
        |          PRECEDING), 0) AS BIGINT) AS n,
        |        row_number() OVER (PARTITION BY g.cw ORDER BY g.t) AS rn
        |      FROM grp g JOIN tot ON tot.cw = g.cw),
        |km AS (
        |  SELECT cw, CAST(0 AS BIGINT) AS rn, CAST(1000000 AS BIGINT) AS s
        |  FROM tot
        |  UNION ALL
        |  SELECT r.cw, r.rn, CASE WHEN r.d > 0
        |      THEN (km.s * (r.n - r.d)) // r.n ELSE km.s END
        |  FROM km JOIN r ON r.cw = km.cw AND r.rn = km.rn + 1)
        |SELECT r.cw AS cohort_day, CAST(r.t AS BIGINT) AS t_hours,
        |  r.n AS n_risk, r.d AS n_events, km.s AS s_ppm
        |FROM r JOIN km ON km.cw = r.cw AND km.rn = r.rn WHERE r.d > 0
        |ORDER BY cohort_day, t_hours""".stripMargin,

    // Mirrors q234: same sequence index, same band join, same milli
    // splits with remainder-to-latest.
    "q234_attribution_models" ->
      """WITH seq AS (SELECT user_id AS u, event_type AS ch,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS i
        |  FROM events),
        |conv AS (SELECT u, i AS pi, cents FROM seq WHERE ch = 'purchase'),
        |touch AS (SELECT u, i AS ti, ch FROM seq WHERE ch <> 'purchase'),
        |j AS (SELECT c.u, c.pi, c.cents, t.ti, t.ch
        |      FROM conv c JOIN touch t ON c.u = t.u
        |        AND t.ti >= c.pi - 10 AND t.ti <= c.pi - 1),
        |g AS (SELECT u, pi, count(*) AS k, min(ti) AS first_ti,
        |        max(ti) AS last_ti
        |      FROM j GROUP BY u, pi),
        |w AS (SELECT j.ch, j.cents,
        |    CASE WHEN j.ti = g.last_ti THEN 1000 ELSE 0 END AS w_last,
        |    1000 // k + CASE WHEN j.ti = g.last_ti
        |      THEN 1000 - k * (1000 // k) ELSE 0 END AS w_linear,
        |    CASE WHEN k = 1 THEN 1000
        |         WHEN k = 2 THEN 500
        |         WHEN j.ti = g.first_ti THEN 400
        |         WHEN j.ti = g.last_ti
        |           THEN 400 + 200 - (k - 2) * (200 // (k - 2))
        |         ELSE 200 // (k - 2) END AS w_ushape
        |  FROM j JOIN g ON j.u = g.u AND j.pi = g.pi)
        |SELECT ch AS channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(cents * w_last) // 1000 AS BIGINT) AS last_cents,
        |  CAST(sum(cents * w_linear) // 1000 AS BIGINT) AS linear_cents,
        |  CAST(sum(cents * w_ushape) // 1000 AS BIGINT) AS ushape_cents
        |FROM w GROUP BY ch ORDER BY channel""".stripMargin,

    // Mirrors q233: same row-based lags/frames over the observed grid,
    // same full-24-row eligibility, same tie preference.
    "q233_forecast_backtest" ->
      """WITH series AS (SELECT event_type AS k,
        |    epoch_us(ts) // 3600000000 AS t, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT k, t, x,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    lag(x, 1) OVER (PARTITION BY k ORDER BY t) AS p_naive,
        |    lag(x, 24) OVER (PARTITION BY k ORDER BY t) AS p_snaive,
        |    CAST(sum(x) OVER (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS ws,
        |    count(*) OVER (PARTITION BY k ORDER BY t
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS wc
        |  FROM series),
        |ev AS (SELECT k, x, p_naive, p_snaive, ws // 24 AS p_ma FROM w
        |       WHERE i > n - 168 AND wc = 24),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_eval,
        |        CAST(sum(abs(x - p_naive)) AS BIGINT) AS en,
        |        CAST(sum(abs(x - p_snaive)) AS BIGINT) AS es,
        |        CAST(sum(abs(x - p_ma)) AS BIGINT) AS em
        |      FROM ev GROUP BY k)
        |SELECT k AS event_type, n_eval,
        |  en * 1000 // n_eval AS mae_naive_milli,
        |  es * 1000 // n_eval AS mae_snaive_milli,
        |  em * 1000 // n_eval AS mae_ma24_milli,
        |  CASE WHEN en * 1000 // n_eval <= es * 1000 // n_eval
        |        AND en * 1000 // n_eval <= em * 1000 // n_eval THEN 'naive'
        |       WHEN es * 1000 // n_eval <= em * 1000 // n_eval THEN 'snaive'
        |       ELSE 'ma24' END AS best
        |FROM m ORDER BY event_type""".stripMargin,

    // Mirrors q230: same prefix-sum score algebra, same earliest-split
    // tie break (rank over score desc, t asc).
    "q230_changepoint" ->
      """WITH series AS (SELECT event_type AS k,
        |    epoch_us(ts) // 3600000000 AS t, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT k, t,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY t)
        |          AS BIGINT) AS i,
        |        CAST(sum(x) OVER (PARTITION BY k ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS s1,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |        CAST(sum(x) OVER (PARTITION BY k) AS BIGINT) AS s
        |      FROM series),
        |c AS (SELECT k, t, i, s1, n, s, s1 * (n - i) - (s - s1) * i AS d
        |      FROM w WHERE i >= 24 AND i <= n - 24),
        |sc AS (SELECT k, t, i, s1, n, s,
        |         CAST(d * d // (i * (n - i)) AS BIGINT) AS score,
        |         row_number() OVER (PARTITION BY k
        |           ORDER BY d * d // (i * (n - i)) DESC, t) AS rk
        |       FROM c)
        |SELECT k AS event_type, t AS split_t, n AS n_obs,
        |  CAST(s1 * 1000 // i AS BIGINT) AS left_mean_milli,
        |  CAST((s - s1) * 1000 // (n - i) AS BIGINT) AS right_mean_milli,
        |  score
        |FROM sc WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // Mirrors q224: same at-risk accounting (cum events+censored strictly
    // before t), same floor-rounded sequential product via recursive CTE.
    "q224_survival_km" ->
      """WITH RECURSIVE per AS (
        |  SELECT user_id, min(epoch_us(ts) // 3600000000) AS f,
        |    max(epoch_us(ts) // 3600000000) AS l
        |  FROM events GROUP BY user_id),
        |e AS (SELECT max(l) AS endd FROM per),
        |u AS (SELECT l - f AS t,
        |        CASE WHEN endd - l >= 24 THEN 1 ELSE 0 END AS ev
        |      FROM per, e),
        |grp AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
        |          CAST(count(*) - sum(ev) AS BIGINT) AS c
        |        FROM u GROUP BY t),
        |r AS (SELECT t, d, c,
        |        CAST((SELECT count(*) FROM u) - coalesce(sum(d + c) OVER (
        |          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |          0) AS BIGINT) AS n,
        |        row_number() OVER (ORDER BY t) AS rn
        |      FROM grp),
        |km AS (
        |  SELECT CAST(0 AS BIGINT) AS rn, CAST(1000000 AS BIGINT) AS s
        |  UNION ALL
        |  SELECT r.rn, CASE WHEN r.d > 0
        |      THEN (km.s * (r.n - r.d)) // r.n ELSE km.s END
        |  FROM km JOIN r ON r.rn = km.rn + 1)
        |SELECT CAST(r.t AS BIGINT) AS t_hours, r.n AS n_risk, r.d AS n_events,
        |  CAST(r.d * 1000000 // r.n AS BIGINT) AS hazard_ppm,
        |  km.s AS s_ppm
        |FROM r JOIN km ON km.rn = r.rn WHERE r.d > 0
        |ORDER BY t_hours""".stripMargin,

    // Mirrors q219: (user, day) set expanded to its 7 served days,
    // distinct-counted per observed day.
    "q219_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |            FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |c AS (SELECT user_id, ud.day + CAST(i AS INTEGER) AS day
        |      FROM ud, (SELECT unnest(range(7)) AS i)),
        |w AS (SELECT c.day, count(DISTINCT user_id) AS wau
        |      FROM c JOIN days ON days.day = c.day GROUP BY 1),
        |d AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, dau, wau
        |FROM d JOIN w ON w.day = d.day ORDER BY day""".stripMargin,

    // Mirrors q217: DuckDB's IGNORE NULLS last_value over the same
    // (ts, event_id)-ordered preceding frame.
    "q217_last_touch_attribution" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
        |               IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
        |  FROM events),
        |p AS (SELECT (us - lv) // 1000000 AS lag_s FROM e
        |      WHERE event_type = 'purchase' AND lv IS NOT NULL
        |        AND (us - lv) // 1000000 <= 7 * 24 * 3600),
        |b AS (SELECT CASE WHEN lag_s < 60 THEN '0_under_1m'
        |                  WHEN lag_s < 600 THEN '1_under_10m'
        |                  WHEN lag_s < 3600 THEN '2_under_1h'
        |                  WHEN lag_s < 86400 THEN '3_under_1d'
        |                  ELSE '4_under_7d' END AS bucket, lag_s FROM p)
        |SELECT bucket, count(*) AS n_purchases,
        |  CAST(sum(lag_s) AS BIGINT) // count(*) AS mean_lag_s
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // q201's chain, every closed hour, ordered by slot (no top-N): the
    // batch run of the streaming seasonal monitor.
    "q212_streaming_seasonal_batch" ->
      """WITH s AS (SELECT date_trunc('hour', ts) AS slot, count(*) AS n_events
        |           FROM events GROUP BY 1),
        |k AS (SELECT slot, n_events,
        |        CAST(dayofweek(slot) + 1 AS BIGINT) AS dow,
        |        CAST(hour(slot) AS BIGINT) AS hr FROM s),
        |b AS (SELECT dow, hr, CAST(sum(n_events) AS BIGINT) AS total,
        |        count(*) AS n_slots FROM k GROUP BY 1, 2)
        |SELECT strftime(k.slot, '%Y-%m-%d %H') AS slot, k.dow, k.hr,
        |  k.n_events, total // n_slots AS baseline_floor,
        |  (CASE WHEN k.n_events * n_slots < total THEN -1 ELSE 1 END)
        |    * (abs(k.n_events * n_slots - total) * 1000000 // total)
        |    AS residual_ppm
        |FROM k JOIN b USING (dow, hr)
        |ORDER BY slot""".stripMargin,

    // Mirrors the q207 dwell chain: same lead window (ts, event_id
    // tie-break), same 1800 s bound, same truncating integer readouts.
    "q207_session_dwell" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |d AS (SELECT event_type, nxt - us AS gap FROM e
        |      WHERE nxt IS NOT NULL AND nxt - us <= 1800 * 1000000)
        |SELECT event_type, count(*) AS n_dwells,
        |  (CAST(sum(gap) AS BIGINT) // count(*)) // 1000 AS mean_dwell_ms,
        |  CAST(max(gap) AS BIGINT) // 1000 AS max_dwell_ms
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Timeseries.seasonalResiduals: hourly counts, 168-slot
    // baseline, sign·(|n·slots − total|·1e6 // total) residual.
    "q201_seasonal_residual" ->
      """WITH s AS (SELECT date_trunc('hour', ts) AS slot, count(*) AS n_events
        |           FROM events GROUP BY 1),
        |k AS (SELECT slot, n_events,
        |        CAST(dayofweek(slot) + 1 AS BIGINT) AS dow,
        |        CAST(hour(slot) AS BIGINT) AS hr FROM s),
        |b AS (SELECT dow, hr, CAST(sum(n_events) AS BIGINT) AS total,
        |        count(*) AS n_slots FROM k GROUP BY 1, 2)
        |SELECT strftime(k.slot, '%Y-%m-%d %H') AS slot, k.dow, k.hr,
        |  k.n_events, total // n_slots AS baseline_floor,
        |  (CASE WHEN k.n_events * n_slots < total THEN -1 ELSE 1 END)
        |    * (abs(k.n_events * n_slots - total) * 1000000 // total)
        |    AS residual_ppm
        |FROM k JOIN b USING (dow, hr)
        |ORDER BY abs(residual_ppm) DESC, slot LIMIT 20""".stripMargin,

    // Mirrors Timeseries.scd2Intervals: change-flag → run numbering →
    // per-run interval, closing edge by lead over run starts.
    "q145_scd2_intervals" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 20),
        |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                       OR lag(event_type) OVER w <> event_type
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |      FROM c),
        |g AS (SELECT user_id, run, min(event_type) AS event_type,
        |        min(ts) AS valid_from
        |      FROM r GROUP BY user_id, run)
        |SELECT user_id, event_type, epoch_us(valid_from) AS from_us,
        |  epoch_us(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)) AS to_us,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) IS NULL AS is_current
        |FROM g ORDER BY user_id, from_us""".stripMargin,

    "q10_window_tumbling" ->
      s"""SELECT CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS window_start, event_type,
         |  COUNT(*) AS n, ${dsumSql("value", 2)} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_window_sliding" ->
      """SELECT ws AS window_start, event_type, COUNT(*) AS n FROM (
        |  SELECT CAST((floor(epoch(ts) / 60) - o.k) * 60 AS BIGINT) AS ws, event_type, epoch(ts) AS ep
        |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3), (4)) o(k))
        |WHERE ep >= ws AND ep < ws + 300
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q12_pivot_wide" -> {
      def avgFor(tpe: String, alias: String) =
        s"""CASE WHEN count(*) FILTER (event_type = '$tpe') > 0 THEN
           |  CAST(SUM(CAST(value AS DECIMAL(30,2))) FILTER (event_type = '$tpe') AS DOUBLE)
           |  / count(*) FILTER (event_type = '$tpe') END AS $alias""".stripMargin
      s"""SELECT user_id, ${avgFor("click", "click_avg")}, ${avgFor("error", "error_avg")},
         |  ${avgFor("purchase", "purchase_avg")}, ${avgFor("signup", "signup_avg")},
         |  ${avgFor("view", "view_avg")}
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "q13_top3_outliers_per_user" ->
      s"""$statsCte
         |SELECT user_id, rk, event_id, round(z, 4) AS z FROM (
         |  SELECT user_id, event_id, abs(value - mu) / sigma AS z,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY abs(value - mu) / sigma DESC, event_id ASC) AS rk
         |  FROM events e JOIN st ON e.event_type = st.event_type
         |  WHERE sigma > 0)
         |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin,

    "q44_window_metric_diff" ->
      s"""WITH g AS (
         |  SELECT user_id, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
         |    event_type, ${dsumSql("value", 2)} AS cur
         |  FROM events GROUP BY 1, 2, 3),
         |d AS (SELECT user_id, window_start, event_type, cur,
         |  lag(cur, 1) OVER (PARTITION BY user_id, event_type ORDER BY window_start) AS prev
         |  FROM g)
         |SELECT user_id, window_start, event_type,
         |  round((cur - prev) / prev * 100.0, 4) AS pct_change
         |FROM d WHERE prev IS NOT NULL AND prev <> 0.0
         |ORDER BY user_id, window_start, event_type""".stripMargin,

    "q46_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM l),
        |sess AS (SELECT user_id, us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  COUNT(*) AS n_events,
        |  min(us) AS session_start_us, max(us) AS session_end_us
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q45_user_counters" ->
      """SELECT user_id, COUNT(*) AS total_events,
        |  count(*) FILTER (value > 100) AS high_value_count,
        |  max(epoch_us(ts)) AS last_seen_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q14_zscore_outliers" ->
      s"""$statsCte
         |SELECT event_id, e.event_type, round(abs(value - mu) / sigma, 4) AS z
         |FROM events e JOIN st ON e.event_type = st.event_type
         |WHERE sigma > 0 AND abs(value - mu) / sigma > 3
         |ORDER BY event_id""".stripMargin,

    "q15_user_stats" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  ${dsumSql("value", 2)} / COUNT(*) AS mean_value,
         |  sqrt(${dsumSql("value * value", 4)} / COUNT(*)
         |       - (${dsumSql("value", 2)} / COUNT(*))
         |         * (${dsumSql("value", 2)} / COUNT(*))) AS std_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q16_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q17_asof_click_before_error" ->
      """SELECT event_id, user_id, click_us FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us
        |  FROM events)
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "q18_consensus_flags" ->
      """SELECT event_id, n_flags, n_flags >= 2 AS is_consensus FROM (
        |  SELECT event_id,
        |    CAST((value > 100) AS INT) + CAST((event_type = 'error') AS INT)
        |    + CAST((hour(ts) < 6) AS INT) AS n_flags
        |  FROM events)
        |WHERE n_flags >= 1 ORDER BY event_id""".stripMargin,

    "q19_rules_score" ->
      """SELECT user_id, window_start, CAST(crit AS BIGINT) AS n_crit,
        |  CAST(warn AS BIGINT) AS n_warn,
        |  least(1.0, crit * 0.3 + warn * 0.1) AS score
        |FROM (
        |  SELECT user_id, window_start,
        |    CAST(coalesce(err_sum, 0) > 100 AS INT) AS crit,
        |    CAST((n_click > 0 AND n_purchase = 0) AS INT) + CAST(max_value > 400 AS INT) AS warn
        |  FROM (
        |    SELECT user_id, CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS window_start,
        |      CAST(SUM(CAST(value AS DECIMAL(30,2))) FILTER (event_type = 'error') AS DOUBLE) AS err_sum,
        |      count(*) FILTER (event_type = 'click') AS n_click,
        |      count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |      max(value) AS max_value
        |    FROM events GROUP BY 1, 2))
        |WHERE crit + warn > 0
        |ORDER BY user_id, window_start""".stripMargin,

    "q67_interval_join" ->
      """WITH err AS (SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us
        |             FROM events WHERE event_type = 'error'),
        |clk AS (SELECT user_id, event_id AS clk_id, epoch_us(ts) AS clk_us
        |        FROM events WHERE event_type = 'click')
        |SELECT err_id, err_us, CAST(count(clk_id) AS BIGINT) AS n_near_clicks
        |FROM err LEFT JOIN clk
        |  ON clk.user_id = err.user_id AND abs(clk_us - err_us) <= 120000000
        |GROUP BY err_id, err_us ORDER BY err_id""".stripMargin,

    "q87_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS chd FROM e GROUP BY user_id)
        |SELECT strftime(chd, '%Y-%m-%d') AS cohort,
        |  CAST(datediff('day', chd, d) AS BIGINT) AS day_n,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY chd, datediff('day', chd, d)
        |ORDER BY cohort, day_n""".stripMargin,

    "q92_value_drift" ->
      """WITH b AS (SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
        |    count(*) FILTER (ts <  TIMESTAMP '2024-01-10') AS ca,
        |    count(*) FILTER (ts >= TIMESTAMP '2024-01-10') AS cb
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, bin, ca, cb,
        |    CAST(sum(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
        |    CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb
        |  FROM b)
        |SELECT event_type,
        |  CAST(sum(abs(ca * 1000000 // na - cb * 1000000 // nb)) // 2 AS BIGINT) AS tvd_ppm,
        |  max(na) AS n_a, max(nb) AS n_b
        |FROM w WHERE na > 0 AND nb > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The q99 min-chain, per user: earliest view; earliest click at or
    // after it; earliest purchase at or after that.
    "q107_funnel_stages" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS c_us
        |      FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us >= v_us GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS p_us
        |      FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us >= c_us GROUP BY e.user_id)
        |SELECT v.user_id, v.v_us, c.c_us, p.p_us
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q104_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q101_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
        |             FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type, abs(value - m) AS ad, m
        |        FROM events e JOIN med USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS madv, min(m) AS m
        |       FROM dev GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_outliers,
        |  round(min(md.m), 6) AS median, round(min(md.madv), 6) AS mad
        |FROM dev d JOIN md USING (event_type)
        |WHERE d.ad > 4.4478 * md.madv
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q98_trend_slope" ->
      """WITH e AS (SELECT event_type,
        |    CAST(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS DECIMAL(10,0)) AS x,
        |    CAST(value AS DECIMAL(12,2)) AS y
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x * y) AS sxy, sum(x * x) AS sxx
        |      FROM e GROUP BY event_type)
        |SELECT event_type, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400, 6)
        |    AS slope_per_day
        |FROM g ORDER BY event_type""".stripMargin,

    "q99_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS c_us, min(v_us) AS v_us
        |      FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us >= v_us GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS p_us, min(c_us) AS c_us
        |      FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us >= c_us GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT CAST(sum((c_us - v_us) // 1000000) // count(*) AS BIGINT) FROM c)
        |    AS avg_v2c_s,
        |  (SELECT count(*) FROM p) AS n_purchase,
        |  (SELECT CAST(sum((p_us - c_us) // 1000000) // count(*) AS BIGINT) FROM p)
        |    AS avg_c2p_s""".stripMargin,

    "q112_feature_normalize" ->
      s"""SELECT * FROM (
         |${graft.operators.Normalize.featureScaleSql("events", "event_id", "value")}
         |) ORDER BY event_id""".stripMargin,

    "q115_gap_fill_locf" ->
      """WITH hourly AS (SELECT user_id,
        |    epoch_us(ts) // 3600000000 AS hr, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(30,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |      FROM hourly GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM b)
        |SELECT g.user_id, g.hr,
        |  coalesce(n, 0) AS n_events,
        |  last_value(cents IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled,
        |  n IS NULL AS is_gap
        |FROM g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.hr = hourly.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,

    // Mirrors Timeseries.hourlyAcf: exact integer moments, IEEE-double
    // combination with the same expression shape as the Spark plan.
    "q149_hourly_acf" -> {
      val leads = (1 to 3).map(k =>
        s"lead(x, $k) OVER (PARTITION BY user_id ORDER BY hr) AS y$k").mkString(",\n    ")
      val moms = (1 to 3).map(k =>
        s"""CAST(sum(CASE WHEN y$k IS NOT NULL THEN x END) AS DOUBLE) AS sx$k,
           |    CAST(sum(y$k) AS DOUBLE) AS sy$k,
           |    CAST(sum(x * y$k) AS DOUBLE) AS sxy$k,
           |    count(y$k) AS m$k""".stripMargin).mkString(",\n    ")
      val lagSelects = (1 to 3).map(k =>
        s"""SELECT user_id, $k AS lag,
           |  CASE WHEN n * n * s2 - n * s * s <> 0 AND m$k > 0 THEN
           |    round((n * n * sxy$k - n * s * (sx$k + sy$k) +
           |           CAST(m$k AS DOUBLE) * s * s) /
           |          (n * n * s2 - n * s * s), 6) END AS acf,
           |  CAST(m$k AS BIGINT) AS n_pairs
           |FROM a""".stripMargin).mkString("\n  UNION ALL\n  ")
      s"""WITH hourly AS (SELECT user_id,
         |    epoch_us(ts) // 3600000000 AS hr,
         |    CAST(sum(CAST(value AS DECIMAL(30,2))) * 100 AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |l AS (SELECT user_id, x,
         |    $leads
         |  FROM hourly),
         |a AS (SELECT user_id,
         |    CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(x) AS DOUBLE) AS s,
         |    CAST(sum(x * x) AS DOUBLE) AS s2,
         |    $moms
         |  FROM l GROUP BY 1)
         |SELECT user_id, lag, acf, n_pairs FROM (
         |  $lagSelects)
         |ORDER BY user_id, lag""".stripMargin
    },

    // Mirrors Timeseries.interArrivalStats: whole-second gaps under the
    // (ts, event_id) order, exact integer moments, IEEE-double CV with
    // the same expression shape.
    "q154_interarrival_stats" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) // 1000000 AS t,
        |    lag(epoch_us(ts) // 1000000) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS pt
        |  FROM events),
        |g AS (SELECT user_id, t - pt AS g FROM o WHERE pt IS NOT NULL),
        |a AS (SELECT user_id, count(*) AS n_gaps,
        |    sum(g) AS sg, sum(g * g) AS sg2 FROM g GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  CAST(sg AS BIGINT) // n_gaps AS mean_gap_s,
        |  CASE WHEN sg > 0 THEN
        |    round(sqrt(CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE) -
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / CAST(sg AS DOUBLE), 6)
        |  END AS cv
        |FROM a ORDER BY user_id""".stripMargin,

    // Mirrors Timeseries.transitionMatrix: per-user lag pairs, counts,
    // per-origin integer ppm rates.
    "q155_event_transitions" ->
      """WITH st AS (SELECT user_id,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, count(*) AS n FROM st
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t2 AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |  CAST(c.n * 1000000 // t2.tot AS BIGINT) AS rate_ppm
        |FROM c JOIN t2 USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,

    // Mirrors the q160 session rollup: same boundary rule and windows,
    // integer readouts.
    "q160_session_summary" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS pus
        |  FROM events),
        |m AS (SELECT user_id, event_id, us,
        |    CASE WHEN pus IS NULL OR us - pus > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |x AS (SELECT user_id, us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m),
        |sess AS (SELECT user_id, session_idx, count(*) AS n_ev,
        |    min(us) AS s_us, max(us) AS e_us
        |  FROM x GROUP BY 1, 2),
        |a AS (SELECT user_id, count(*) AS n_sessions,
        |    CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounce_sessions,
        |    CAST(sum(n_ev) AS BIGINT) AS total_events,
        |    CAST(sum(e_us - s_us) AS BIGINT) AS dur_us
        |  FROM sess GROUP BY 1)
        |SELECT user_id, n_sessions, bounce_sessions, total_events,
        |  (dur_us // 1000000) // n_sessions AS mean_session_secs,
        |  bounce_sessions * 1000000 // n_sessions AS bounce_ppm
        |FROM a ORDER BY user_id""".stripMargin,

    // Mirrors Timeseries.replayDuplicates on the (user, type) identity.
    "q159_event_replay_dupes" ->
      """WITH o AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS pus,
        |    lag(event_id) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS prev_seq
        |  FROM events)
        |SELECT user_id, event_type, event_id, prev_seq, us - pus AS gap_us
        |FROM o WHERE pus IS NOT NULL AND us - pus <= 300000000
        |ORDER BY event_id""".stripMargin,

    // The streaming state machine's batch run computes the identical
    // matrix, so it shares q155's oracle verbatim.
    "q157_streaming_transitions_batch" ->
      """WITH st AS (SELECT user_id,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, count(*) AS n FROM st
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t2 AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |  CAST(c.n * 1000000 // t2.tot AS BIGINT) AS rate_ppm
        |FROM c JOIN t2 USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,

    "q123_snapshot_diff" ->
      """WITH r AS (SELECT user_id, ts, event_id, value FROM events),
        |o AS (SELECT user_id, value AS old_value FROM (
        |   SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        |   FROM r WHERE ts <= TIMESTAMP '2024-01-15') WHERE rn = 1),
        |n AS (SELECT user_id, value AS new_value FROM (
        |   SELECT user_id, value, row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        |   FROM r WHERE ts <= TIMESTAMP '2024-01-30') WHERE rn = 1)
        |SELECT user_id,
        |  CASE WHEN o.old_value IS NULL THEN 'added'
        |       WHEN n.new_value IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status,
        |  o.old_value, n.new_value
        |FROM o FULL OUTER JOIN n USING (user_id)
        |WHERE o.old_value IS DISTINCT FROM n.new_value
        |ORDER BY user_id""".stripMargin,

    "q132_skew_audit" ->
      """WITH c AS (SELECT coalesce(CAST(user_id AS VARCHAR), '<null>')
        |    AS key_value, count(*) AS cnt FROM events GROUP BY 1),
        |t2 AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM c),
        |r AS (SELECT key_value, cnt, row_number() OVER (
        |        ORDER BY cnt DESC, key_value ASC) AS rk FROM c)
        |SELECT rk, key_value, cnt,
        |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST((cnt * n_keys * 100) // total AS BIGINT) AS hot_x100
        |FROM r CROSS JOIN t2 WHERE rk <= 10 ORDER BY rk""".stripMargin,

    // Mirrors ControlChart.seriesAgg + the EWMA fold step for step: exact
    // decimal baseline (the q15 recipe), then list_reduce over the
    // time-ordered series with the accumulator as a 2-element list —
    // every step the same fixed chain of IEEE double ops Spark codegens.
    "q138_ewma_control" ->
      s"""WITH g AS (SELECT user_id, COUNT(*) AS n,
         |    ${dsumSql("value", 2)} / COUNT(*) AS mu,
         |    sqrt(${dsumSql("value * value", 4)} / COUNT(*)
         |         - (${dsumSql("value", 2)} / COUNT(*))
         |           * (${dsumSql("value", 2)} / COUNT(*))) AS sigma,
         |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS seq
         |  FROM events GROUP BY user_id),
         |f AS (SELECT user_id, n, list_reduce(
         |    list_prepend([mu, 0.0], list_transform(seq, x -> [x, 0.0])),
         |    (a, b) -> [a[1] + 0.2 * (b[1] - a[1]),
         |               a[2] + CASE WHEN abs(b[1] - a[1]) > 3.0 * sigma
         |                           THEN 1.0 ELSE 0.0 END]) AS st
         |  FROM g)
         |SELECT user_id, n, round(st[1], 6) AS ewma_final,
         |  CAST(st[2] AS BIGINT) AS n_out_of_control
         |FROM f ORDER BY user_id""".stripMargin,

    // Mirrors ControlChart.cusum: slack k = 0.5σ, decision h = 4σ,
    // post-alarm reset; the fired test recomputes the same pure
    // accumulator expressions Spark binds once — identical values.
    "q139_cusum_shift" ->
      s"""WITH g AS (SELECT user_id, COUNT(*) AS n,
         |    ${dsumSql("value", 2)} / COUNT(*) AS mu,
         |    sqrt(${dsumSql("value * value", 4)} / COUNT(*)
         |         - (${dsumSql("value", 2)} / COUNT(*))
         |           * (${dsumSql("value", 2)} / COUNT(*))) AS sigma,
         |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS seq
         |  FROM events GROUP BY user_id),
         |f AS (SELECT user_id, n, list_reduce(
         |    list_prepend([0.0, 0.0, 0.0], list_transform(seq, x -> [x, 0.0, 0.0])),
         |    (a, b) -> [
         |      CASE WHEN greatest(0.0, a[1] + ((b[1] - mu) - 0.5 * sigma)) > 4.0 * sigma
         |             OR greatest(0.0, a[2] + ((mu - b[1]) - 0.5 * sigma)) > 4.0 * sigma
         |           THEN 0.0
         |           ELSE greatest(0.0, a[1] + ((b[1] - mu) - 0.5 * sigma)) END,
         |      CASE WHEN greatest(0.0, a[1] + ((b[1] - mu) - 0.5 * sigma)) > 4.0 * sigma
         |             OR greatest(0.0, a[2] + ((mu - b[1]) - 0.5 * sigma)) > 4.0 * sigma
         |           THEN 0.0
         |           ELSE greatest(0.0, a[2] + ((mu - b[1]) - 0.5 * sigma)) END,
         |      a[3] + CASE WHEN greatest(0.0, a[1] + ((b[1] - mu) - 0.5 * sigma)) > 4.0 * sigma
         |                    OR greatest(0.0, a[2] + ((mu - b[1]) - 0.5 * sigma)) > 4.0 * sigma
         |                  THEN 1.0 ELSE 0.0 END]) AS st
         |  FROM g)
         |SELECT user_id, n, CAST(st[3] AS BIGINT) AS n_alerts,
         |  round(st[1], 6) AS cusum_high, round(st[2], 6) AS cusum_low
         |FROM f ORDER BY user_id""".stripMargin,

    "q167_event_trigrams" ->
      """WITH l AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT e1, e2, e3, count(*) AS n
        |FROM l WHERE e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 25""".stripMargin,

    "q169_session_pmi" ->
      """WITH l AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (SELECT user_id, event_id, event_type, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM l),
        |sess AS (SELECT user_id, event_type,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m),
        |st AS (SELECT DISTINCT user_id, session_idx, event_type FROM sess),
        |ns AS (SELECT count(*) AS n_sessions
        |       FROM (SELECT DISTINCT user_id, session_idx FROM st)),
        |marg AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        count(*) AS n_ab
        |      FROM st a JOIN st b ON a.user_id = b.user_id
        |        AND a.session_idx = b.session_idx
        |        AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab, ma.n_t AS n_a, mb.n_t AS n_b,
        |  (n_ab * n_sessions * 1000000) // (ma.n_t * mb.n_t) AS lift_ppm
        |FROM p JOIN marg ma ON ma.event_type = type_a
        |       JOIN marg mb ON mb.event_type = type_b, ns
        |ORDER BY type_a, type_b""".stripMargin,

    // Same oracle as q176 — the streaming state machine must reproduce
    // the gaps-and-islands window exactly on batch input.
    "q179_streaming_streaks_batch" ->
      """WITH x AS (
        |  SELECT user_id, event_type = 'error' AS is_err,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, event_type = 'error'
        |      ORDER BY ts, event_id) AS rne
        |  FROM events),
        |s AS (SELECT user_id, rn - rne AS g, count(*) AS streak
        |      FROM x WHERE is_err GROUP BY user_id, g)
        |SELECT user_id, CAST(sum(streak) AS BIGINT) AS n_errors,
        |  max(streak) AS max_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q176_error_streaks" ->
      """WITH x AS (
        |  SELECT user_id, event_type = 'error' AS is_err,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, event_type = 'error'
        |      ORDER BY ts, event_id) AS rne
        |  FROM events),
        |s AS (SELECT user_id, rn - rne AS g, count(*) AS streak
        |      FROM x WHERE is_err GROUP BY user_id, g)
        |SELECT user_id, CAST(sum(streak) AS BIGINT) AS n_errors,
        |  max(streak) AS max_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q177_weekly_trend" ->
      """WITH w AS (SELECT year(ts) AS yr, weekofyear(ts) AS wk,
        |        count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |      FROM events GROUP BY 1, 2),
        |l AS (SELECT *, lag(n_events, 1) OVER (ORDER BY yr, wk) AS prev FROM w)
        |SELECT yr, wk, n_events, n_users, n_events - prev AS wow_diff,
        |  round(CAST(n_events - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6)
        |    AS wow_ratio
        |FROM l ORDER BY yr, wk""".stripMargin,

    "q178_journey_paths" ->
      """WITH l AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (SELECT user_id, event_id, event_type, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM l),
        |sess AS (SELECT user_id, event_id, event_type, us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m),
        |sp AS (SELECT user_id, session_idx,
        |        string_agg(event_type, '>' ORDER BY us, event_id) AS path
        |      FROM sess GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM sp GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    "q193_cold_start_users" ->
      """WITH r AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (SELECT user_id, count(*) AS n_events FROM events
        |      GROUP BY user_id)
        |SELECT r.user_id, us AS first_us, n_events
        |FROM r JOIN c USING (user_id)
        |WHERE rn = 1 AND event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "q191_multi_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click_n,
        |  CAST(sum(CAST(value AS DECIMAL(30,6)))
        |    FILTER (event_type = 'click') AS DOUBLE) AS click_val,
        |  count(*) FILTER (event_type = 'view') AS view_n,
        |  CAST(sum(CAST(value AS DECIMAL(30,6)))
        |    FILTER (event_type = 'view') AS DOUBLE) AS view_val
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q188_user_value_deciles" ->
      """WITH u AS (SELECT user_id, sum(CAST(value AS DECIMAL(30,6))) AS val
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |tot AS (SELECT sum(val) AS total FROM u),
        |d AS (SELECT user_id, val,
        |    ntile(10) OVER (ORDER BY val DESC, user_id) AS decile FROM u),
        |g AS (SELECT decile, count(*) AS n_users, sum(val) AS band_val
        |      FROM d GROUP BY decile)
        |SELECT decile, n_users, CAST(band_val AS DOUBLE) AS band_value,
        |  round(CAST(band_val AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        |FROM g, tot ORDER BY decile""".stripMargin,

    "q184_session_conversion" ->
      """WITH l AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (SELECT user_id, event_id, event_type, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM l),
        |sess AS (SELECT user_id, event_type,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m),
        |s2 AS (SELECT user_id, session_idx, count(*) AS n_events,
        |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |          AS converted
        |      FROM sess GROUP BY 1, 2)
        |SELECT CASE WHEN n_events = 1 THEN '1' WHEN n_events <= 3 THEN '2-3'
        |    WHEN n_events <= 7 THEN '4-7' ELSE '8+' END AS depth_bucket,
        |  count(*) AS n_sessions,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  (CAST(sum(converted) AS BIGINT) * 1000000) // count(*) AS cvr_ppm
        |FROM s2 GROUP BY 1 ORDER BY depth_bucket""".stripMargin,

    // DuckDB dayofweek is 0-based Sunday; Spark's is 1-based Sunday.
    "q172_activity_heatmap" ->
      """WITH tot AS (SELECT count(*) AS total FROM events)
        |SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
        |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |  (count(*) * 1000000) // total AS share_ppm
        |FROM events, tot GROUP BY 1, 2, total
        |ORDER BY dow, hr""".stripMargin,
  )
}
