package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-grid regularization for feature pipelines: turn an irregular
  * event stream into a dense per-key hourly series (the shape model
  * features, monitoring charts and window joins expect), filling gaps
  * by last-observation-carried-forward.
  *
  * Determinism discipline: the hour index is integer epoch-micros
  * division (no timezone arithmetic), the hourly value is an exact
  * decimal sum surfaced as integer cents, and LOCF is a window `last`
  * with a total (hr) order — bit-identical in any engine.
  */
object Timeseries {

  /** Dense hourly series per key with LOCF fill. Per key, every hour in
    * `[min observed, max observed]` gets a row: observed hours carry
    * their event count and exact-decimal value sum (as cents); gap hours
    * carry `n_events = 0`, `is_gap = true`, and the latest preceding
    * observed sum.
    *
    * Scale shape: one groupBy on (key, hour) — the only corpus-sized
    * shuffle; the grid explodes from a per-key (min, max) aggregate, so
    * its cost is output-sized, not input-sized; the LOCF window sorts
    * within a key's hour span only (never a global sort). Skew bound:
    * a key's window state is its hour span, independent of event volume.
    * At 100 TB the same plan holds — the dense grid is bounded by
    * keys × span, and a span cap upstream keeps pathological keys out. */
  def gapFillHourlyLocf(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val hr = expr(s"unix_micros($tsCol) div 3600000000").as("hr")
    val hourly = events
      .groupBy(col(keyCol), hr)
      .agg(
        count(lit(1)).as("n"),
        (sum(col(valCol).cast(DecimalType(30, 2))) * 100).cast("bigint")
          .as("cents"))
    val grid = hourly
      .groupBy(col(keyCol))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col(keyCol), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq(keyCol, "hr"), "left")
      .select(
        col(keyCol), col("hr"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("cents"), ignoreNulls = true).over(w).as("cents_filled"),
        col("n").isNull.as("is_gap"))
  }

  /** Per-key autocorrelation function at lags 1..`maxLag` over the key's
    * observed hourly value series (hours in order; gaps are skipped, so
    * this is the ACF of the SAMPLE sequence — the seasonality /
    * burst-persistence diagnostic feature pipelines attach per entity).
    *
    *   r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * Exactness: hourly values are exact-decimal cent sums; with x̄ = S/n
    * the whole formula multiplies through by n² into pure integer
    * moments — n²·Σ'x_t·x_{t+k} − n·S·(Σ'x_t + Σ'x_{t+k}) + m_k·S² over
    * n²·Σx² − n·S². Every moment sum is an exact integer below 2^53
    * (double-exact); the scaled combination runs in IEEE doubles with an
    * identical expression shape in the oracle (decimal would NOT be
    * portable here — DuckDB demotes >38-wide decimal products to double
    * on its own terms), so the readout is bit-identical in any engine.
    * A constant series (zero denominator) yields null.
    *
    * Scale shape: one (key, hour) groupBy is the only corpus-sized
    * shuffle; the lag windows and the moment aggregation are per-key,
    * state bounded by the key's hour span (same bound as
    * [[gapFillHourlyLocf]]); output is keys × maxLag rows. */
  def hourlyAcf(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val dec = DecimalType(38, 0)
    val hourly = events
      .groupBy(col(keyCol), expr(s"unix_micros($tsCol) div 3600000000").as("hr"))
      .agg((sum(col(valCol).cast(DecimalType(30, 2))) * 100).cast("bigint")
        .as("x"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hr"))
    val lagged = hourly.select(
      col(keyCol) +: col("x") +:
        (1 to maxLag).map(k => lead(col("x"), k).over(w).as(s"y$k")): _*)
    val xd = col("x").cast(dec)
    val aggCols: Seq[Column] =
      Seq(count(lit(1)).cast(dec).as("n"), sum(xd).as("s"),
        sum(xd * xd).as("s2")) ++
      (1 to maxLag).flatMap { k =>
        val yd = col(s"y$k").cast(dec)
        Seq(
          sum(when(col(s"y$k").isNotNull, xd)).as(s"sx$k"),
          sum(yd).as(s"sy$k"),
          sum(xd * yd).as(s"sxy$k"),
          count(col(s"y$k")).cast(dec).as(s"m$k"))
      }
    val agg = lagged.groupBy(col(keyCol)).agg(aggCols.head, aggCols.tail: _*)
    def d(c: Column) = c.cast("double")
    val lagRows = (1 to maxLag).map { k =>
      val num = d(col("n")) * d(col("n")) * d(col(s"sxy$k")) -
        d(col("n")) * d(col("s")) * (d(col(s"sx$k")) + d(col(s"sy$k"))) +
        d(col(s"m$k")) * d(col("s")) * d(col("s"))
      val den = d(col("n")) * d(col("n")) * d(col("s2")) -
        d(col("n")) * d(col("s")) * d(col("s"))
      struct(lit(k).as("lag"),
        when(den =!= 0.0 && col(s"m$k") > 0, round(num / den, 6)).as("acf"),
        col(s"m$k").cast("bigint").as("n_pairs"))
    }
    agg.select(col(keyCol), explode(array(lagRows: _*)).as("r"))
      .select(col(keyCol), col("r.lag").as("lag"), col("r.acf").as("acf"),
        col("r.n_pairs").as("n_pairs"))
  }

  /** Per-key inter-arrival burstiness: gaps in whole seconds between
    * consecutive events (ordered by (ts, seq) — the unique tie-break
    * makes gap sequences deterministic under equal timestamps), reduced
    * to count, truncating integer mean, and the coefficient of variation
    * CV = σ/μ = √(m·Σg² − (Σg)²)/Σg — CV ≈ 1 is Poisson traffic, CV ≫ 1
    * is bursty (bots, batch replays), CV ≈ 0 is a metronome (synthetic
    * feeds). The bot/organic-traffic triage feature next to [[hourlyAcf]].
    *
    * One per-key lag window + one keyed aggregate; integer gap moments
    * (exact in decimal) combine in IEEE doubles with an oracle-identical
    * expression shape. Keys with < 2 events have no gaps and no row;
    * all-equal timestamps (Σg = 0) yield null CV. */
  /** Replay / double-fire detection: events whose identical predecessor —
    * same key, type and value — lies within `windowSec` seconds. The
    * double-click / at-least-once-redelivery scrub event data needs
    * before counting anything. A candidate duplicate shares its
    * (key, type, value) window partition BY CONSTRUCTION, so one lag
    * window replaces any self-join; emits the LATER event of each close
    * pair with the gap. At 100 TB this is one shuffle on the identity
    * key with per-partition state bounded by that identity's history. */
  def replayDuplicates(events: DataFrame, identityCols: Seq[String],
      tsCol: String, seqCol: String, windowSec: Long): DataFrame = {
    require(windowSec >= 0 && identityCols.nonEmpty)
    val w = Window.partitionBy(identityCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    val us = expr(s"unix_micros($tsCol)")
    events
      .select(identityCols.map(col) ++ Seq(col(seqCol),
        us.as("_us"), lag(us, 1).over(w).as("_pus"),
        lag(col(seqCol), 1).over(w).as("prev_seq")): _*)
      .filter(col("_pus").isNotNull &&
        col("_us") - col("_pus") <= windowSec * 1000000L)
      .select(identityCols.map(col) ++ Seq(col(seqCol), col("prev_seq"),
        (col("_us") - col("_pus")).as("gap_us")): _*)
  }

  /** First-order behavioral transition matrix: counts and per-origin ppm
    * rates of consecutive (prev event type → event type) steps within
    * each key's (ts, seq)-ordered stream — the Markov-model / anomalous-
    * journey primitive next to the funnel (q107): a transition whose rate
    * collapses week-over-week is a broken product flow.
    *
    * One per-key lag window over the corpus; everything after is
    * |types|²-sized, so the per-origin total ride is a window over a
    * broadcast-scale frame. All-integer output. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val steps = events
      .select(col(keyCol), lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("next_type"))
      .filter(col("prev_type").isNotNull)
    steps.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_tot",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div _tot").as("rate_ppm"))
  }

  def interArrivalStats(events: DataFrame, keyCol: String, tsCol: String,
      seqCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val secs = expr(s"unix_micros($tsCol) div 1000000")
    val gaps = events
      .select(col(keyCol), (secs - lag(secs, 1).over(w)).as("g"))
      .filter(col("g").isNotNull)
    def d(c: Column) = c.cast("double")
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g").cast(dec)).as("_sg"),
        sum(col("g").cast(dec) * col("g").cast(dec)).as("_sg2"))
      .select(col(keyCol), col("n_gaps"),
        expr("CAST(_sg AS BIGINT) div n_gaps").as("mean_gap_s"),
        when(col("_sg") > 0,
          round(sqrt(d(col("n_gaps")) * d(col("_sg2")) -
            d(col("_sg")) * d(col("_sg"))) / d(col("_sg")), 6)).as("cv"))
  }

  /** SCD2 (slowly-changing-dimension type 2) interval build from a change
    * log: per key, each maximal run of equal attribute values becomes one
    * row with `valid_from` (run start), `valid_to` (next run's start,
    * null while current) and `is_current`. The warehouse dimension-table
    * primitive: point-in-time joins become `BETWEEN valid_from AND
    * valid_to` lookups instead of per-query window scans.
    *
    * Gaps-and-islands on (key, ts, seq): a change flag against the lagged
    * attribute, a running sum numbering the runs, one groupBy per run,
    * then a lead for the closing edge. All windows partition by the key —
    * thousands of small per-key sorts, never a global one — and `seqCol`
    * breaks equal-timestamp ties so run numbering is deterministic. */
  def scd2Intervals(events: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, attrCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val runs = events
      .select(col(keyCol), col(tsCol), col(seqCol), col(attrCol))
      .withColumn("_chg",
        when(lag(col(attrCol), 1).over(byTime).isNull ||
          lag(col(attrCol), 1).over(byTime) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_run"))
      .agg(first(col(attrCol)).as(attrCol), min(col(tsCol)).as("valid_from"))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("_run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** CDC-style snapshot diff over an append-only event log: each key's
    * latest value as of `oldUpTo` vs as of `newUpTo`, emitted as the
    * change delta — `added` (key first appears in the new window) or
    * `changed` (latest value differs); unchanged keys are dropped. The
    * latest-row choice is the exact q16 rule: max_by on the unique
    * (ts, tiebreak-id) ordering struct.
    *
    * Scale shape: ONE corpus scan and ONE groupBy on the key — both
    * snapshots fall out of the same aggregate as conditional max_bys
    * (rows outside a cutoff have a null ordering struct, which max_by
    * ignores), so the diff never joins two snapshot passes. The removal
    * case (`removed`) is carried for generality: it can only arise when
    * the old window sees keys the new one doesn't (disjoint windows /
    * compaction diffs), never with nested cutoffs. */
  def snapshotDiff(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String,
      oldUpTo: Column, newUpTo: Column): DataFrame = {
    def latest(cond: Column) = max_by(
      when(cond, struct(col(valCol).as("v"))),
      when(cond, struct(col(tsCol), col(tieCol))))
    events
      .groupBy(col(keyCol))
      .agg(
        latest(col(tsCol) <= oldUpTo).as("_old"),
        latest(col(tsCol) <= newUpTo).as("_new"))
      .select(col(keyCol),
        when(col("_old").isNull && col("_new").isNull, "unchanged") // out of both windows
          .when(col("_old").isNull, "added")
          .when(col("_new").isNull, "removed")
          .when(col("_old.v") === col("_new.v"), "unchanged")
          .otherwise("changed").as("status"),
        col("_old.v").as("old_value"), col("_new.v").as("new_value"))
      .filter(col("status") =!= "unchanged")
  }

  /** Seasonal-baseline residuals: each observed hour's event count vs the
    * mean of its (day-of-week, hour-of-day) slot across the whole series
    * — the traffic-anomaly readout that survives weekly seasonality
    * (q172's heatmap is the baseline; this is each hour's deviation from
    * it). A Monday-03:00 burst that looks normal against the global mean
    * but is 5x the Monday-03:00 baseline surfaces here.
    *
    * Determinism: the residual is the exact integer cross-difference
    * n·n_slots − total (comparing n against total/n_slots without the
    * division), surfaced as sign·(|diff|·1e6 div total) so the integer
    * division always sees non-negative operands — truncation direction
    * for negative operands differs between engines.
    *
    * Scale shape: one groupBy to hours (corpus-sized, map-combined), one
    * tiny 168-row baseline aggregate joined back by broadcast, one
    * bounded top-N sort. */
  def seasonalResiduals(events: DataFrame, tsCol: Column, topN: Int): DataFrame = {
    val slots = events
      .groupBy(date_trunc("hour", tsCol).as("slot"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("slot"), col("n_events"),
        dayofweek(col("slot")).cast("bigint").as("dow"),
        hour(col("slot")).cast("bigint").as("hr"))
    val base = slots.groupBy(col("dow"), col("hr"))
      .agg(sum(col("n_events")).as("total"), count(lit(1)).as("n_slots"))
    slots.join(broadcast(base), Seq("dow", "hr"))
      .select(
        date_format(col("slot"), "yyyy-MM-dd HH").as("slot"),
        col("dow"), col("hr"), col("n_events"),
        expr("total div n_slots").as("baseline_floor"),
        (signum(col("n_events") * col("n_slots") - col("total")).cast("bigint") *
          expr("abs(n_events * n_slots - total) * 1000000 div total"))
          .as("residual_ppm"))
      .orderBy(abs(col("residual_ppm")).desc, col("slot"))
      .limit(topN)
  }

  /** Step-decayed popularity — the feature-store recency weighting with
    * an EXACT decay: each occurrence contributes `10^6 div 2^age_weeks`
    * ppm (a halving per week), so every weight is a dyadic integer and
    * the rollup is engine-exact — no exp()/pow() float drift, while
    * keeping the half-life semantics (the continuous-decay limit of
    * q138's EWMA, frozen to `halfLifeDays` steps). Ages ≥ 20 half-lives
    * contribute 0 (2^20 > 10^6), so the shift is capped there.
    *
    * Scale shape: the age weight is a narrow per-row expression fused
    * into the scan; one map-combined groupBy(key); the 1-row as-of date
    * attaches by broadcast. Returns (key, n_rows, decayed_ppm). */
  def stepDecayedCounts(df: DataFrame, keyCol: String, tsCol: String,
      halfLifeDays: Int = 28): DataFrame = {
    require(halfLifeDays >= 1)
    val day = to_date(col(tsCol))
    val end = df.agg(max(day).as("_end"))
    df.select(col(keyCol).as("k"), day.as("_d"))
      .crossJoin(broadcast(end))
      .select(col("k"),
        expr("1000000L div shiftleft(1L, " +
          s"CAST(least(datediff(_end, _d) div $halfLifeDays, 20) AS INT))")
          .as("_w"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("_w")).as("decayed_ppm"))
      .select(col("k").as(keyCol), col("n_rows"), col("decayed_ppm"))
  }

  /** Forecast backtest over the hourly count grid: evaluate the three
    * standard baselines — naive (last value), seasonal-naive (24 rows
    * back), 24-row moving average — on the last `holdout` observations
    * per key, reporting integer-milli MAE each and the winner (ties
    * prefer the simpler model: naive > snaive > ma24). The
    * model-selection readout that belongs BEFORE any fancier
    * forecaster: if nothing beats seasonal-naive, ship seasonal-naive.
    * Lags are ROW-based over the observed grid (missing hours skip, the
    * same sequence in every engine); rows without a full 24-row history
    * are excluded from evaluation.
    *
    * Scale shape: one corpus groupBy to the (key, hour) grid; every
    * window runs per key over the bounded time domain. Returns
    * (key, n_eval, mae_naive_milli, mae_snaive_milli, mae_ma24_milli,
    * best). */
  def forecastBacktest(events: DataFrame, keyCol: String, tsCol: String,
      holdout: Int = 168): DataFrame = {
    val series = events
      .select(col(keyCol).as("k"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 3600000000").as("t"))
      .groupBy(col("k"), col("t")).agg(count(lit(1)).as("x"))
    val byT = Window.partitionBy(col("k")).orderBy(col("t"))
    val whole = Window.partitionBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    series
      .withColumn("i", row_number().over(byT).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("p_naive", lag(col("x"), 1).over(byT))
      .withColumn("p_snaive", lag(col("x"), 24).over(byT))
      .withColumn("_ws", sum(col("x")).over(byT.rowsBetween(-24, -1)))
      .withColumn("_wc", count(lit(1)).over(byT.rowsBetween(-24, -1)))
      .filter(col("i") > col("n") - holdout && col("_wc") === 24)
      .withColumn("p_ma", expr("_ws div 24"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("p_naive"))).as("_en"),
        sum(abs(col("x") - col("p_snaive"))).as("_es"),
        sum(abs(col("x") - col("p_ma"))).as("_em"))
      .select(col("k").as(keyCol), col("n_eval"),
        expr("_en * 1000 div n_eval").as("mae_naive_milli"),
        expr("_es * 1000 div n_eval").as("mae_snaive_milli"),
        expr("_em * 1000 div n_eval").as("mae_ma24_milli"))
      .withColumn("best",
        when(col("mae_naive_milli") <= col("mae_snaive_milli") &&
          col("mae_naive_milli") <= col("mae_ma24_milli"), "naive")
          .when(col("mae_snaive_milli") <= col("mae_ma24_milli"), "snaive")
          .otherwise("ma24"))
  }

  /** Exact single-changepoint detection (binary segmentation, first
    * split) per key over an hourly count series: the split position
    * maximizing the between-segment sum-of-squares reduction,
    *
    *   score(i) = (s1·n2 − s2·n1)² div (n1·n2)      (∝ n1·n2·(μ1−μ2)²)
    *
    * — pure int64 (counts ≤ ~10^5/hour over ≤ ~10^4 hours before diff²
    * needs decimal), so the argmax is bit-identical in any engine; ties
    * break to the EARLIEST split. q139's CUSUM answers "did the level
    * shift?" online; this answers "where, exactly?" in batch.
    *
    * Scale shape: one corpus groupBy to the (key, hour) grid, then all
    * windows run per key over the bounded TIME DOMAIN (hours of history,
    * never event rows); candidate splits are the same domain-sized table
    * and the argmax is one max_by aggregate per key. Returns
    * (key, split_t, n_obs, left_mean_milli, right_mean_milli, score). */
  def changepoint(events: DataFrame, keyCol: String, tsCol: String,
      minSeg: Int = 24): DataFrame = {
    val series = events
      .select(col(keyCol).as("k"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 3600000000").as("t"))
      .groupBy(col("k"), col("t")).agg(count(lit(1)).as("x"))
    val byT = Window.partitionBy(col("k")).orderBy(col("t"))
    val whole = Window.partitionBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    series
      .withColumn("i", row_number().over(byT).cast("long"))
      .withColumn("s1", sum(col("x")).over(
        byT.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("s", sum(col("x")).over(whole))
      .filter(col("i") >= minSeg && col("i") <= col("n") - minSeg)
      .select(col("k"), col("t"), col("i"), col("s1"), col("n"), col("s"),
        ((col("s1") * (col("n") - col("i")) -
          (col("s") - col("s1")) * col("i")).as("_d")))
      .withColumn("score",
        expr("_d * _d div (i * (n - i))"))
      .groupBy(col("k"))
      // max_by on (score, -t): highest score, earliest split on ties
      .agg(max(struct(col("score"), -col("t"), col("t"), col("i"),
        col("s1"), col("n"), col("s"))).as("_m"))
      .select(col("k").as(keyCol), col("_m.t").as("split_t"),
        col("_m.n").as("n_obs"),
        expr("_m.s1 * 1000 div _m.i").as("left_mean_milli"),
        expr("(_m.s - _m.s1) * 1000 div (_m.n - _m.i)").as("right_mean_milli"),
        col("_m.score").as("score"))
  }
}
