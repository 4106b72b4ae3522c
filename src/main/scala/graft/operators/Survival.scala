package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over user lifetimes — the churn
  * analytic behind retention curves (q87's cohort grid tells you who came
  * back; the KM curve tells you how long users LIVE, with censoring done
  * right instead of pretending still-active users churned).
  *
  * Semantics: time is hour-grain (epoch-hour buckets — integer, engine
  * portable); a user's lifetime is `last event hour − first event hour`.
  * Users whose last event is >= `quietHours` before the corpus's global
  * last hour are CHURNED (the death event, d=1); users still active near
  * the corpus edge are CENSORED at their observed lifetime (they leave
  * the risk set but contribute no death). Standard KM accounting: at
  * each distinct lifetime t, the at-risk count n_t is everyone whose
  * lifetime is >= t (censoring at t keeps you at risk AT t), and
  * S(t) = prod_{t_i <= t} (n_i - d_i) / n_i over death times only.
  *
  * Cross-engine exactness: the product is computed in integer ppm with a
  * SEQUENTIAL floor-round per death time — `s_k = s_{k-1}·(n_k − d_k) div
  * n_k` from `s_0 = 1e6` — which the DuckDB oracle reproduces with a
  * recursive CTE in the same order. No floating point anywhere.
  *
  * Scale shape: one groupBy(user) over the fact table (the only
  * corpus-sized shuffle), then the lifetime DOMAIN (<= days-of-history
  * rows, hundreds at most) collapses to a single sorted array and the
  * running product is one linear `aggregate` HOF over it — the ordered
  * recurrence never touches a corpus-sized window. s·n fits int64 up to
  * ~9e12 at-risk users.
  */
object Survival {

  /** Cohort-grouped KM: one survival curve per signup-day cohort (the
    * day index of a user's FIRST event hour), sharing one global
    * observation cutoff — the did-retention-improve comparison across
    * product changes. Same accounting and integer recurrence as
    * [[kaplanMeier]], with the lifetime-domain fold running per cohort
    * (cohort curves are independent, so the rollup parallelizes on the
    * cohort key). Returns (cohort_day, t_hours, n_risk, n_events,
    * s_ppm), ordered by (cohort_day, t_hours). */
  def kaplanMeierByCohort(
      events: DataFrame, userCol: String, tsCol: String,
      quietHours: Int = 24): DataFrame = {
    val hour = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 3600000000")
    val per = events.groupBy(col(userCol))
      .agg(min(hour).as("first_h"), max(hour).as("last_h"))
    val end = per.agg(max(col("last_h")).as("end_h"))
    val u = per.crossJoin(broadcast(end))
      .select(expr("first_h div 24").as("cohort_day"),
        (col("last_h") - col("first_h")).as("t"),
        (col("end_h") - col("last_h") >= quietHours).cast("long").as("ev"))
    val grp = u.groupBy(col("cohort_day"), col("t"))
      .agg(sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))
    val one = grp.groupBy(col("cohort_day")).agg(
      sort_array(collect_list(struct(col("t"), col("d"), col("c")))).as("arr"),
      sum(col("d") + col("c")).as("total"))
    one.select(col("cohort_day"), explode(expr(
        """aggregate(arr,
          |  named_struct('rem', total, 's', CAST(1000000 AS BIGINT),
          |    'out', CAST(array() AS array<struct<t:bigint,n:bigint,d:bigint,s:bigint>>)),
          |  (acc, x) -> named_struct(
          |    'rem', acc.rem - x.d - x.c,
          |    's', CASE WHEN x.d > 0
          |      THEN (acc.s * (acc.rem - x.d)) div acc.rem ELSE acc.s END,
          |    'out', CASE WHEN x.d > 0
          |      THEN array_append(acc.out, named_struct(
          |        't', x.t, 'n', acc.rem, 'd', x.d,
          |        's', (acc.s * (acc.rem - x.d)) div acc.rem))
          |      ELSE acc.out END),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("cohort_day"), col("r.t").as("t_hours"),
        col("r.n").as("n_risk"), col("r.d").as("n_events"),
        col("r.s").as("s_ppm"))
      .orderBy(col("cohort_day"), col("t_hours"))
  }

  /** KM table: one row per death time — (t_hours, n_risk, n_events,
    * hazard_ppm, s_ppm), ordered by t_hours. */
  def kaplanMeier(
      events: DataFrame, userCol: String, tsCol: String,
      quietHours: Int = 24): DataFrame = {
    // CAST tolerates TIMESTAMP_NTZ sources (session is UTC: same instant)
    val hour = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 3600000000")
    val per = events.groupBy(col(userCol))
      .agg(min(hour).as("first_h"), max(hour).as("last_h"))
    val end = per.agg(max(col("last_h")).as("end_h"))
    val u = per.crossJoin(broadcast(end))
      .select((col("last_h") - col("first_h")).as("t"),
        (col("end_h") - col("last_h") >= quietHours).cast("long").as("ev"))
    val grp = u.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))
    // lifetime domain -> one row: sorted (t, d, c) array + total at risk
    val one = grp.agg(
      sort_array(collect_list(struct(col("t"), col("d"), col("c")))).as("arr"),
      sum(col("d") + col("c")).as("total"))
    one.select(explode(expr(
        """aggregate(arr,
          |  named_struct('rem', total, 's', CAST(1000000 AS BIGINT),
          |    'out', CAST(array() AS array<struct<t:bigint,n:bigint,d:bigint,s:bigint>>)),
          |  (acc, x) -> named_struct(
          |    'rem', acc.rem - x.d - x.c,
          |    's', CASE WHEN x.d > 0
          |      THEN (acc.s * (acc.rem - x.d)) div acc.rem ELSE acc.s END,
          |    'out', CASE WHEN x.d > 0
          |      THEN array_append(acc.out, named_struct(
          |        't', x.t, 'n', acc.rem, 'd', x.d,
          |        's', (acc.s * (acc.rem - x.d)) div acc.rem))
          |      ELSE acc.out END),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.t").as("t_hours"), col("r.n").as("n_risk"),
        col("r.d").as("n_events"),
        expr("r.d * 1000000 div r.n").as("hazard_ppm"),
        col("r.s").as("s_ppm"))
      .orderBy(col("t_hours"))
  }
}
