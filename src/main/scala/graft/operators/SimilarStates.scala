package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** "Find similar states" investigation query (reference
  * `/root/reference/pipeline/find_similar_states.py:86-315`): for a target
  * snapshot, the top-N most similar historical snapshots of the same
  * device, with per-metric percentage diffs (J4/F13 map compare) and a
  * "was it anomalous then?" annotation.
  */
object SimilarStates {

  /** @return [device_id, snapshot_time, rk, sim, similar_time,
    *          similar_anomalous, metric_diffs map<metric, pct_diff>] */
  def find(
      snapshots: DataFrame,
      targets: DataFrame,
      topN: Int = 5,
      minSimilarity: Double = 0.0): DataFrame = {
    val t = targets.select(
      col("device_id"), col("snapshot_time").as("t_time"),
      col("embedding").as("t_vec"), col("metrics").as("t_metrics"))
    val c = snapshots.select(
      col("device_id"), col("snapshot_time").as("c_time"),
      col("embedding").as("c_vec"), col("metrics").as("c_metrics"),
      coalesce(col("is_anomalous"), lit(false)).as("c_anom"))

    val scored = t.join(c, Seq("device_id"))
      .filter(col("c_time") =!= col("t_time")) // dedupe self (py:253-268)
      .withColumn("sim", graft.functions.GraftFunctions.cosine_sim(col("t_vec"), col("c_vec")))
      .filter(col("sim") >= minSimilarity)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("device_id"), col("t_time"))
      .orderBy(col("sim").desc, col("c_time").asc)

    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      // F13 map diff (py:152-170): % diff per shared metric, guarded μ=0
      .withColumn("metric_diffs",
        map_filter(
          map_zip_with(col("t_metrics"), col("c_metrics"),
            (_, cur, old) => when(old.isNotNull && cur.isNotNull && old =!= 0.0,
              round((cur - old) / old * 100.0, 2))),
          (_, v) => v.isNotNull))
      .select(
        col("device_id"), col("t_time").as("snapshot_time"), col("rk"),
        col("sim"), col("c_time").as("similar_time"),
        col("c_anom").as("similar_anomalous"), col("metric_diffs"))
  }

  /** "Has this happened before?" report per target (reference
    * find_similar_states.py:298-315): how many similar past states exist,
    * how many of those were anomalous, and the mean similarity — the
    * operator's verdict line ("N similar states, M were anomalous").
    * The mean goes through exact decimal summation (the q15/q21
    * discipline): double addition is order-dependent and group scan
    * order is unspecified in any engine, so a plain avg() could round
    * differently across engines at a 1-ulp boundary — decimal sums are
    * associative, making the q56 oracle's recomputation exact. */
  def summary(found: DataFrame): DataFrame =
    found.groupBy(col("device_id"), col("snapshot_time"))
      .agg(
        count(lit(1)).as("n_similar"),
        count(when(col("similar_anomalous"), 1)).as("n_similar_anomalous"),
        round(graft.queries.Q.dsum(col("sim"), 15) / count(lit(1)), 6)
          .as("avg_similarity"), // reference A12
        max(col("sim")).as("best_similarity"))
      .withColumn("seen_before_normal",
        col("n_similar") > col("n_similar_anomalous"))
}
