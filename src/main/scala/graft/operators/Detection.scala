package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.DetectionConfig
import graft.functions.GraftFunctions.cosine_sim

/** The three detection paths + combined verdict (reference §2.9,
  * `/root/reference/pipeline/anomaly_detection.py:91-173`,
  * `/root/reference/pipeline/path3_vector_search.py`).
  *
  * Dataflow shape at scale: snapshots (huge) ⋈ broadcast(profiles) (tiny,
  * one row/device — reference J1's per-device profile cache), all scoring
  * as codegen'd column expressions; Path 3 is a per-device self-kNN
  * co-partitioned on device_id. Nothing mutates: the reference's
  * `UPDATE snapshot SET is_anomalous` back-writes become appended verdict
  * columns (SURVEY §7.3 hard-part 3).
  */
object Detection {

  /** Paths 1+2 in one pass (detect_anomaly_paths_1_2,
    * anomaly_detection.py:91-173). Appends:
    * outliers (metric→z over threshold), similarity_to_profile,
    * path1_triggered, path2_triggered, anomaly_score, is_anomalous,
    * detection_details. Snapshots of devices without a profile are kept
    * with the reference's no-profile defaults (not anomalous, sim 1.0). */
  def pathsOneTwo(
      snapshots: DataFrame, profiles: DataFrame,
      cfg: DetectionConfig = DetectionConfig.Consumer): DataFrame = {
    val prof = broadcast(profiles.select(
      col("device_id"), col("profile_embedding"), col("metric_stats")))

    val joined = snapshots.join(prof, Seq("device_id"), "left")

    // Path 1: z-scores vs profile stats (check_metric_outliers,
    // anomaly_detection.py:47-73): skip sigma<=0; keep z > threshold.
    val outliers = filter(
      transform(col("metric_stats"), st =>
        struct(
          st.getField("metric").as("metric"),
          when(st.getField("std") > 0,
            abs(element_at(col("metrics"), st.getField("metric")) - st.getField("mean"))
              / st.getField("std")).as("z"))),
      e => e.getField("z").isNotNull && e.getField("z") > cfg.zThreshold)

    val withPaths = joined
      .withColumn("outliers",
        when(col("metric_stats").isNotNull, outliers)
          .otherwise(array().cast("array<struct<metric:string,z:double>>")))
      .withColumn("similarity_to_profile",
        when(col("profile_embedding").isNotNull,
          cosine_sim(col("embedding"), col("profile_embedding")))
          .otherwise(lit(1.0))) // no profile → defaults (anomaly_detection.py:114-125)
      .withColumn("path1_triggered", size(col("outliers")) >= cfg.outlierCount)
      .withColumn("path2_triggered",
        col("profile_embedding").isNotNull &&
          col("similarity_to_profile") < cfg.fingerprintThreshold)

    // F10 score (anomaly_detection.py:142-148): max(0, 1-sim) +
    // (if outliers) min(1, Σ min(10, z) / 40)
    val outlierMagnitude = aggregate(col("outliers"), lit(0.0),
      (acc, e) => acc + least(lit(10.0), e.getField("z")))

    // F12 details (anomaly_detection.py:151-162): top-3 outliers by z desc
    val top3 = slice(reverse(array_sort(transform(col("outliers"),
      e => struct(e.getField("z").as("z"), e.getField("metric").as("metric"))))), 1, 3)
    // Formatting parity: Java format_string rounds decimal halves HALF_UP
    // while C/DuckDB printf rounds half-even, so a z or sim landing on an
    // exact decimal half (e.g. 2.25) would format differently across
    // engines. Pre-rounding with round() — HALF_UP in BOTH engines (Spark
    // BigDecimal HALF_UP; DuckDB rounds halves away from zero) — hands
    // printf a 1-decimal value it can format without making a tie call.
    // The oracle SQL applies the same round() before its printf.
    val path1Detail = concat(
      lit("PATH 1 (Rules): "), size(col("outliers")), lit(" outliers - "),
      concat_ws(", ", transform(top3,
        e => concat(e.getField("metric"), lit(" (Z: "),
          format_string("%.1f", round(e.getField("z"), 1)), lit(")")))))
    val path2Detail = concat(
      lit("PATH 2 (Fingerprint): similarity="),
      format_string("%.3f", round(col("similarity_to_profile"), 3)),
      lit(" (< "), format_string("%.2f", lit(cfg.fingerprintThreshold)), lit(")"))

    withPaths
      .withColumn("anomaly_score",
        greatest(lit(0.0), lit(1.0) - col("similarity_to_profile")) +
          when(size(col("outliers")) > 0,
            least(lit(1.0), outlierMagnitude / 40.0)).otherwise(0.0))
      .withColumn("is_anomalous", col("path1_triggered") || col("path2_triggered"))
      .withColumn("detection_details",
        when(col("is_anomalous"), concat_ws(" | ",
          when(col("path1_triggered"), path1Detail),
          when(col("path2_triggered"), path2Detail))))
      .drop("profile_embedding", "metric_stats")
  }

  /** Path 3 — ANN novelty (path3_vector_search.py:98-175): for each
    * snapshot, count same-device neighbors within the lookback window that
    * are cosine-similar above the threshold; too few matches ⇒ novel ⇒
    * anomalous. Warmup guard: fewer than `warmupCount` corpus snapshots in
    * the lookback ⇒ no judgment (NULL verdict, py:325-332).
    *
    * Pre-filters (device, time, normal-only) run *before* the kNN — see
    * SURVEY §3.3 on why this beats the reference's global-ANN-then-filter.
    * The pair stage is a self-join co-partitioned on device_id; a device
    * producing more than `saltDevicesAbove` snapshots in the window runs
    * salted ([[Skew.saltedSelfJoin]] — per-task work /salts, identical
    * results) so one chatty device cannot pin a task at fleet scale. */
  def pathThree(
      snapshots: DataFrame,
      cfg: DetectionConfig = DetectionConfig.VectorSearch,
      saltDevicesAbove: Int = Int.MaxValue, salts: Int = 8): DataFrame = {
    val lookbackSec = cfg.lookbackHours * 3600L
    val q = snapshots.select(
      col("device_id"), col("snapshot_time").as("q_time"), col("embedding").as("q_vec"))
    val c = snapshots.select(
      col("device_id"), col("snapshot_time").as("c_time"), col("c_anom"), col("embedding").as("c_vec"))

    val joined =
      if (saltDevicesAbove == Int.MaxValue) q.join(c, Seq("device_id"))
      else Skew.saltedSelfJoin(q, c, "device_id", col("q_time"), saltDevicesAbove, salts)
    val pairs = joined
      .filter(col("c_time") =!= col("q_time") &&
        col("c_time") >= col("q_time") - expr(s"INTERVAL $lookbackSec SECONDS") &&
        col("c_time") <= col("q_time"))

    val counted = pairs
      .groupBy(col("device_id"), col("q_time"))
      .agg(
        count(lit(1)).as("corpus_n"),
        count(when(!col("c_anom") &&
          cosine_sim(col("q_vec"), col("c_vec")) >= cfg.knnSimThreshold, 1))
          .as("match_n"))

    snapshots
      .join(counted.withColumnRenamed("q_time", "snapshot_time"),
        Seq("device_id", "snapshot_time"), "left")
      .withColumn("corpus_n", coalesce(col("corpus_n"), lit(0L)))
      .withColumn("match_n", coalesce(col("match_n"), lit(0L)))
      .withColumn("path3_triggered",
        when(col("corpus_n") < cfg.warmupCount, lit(null).cast("boolean")) // warmup
          .otherwise(col("match_n") < cfg.knnMinMatches))
  }

  /** Reference-parity Path 3: GLOBAL top-k ANN first, device/time/normal
    * filters applied only to the k survivors — bit-faithful to
    * detect_anomalies_vector_search.py:122-149, where ScyllaDB could not
    * combine ANN with WHERE. Kept for parity testing: when a device's
    * snapshots have close cross-device neighbors, the global top-k fills up
    * with rows the post-filter then discards, starving the match count and
    * producing false anomalies — exactly why [[pathThree]] pre-filters
    * instead (SURVEY §3.3). O(n²) pair stage; parity/testing use only. */
  def pathThreeGlobalParity(
      snapshots: DataFrame,
      cfg: DetectionConfig = DetectionConfig.VectorSearch): DataFrame = {
    val lookbackSec = cfg.lookbackHours * 3600L
    val q = snapshots.select(col("device_id").as("q_dev"),
      col("snapshot_time").as("q_time"), col("embedding").as("q_vec"))
    val c = snapshots.select(col("device_id").as("c_dev"),
      col("snapshot_time").as("c_time"), col("c_anom"), col("embedding").as("c_vec"))
    // global ANN: top-k across ALL devices (self excluded); a rank window
    // over the pair matrix is acceptable at parity-test scale
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_dev"), col("q_time"))
      .orderBy(col("_sim").desc, col("c_dev").asc, col("c_time").asc)
    val ranked = q.join(c, col("q_dev") =!= col("c_dev") || col("q_time") =!= col("c_time"))
      .withColumn("_sim", cosine_sim(col("q_vec"), col("c_vec")))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cfg.knnK) // the global top-k, reference-style
    val counted = ranked
      .groupBy(col("q_dev"), col("q_time"))
      .agg(count(when(
        col("c_dev") === col("q_dev") && !col("c_anom") &&
          col("c_time") >= col("q_time") - expr(s"INTERVAL $lookbackSec SECONDS") &&
          col("c_time") <= col("q_time") &&
          col("_sim") >= cfg.knnSimThreshold, 1)).as("match_n"))
    snapshots
      .join(counted
          .withColumnRenamed("q_dev", "device_id")
          .withColumnRenamed("q_time", "snapshot_time"),
        Seq("device_id", "snapshot_time"), "left")
      .withColumn("match_n", coalesce(col("match_n"), lit(0L)))
      .withColumn("path3_triggered", col("match_n") < cfg.knnMinMatches)
  }

  /** Convenience overload: corpus anomaly flags come from a prior
    * pathsOneTwo pass ("normal" neighbors only, py:137-159). */
  def pathThreeAfterOneTwo(detected: DataFrame, cfg: DetectionConfig): DataFrame =
    pathThree(
      detected.withColumn("c_anom", coalesce(col("is_anomalous"), lit(false))),
      cfg)

  /** All-methods consensus (detect_anomalies_all.py:219-231): anomalous iff
    * >= `votes` of {rules, path1∨path2, path3} agree. */
  def consensus(df: DataFrame, votes: Int = 2): DataFrame =
    df.withColumn("consensus_votes",
      coalesce(col("rules_triggered").cast("int"), lit(0)) +
        coalesce((col("path1_triggered") || col("path2_triggered")).cast("int"), lit(0)) +
        coalesce(col("path3_triggered").cast("int"), lit(0)))
      .withColumn("consensus_anomalous", col("consensus_votes") >= votes)

  /** All-methods comparison report (detect_anomalies_all.py:66-246): per
    * device, how often each method fires, pairwise agreement, and the
    * ≥2-vote consensus rate. Input: a frame carrying `rules_triggered`,
    * `path1_triggered`, `path2_triggered`, `path3_triggered`. */
  def methodComparison(df: DataFrame): DataFrame = {
    val m1 = coalesce(col("rules_triggered"), lit(false))
    val m2 = coalesce(col("path1_triggered"), lit(false)) ||
      coalesce(col("path2_triggered"), lit(false))
    val m3 = coalesce(col("path3_triggered"), lit(false))
    val votes = m1.cast("int") + m2.cast("int") + m3.cast("int")
    df.groupBy(col("device_id"))
      .agg(
        count(lit(1)).as("n_snapshots"),
        count(when(m1, 1)).as("rules_n"),
        count(when(m2, 1)).as("profile_n"),
        count(when(m3, 1)).as("vector_n"),
        count(when(m1 && m2, 1)).as("rules_profile_agree"),
        count(when(m2 && m3, 1)).as("profile_vector_agree"),
        count(when(m1 && m3, 1)).as("rules_vector_agree"),
        count(when(votes >= 2, 1)).as("consensus_n"))
      .withColumn("consensus_rate",
        round(col("consensus_n").cast("double") / col("n_snapshots"), 4))
  }

  /** Fold a Path-3 verdict into the combined anomaly flag — the reference's
    * `mark_path3_anomaly` UPDATE (path3_vector_search.py:177-199) as an
    * appended-column merge: a snapshot is anomalous if paths 1/2 said so OR
    * path 3 flagged novelty (warmup NULLs count as not-triggered). */
  def withPathThreeVerdict(detected: DataFrame): DataFrame =
    detected.withColumn("is_anomalous",
      coalesce(col("is_anomalous"), lit(false)) ||
        coalesce(col("path3_triggered"), lit(false)))

  /** Anomaly event rows (FIXTURES.md A4 / create_iot_schema.py:185-203 +
    * extended columns kafka_consumer.py:229-283). anomaly_id is a
    * deterministic surrogate for the reference's timeuuid (SURVEY F14).
    *
    * When the input carries a `path3_triggered` column (a [[pathThree]] /
    * [[pathThreeAfterOneTwo]] output), a path-3 novelty verdict emits an
    * event too — the INSERT half of the reference's `mark_path3_anomaly`
    * (path3_vector_search.py:200-224) — with `path3_vector_triggered` set
    * and a PATH 3 clause appended to the details. Frames without the
    * column (paths-1/2-only flows like q50) are unchanged. */
  def anomalyEvents(detected: DataFrame, anomalyType: String = "consumer_paths_1_2"): DataFrame = {
    val hasP3 = detected.columns.contains("path3_triggered")
    val p3 =
      if (hasP3) coalesce(col("path3_triggered"), lit(false)) else lit(false)
    val p3Detail =
      if (hasP3 && detected.columns.contains("match_n"))
        concat(lit("PATH 3 (Vector): "), col("match_n"), lit(" similar matches"))
      else lit("PATH 3 (Vector): novelty")
    detected.filter(coalesce(col("is_anomalous"), lit(false)) || p3)
      .select(
        col("device_id"),
        col("date"),
        hex(xxhash64(col("device_id"), col("snapshot_time"), lit(anomalyType))).as("anomaly_id"),
        col("device_type"),
        col("snapshot_time").as("detected_at"),
        col("snapshot_time"),
        col("anomaly_score"),
        lit(anomalyType).as("anomaly_type"),
        col("metrics").as("metrics_snapshot"),
        lit("open").as("resolution_status"),
        col("path1_triggered").as("path1_rules_triggered"),
        col("path2_triggered").as("path2_fingerprint_triggered"),
        p3.as("path3_vector_triggered"),
        when(p3, concat_ws(" | ", col("detection_details"), p3Detail))
          .otherwise(col("detection_details")).as("detection_details"))
  }
}
