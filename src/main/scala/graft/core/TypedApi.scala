package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import graft.operators.{Detection, Profiles, Snapshotter}

/** Typed Dataset facade (SURVEY §1.4): case-class views of the core
  * pipeline for callers who want compile-time field checks. The engine's
  * internals stay DataFrame-based (dynamic metric maps make full typing
  * awkward); these wrappers pin the schema at the API boundary.
  */
object TypedApi {

  /** Detection verdict row (subset of the detection output columns). */
  case class Verdict(
      device_id: String,
      snapshot_time: java.sql.Timestamp,
      is_anomalous: Boolean,
      anomaly_score: Double,
      similarity_to_profile: Double,
      path1_triggered: Boolean,
      path2_triggered: Boolean,
      detection_details: Option[String])

  def readings(df: DataFrame): Dataset[MetricReading] = {
    implicit val enc = Encoders.product[MetricReading]
    df.as[MetricReading]
  }

  def snapshots(readings: Dataset[MetricReading], dim: Int = 384): Dataset[Snapshot] = {
    implicit val enc = Encoders.product[Snapshot]
    // the snapshot table schema carries the verdict columns (reference
    // writes them at insert); pre-detection they hold the defaults
    Snapshotter.snapshots(readings.toDF(), dim)
      .withColumn("anomaly_score", org.apache.spark.sql.functions.lit(0.0))
      .withColumn("is_anomalous", org.apache.spark.sql.functions.lit(false))
      .as[Snapshot]
  }

  /** Paths 1+2 with typed output. Profiles stay a DataFrame (their
    * metric_stats shape is the broadcast payload, not user-facing). */
  def detect(
      snapshots: Dataset[Snapshot],
      profiles: DataFrame,
      cfg: DetectionConfig = DetectionConfig.Consumer): Dataset[Verdict] = {
    implicit val enc = Encoders.product[Verdict]
    Detection.pathsOneTwo(snapshots.toDF(), profiles, cfg)
      .selectExpr("device_id", "snapshot_time", "is_anomalous", "anomaly_score",
        "similarity_to_profile", "path1_triggered", "path2_triggered", "detection_details")
      .as[Verdict]
  }

  /** Convenience: full batch pipeline from typed readings.
    *
    * `profileBefore` bounds the profile-training window: profiles built on
    * snapshots strictly before it, detection runs on everything. Training
    * on the full range (None) silently bakes anomalies into the profile
    * stats — the self-contamination trap the reference avoids by excluding
    * already-flagged snapshots (build_profiles.py:70-83); on a first pass
    * no flags exist yet, so a time split is the honest equivalent. */
  def pipeline(
      spark: SparkSession,
      readingsDs: Dataset[MetricReading],
      dim: Int = 384,
      cfg: DetectionConfig = DetectionConfig.Consumer,
      minSnapshots: Int = 5,
      profileBefore: Option[java.sql.Timestamp] = None): Dataset[Verdict] = {
    val snaps = snapshots(readingsDs, dim)
    val trainSet = profileBefore match {
      case Some(ts) => snaps.toDF().where(org.apache.spark.sql.functions.col("snapshot_time") < ts)
      case None => snaps.toDF()
    }
    val profs = Profiles.build(trainSet, minSnapshots)
    detect(snaps, profs, cfg)
  }
}
