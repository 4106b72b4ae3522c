package graft.core

import java.sql.Timestamp

/** Typed row models mirroring the reference's tables (FIXTURES.md §A,
  * citing /root/reference/scylladb_setup/create_iot_schema.py).
  * DataFrames remain the working currency; these exist for typed Dataset
  * APIs and documentation of the schemas.
  */

/** One metric reading — the Kafka message / `device_metrics_raw` row
  * (create_iot_schema.py:69-86; kafka_producer.py:149-158). */
case class MetricReading(
    device_id: String,
    device_type: String,
    timestamp: Timestamp,
    metric_name: String,
    metric_value: Double,
    unit: String,
    location: String,
    building_id: String,
    date: String)

/** Wide per-tick snapshot — `device_state_snapshots`
  * (create_iot_schema.py:115-134). */
case class Snapshot(
    device_id: String,
    date: String,
    snapshot_time: Timestamp,
    device_type: String,
    location: String,
    building_id: String,
    metrics: Map[String, Double],
    embedding: Seq[Float],
    embedding_method: String,
    anomaly_score: Double,
    is_anomalous: Boolean)

/** Per-metric profile statistics (population std for NumPy parity —
  * build_profiles.py:108-135). */
case class MetricStats(metric: String, mean: Double, std: Double, min: Double, max: Double)

/** Device profile — `device_profiles` (create_iot_schema.py:159-171). */
case class DeviceProfile(
    device_id: String,
    device_type: String,
    location: String,
    building_id: String,
    profile_embedding: Seq[Float],
    metric_stats: Seq[MetricStats],
    snapshot_count: Long)

/** Detection thresholds. The reference ships conflicting defaults across
  * files (SURVEY.md §2.9) — each preset is one file's semantics. */
case class DetectionConfig(
    zThreshold: Double,
    outlierCount: Int,
    fingerprintThreshold: Double,
    knnK: Int,
    knnSimThreshold: Double,
    knnMinMatches: Int,
    warmupCount: Int,
    lookbackHours: Int)

object DetectionConfig {
  /** pipeline/anomaly_detection.py:17-19 (shared consumer path). */
  val Consumer: DetectionConfig =
    DetectionConfig(6.0, 4, 0.93, 10, 0.85, 7, 30, 24)
  /** pipeline/detect_anomalies.py:26-28 (standalone batch detector). */
  val Standalone: DetectionConfig =
    DetectionConfig(3.0, 1, 0.85, 10, 0.85, 7, 30, 24)
  /** pipeline/detect_anomalies_vector_search.py:29-33 (vector-search variant). */
  val VectorSearch: DetectionConfig =
    DetectionConfig(6.0, 4, 0.75, 50, 0.90, 5, 30, 24)
}
