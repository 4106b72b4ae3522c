package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.hash_featurize

/** Narrow metric readings → wide per-tick snapshots (reference §3.1:
  * `/root/reference/pipeline/kafka_consumer.py:381-484`).
  *
  * Faithful subtlety (SURVEY §2.10): the unit of snapshotting is one
  * snapshot per **distinct source timestamp** per device
  * (kafka_consumer.py:421-446) — all metrics of a tick share the tick
  * timestamp; the 60 s window only delays emission. In batch mode the
  * window is therefore irrelevant to the result and we group by
  * (device_id, timestamp) directly — one shuffle keyed on the snapshot
  * identity, which is also the natural partitioning for everything
  * downstream (profiles, detection, kNN are all per-device).
  */
object Snapshotter {

  /** Canonical snapshot text (reference F6, kafka_consumer.py:345-366):
    * `"<device_id> <metric>:<%.2f> ..."` with *sorted* metric keys — the
    * sort and fixed 2-dp format are load-bearing for embedding
    * reproducibility. */
  def snapshotText(deviceId: Column, metrics: Column): Column =
    concat_ws(" ", deviceId,
      concat_ws(" ", transform(array_sort(map_entries(metrics)),
        e => concat(e.getField("key"), lit(":"),
          format_string("%.2f", e.getField("value"))))))

  /** Sorted (metric_name, metric_value) entries with duplicate names
    * removed, keeping the greatest value per name. The reference's dict
    * build last-write-wins on arrival order when a device emits the same
    * metric twice in one tick; arrival order doesn't exist in a shuffled
    * batch, so max-per-name is the deterministic stand-in — and it keeps
    * `map_from_entries` from throwing DUPLICATED_MAP_KEY under Spark's
    * default mapKeyDedupPolicy=EXCEPTION. */
  private[graft] def dedupEntries(entries: Column): Column =
    filter(entries, (e, i) =>
      (i === size(entries) - 1) ||
        (element_at(entries, i + 2).getField("metric_name") =!= e.getField("metric_name")))

  /** Batch snapshot build: group by (device, tick timestamp), pivot the
    * metric rows into a map, featurize into an embedding.
    *
    * @param dim embedding dimension (reference default 384,
    *            create_iot_schema.py:31) */
  def snapshots(readings: DataFrame, dim: Int = 384): DataFrame =
    readings
      .groupBy(col("device_id"), col("timestamp"))
      .agg(
        first(col("device_type")).as("device_type"),
        first(col("location")).as("location"),
        first(col("building_id")).as("building_id"),
        // entries land in their own column first so the dedup lambda
        // references a bound attribute (a lambda body re-evaluates any
        // non-attribute subtree per element — see TextFunctions.shingles)
        array_sort(collect_list(struct(col("metric_name"), col("metric_value"))))
          .as("_entries"))
      .withColumn("metrics", map_from_entries(dedupEntries(col("_entries"))))
      .drop("_entries")
      .select(
        col("device_id"),
        date_format(col("timestamp"), "yyyy-MM-dd").as("date"),
        col("timestamp").as("snapshot_time"),
        col("device_type"), col("location"), col("building_id"),
        col("metrics"),
        hash_featurize(col("metrics"), dim).as("embedding"),
        lit("hash_projection").as("embedding_method"))
}
