package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.vector_centroid
import graft.queries.Q.dsum

/** Device profile build — the reference's batch "training" job (§3.2,
  * `/root/reference/pipeline/build_profiles.py`): centroid embedding +
  * per-metric population stats over a device's (normal) snapshot history.
  *
  * Shape at scale: two shuffles, both keyed on device_id with map-side
  * partial aggregation — the centroid via [[graft.functions.VectorCentroid]]
  * (O(dim) buffers), the stats via explode + groupBy (metrics is the small
  * axis). Profiles are tiny (one row per device) and are meant to be
  * broadcast into the detection join (reference J1 semantics: profile
  * cached per device, kafka_consumer.py:486-507).
  */
object Profiles {

  /** @param excludeAnomalous mirror of build_profiles.py:70-83 (P5)
    * @param minSnapshots     guard, build_profiles.py:197-199 */
  def build(
      snapshots: DataFrame,
      minSnapshots: Int = 5,
      excludeAnomalous: Boolean = true): DataFrame = {
    val base =
      if (excludeAnomalous && snapshots.columns.contains("is_anomalous"))
        snapshots.filter(!col("is_anomalous"))
      else snapshots

    val head = base
      .groupBy(col("device_id"))
      .agg(
        first(col("device_type")).as("device_type"),
        first(col("location")).as("location"),
        first(col("building_id")).as("building_id"),
        vector_centroid(col("embedding")).as("centroid_d"),
        max(col("snapshot_time")).as("last_seen"), // A11 argmax metadata
        count(lit(1)).as("snapshot_count"))
      .filter(col("snapshot_count") >= minSnapshots)
      .withColumn("profile_embedding",
        transform(col("centroid_d"), v => v.cast("float")))
      .drop("centroid_d")

    // Per-metric stats: NumPy parity = population std (SURVEY A5 note).
    // Decimal-exact sums keep the derived doubles engine-stable.
    val stats = base
      .select(col("device_id"), explode(col("metrics")).as(Seq("metric", "v")))
      .groupBy(col("device_id"), col("metric"))
      .agg(
        (dsum(col("v"), 2) / count(lit(1))).as("mean"),
        sqrt((dsum(col("v") * col("v"), 4) / count(lit(1))) -
          (dsum(col("v"), 2) / count(lit(1))) *
            (dsum(col("v"), 2) / count(lit(1)))).as("std"),
        min(col("v")).as("min"),
        max(col("v")).as("max"))
      .groupBy(col("device_id"))
      .agg(array_sort(collect_list(
        struct(col("metric"), col("mean"), col("std"), col("min"), col("max"))))
        .as("metric_stats"))

    head.join(stats, Seq("device_id"))
  }

  /** Mergeable per-(device, metric) sufficient statistics — the
    * incremental form of [[build]]'s stats pass. At 100 TB profiles are
    * never re-aggregated from full history: each ingest batch contributes
    * its partial state, states merge associatively ([[mergeStatsState]]),
    * and mean/std finalize on read ([[finalizeStats]]). The sums stay
    * DECIMAL in the state, so merging is exact in any order/grouping and
    * the finalized doubles are bit-identical to a from-scratch [[build]]
    * (asserted in ProfilesIncrementalSpec). */
  def statsState(snapshots: DataFrame): DataFrame =
    snapshots
      .select(col("device_id"), explode(col("metrics")).as(Seq("metric", "v")))
      .groupBy(col("device_id"), col("metric"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(30, 2))).as("s"),
        sum((col("v") * col("v")).cast(org.apache.spark.sql.types.DecimalType(30, 4))).as("s2"),
        min(col("v")).as("vmin"),
        max(col("v")).as("vmax"))

  /** Merge two (or, via repeated application, any number of) stats states. */
  def mergeStatsState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("device_id"), col("metric"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("s")).as("s"),
        sum(col("s2")).as("s2"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))

  /** Finalize a state to the [[build]] stats shape (mean / population std /
    * min / max per metric). */
  def finalizeStats(state: DataFrame): DataFrame =
    state
      .select(col("device_id"), col("metric"),
        (col("s").cast("double") / col("n")).as("mean"),
        sqrt((col("s2").cast("double") / col("n")) -
          (col("s").cast("double") / col("n")) *
            (col("s").cast("double") / col("n"))).as("std"),
        col("vmin").as("min"), col("vmax").as("max"))
      .groupBy(col("device_id"))
      .agg(array_sort(collect_list(
        struct(col("metric"), col("mean"), col("std"), col("min"), col("max"))))
        .as("metric_stats"))
}
