package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Q.dsum

/** Device profile build — the reference's batch "training" job (§3.2,
  * `/root/reference/pipeline/build_profiles.py`): centroid embedding +
  * per-metric population stats over a device's (normal) snapshot history.
  *
  * Shape at scale: three shuffles, all keyed on device_id (or
  * (device_id, pos)) with map-side partial aggregation — the centroid and
  * the stats both via explode + groupBy over decimal-exact sums (dim and
  * metrics are the small axes). Exact summation makes every derived
  * double (and the centroid's float cast) independent of partitioning and
  * merge order — the property the q50/q55/q56 DuckDB oracles rely on.
  * Profiles are tiny (one row per device) and are meant to be broadcast
  * into the detection join (reference J1 semantics: profile cached per
  * device, kafka_consumer.py:486-507).
  */
object Profiles {

  /** @param excludeAnomalous mirror of build_profiles.py:70-83 (P5)
    * @param minSnapshots     guard, build_profiles.py:197-199
    * @param portableCentroid true (default, the declared-query path):
    *   decimal-exact per-position mean, bit-reproducible by an
    *   independent engine under any partitioning. false: the typed
    *   [[graft.functions.VectorCentroid]] Aggregator — one O(dim)
    *   buffer per partition instead of dim exploded rows, the cheaper
    *   shuffle at 100 TB, at the price of partition-order float sums
    *   (agrees with the portable mean to float precision;
    *   ProfilesIncrementalSpec pins the equivalence, same
    *   build/buildPortable split as Ivf). */
  def build(
      snapshots: DataFrame,
      minSnapshots: Int = 5,
      excludeAnomalous: Boolean = true,
      portableCentroid: Boolean = true): DataFrame = {
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
        max(col("snapshot_time")).as("last_seen"), // A11 argmax metadata
        count(lit(1)).as("snapshot_count"))
      .filter(col("snapshot_count") >= minSnapshots)

    // Profile centroid = per-position mean via EXACT decimal summation
    // (the q21 discipline), NOT the float-order-dependent running sum of
    // [[graft.functions.VectorCentroid]]: decimal sums are associative,
    // so the mean — and the float it casts to — is identical under any
    // partitioning/merge order, which is what lets an independent engine
    // (the q50/q55/q56 DuckDB oracles) reproduce profile_embedding
    // bit-for-bit. Same scale shape: shuffle keyed on (device, pos) with
    // map-side partial agg, `partitions × devices × dim` rows.
    val centroid =
      if (portableCentroid)
        base
          .select(col("device_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
          .groupBy(col("device_id"), col("pos"))
          .agg((dsum(col("x"), 15) / count(lit(1))).as("m"))
          .groupBy(col("device_id"))
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("device_id"),
            expr("transform(pm, p -> CAST(p.m AS FLOAT))").as("profile_embedding"))
      else
        base
          .groupBy(col("device_id"))
          .agg(graft.functions.GraftFunctions.vector_centroid(col("embedding"))
            .as("centroid_d"))
          .select(col("device_id"),
            transform(col("centroid_d"), v => v.cast("float")).as("profile_embedding"))

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

    head.join(centroid, Seq("device_id")).join(stats, Seq("device_id"))
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
