package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.IoTSimulator

/** Incremental ≡ batch, bit-for-bit: profile stats maintained as mergeable
  * decimal sufficient statistics must finalize to EXACTLY the doubles the
  * from-scratch build computes, regardless of how the history was split
  * into batches or the merge order. */
class ProfilesIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("split/merge/finalize equals the from-scratch stats exactly") {
    val snaps = Snapshotter.snapshots(
      IoTSimulator.readings(spark, nTicks = 120), dim = 8).cache()

    // batch reference: build's stats branch
    val batch = Profiles.build(snaps, minSnapshots = 1)
      .select($"device_id", $"metric_stats")

    // incremental: three uneven chunks, merged pairwise in a skewed order
    val c1 = snaps.filter($"snapshot_time" < timestamp_seconds(lit(1704067200L + 300)))
    val c2 = snaps.filter($"snapshot_time" >= timestamp_seconds(lit(1704067200L + 300)) &&
      $"snapshot_time" < timestamp_seconds(lit(1704067200L + 700)))
    val c3 = snaps.filter($"snapshot_time" >= timestamp_seconds(lit(1704067200L + 700)))
    assert(c1.count() > 0 && c2.count() > 0 && c3.count() > 0, "3 non-empty chunks")
    val merged = Profiles.mergeStatsState(
      Profiles.mergeStatsState(Profiles.statsState(c3), Profiles.statsState(c1)),
      Profiles.statsState(c2))
    val incr = Profiles.finalizeStats(merged)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"device_id", to_json($"metric_stats").as("j"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(canon(incr) == canon(batch), "incremental must equal batch bit-for-bit")
  }
}
