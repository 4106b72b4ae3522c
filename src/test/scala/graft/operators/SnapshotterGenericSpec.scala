package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** A3 pivot genericity: the snapshotter works over any narrow
  * (entity, ts, name, value) stream — here the driver's events table with
  * user_id as the device and event_type as the metric.
  */
class SnapshotterGenericSpec extends SparkSpec {
  import spark.implicits._

  test("events table pivots into per-(user, ts) snapshot maps with embeddings") {
    val ev = Tables(spark, sf("sf0.001"), "events")
      .select(
        $"user_id".cast("string").as("device_id"),
        lit("user").as("device_type"),
        $"ts".as("timestamp"),
        $"event_type".as("metric_name"),
        $"value".as("metric_value"),
        lit("n/a").as("unit"), lit("web").as("location"), lit("site").as("building_id"))
    val snaps = Snapshotter.snapshots(ev, dim = 32)
    // one snapshot per distinct (user, ts)
    assert(snaps.count() == ev.select($"device_id", $"timestamp").distinct().count())
    val r = snaps.head()
    assert(r.getAs[Map[String, Double]]("metrics").nonEmpty)
    assert(r.getAs[scala.collection.Seq[Float]]("embedding").length == 32)
    // embeddings are unit-norm (or zero)
    val norms = snaps.select(graft.functions.GraftFunctions.l2_norm($"embedding"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-4 || n == 0.0))
  }

  test("duplicate metric readings within one tick keep the max value (no map-key crash)") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val readings = Seq(
      ("d1", "hvac", ts, "temp", 20.0, "c", "l", "b"),
      ("d1", "hvac", ts, "temp", 21.5, "c", "l", "b"), // same metric, same tick
      ("d1", "hvac", ts, "fan", 1.0, "rpm", "l", "b"))
      .toDF("device_id", "device_type", "timestamp", "metric_name",
        "metric_value", "unit", "location", "building_id")
    val snaps = Snapshotter.snapshots(readings, dim = 16).collect()
    assert(snaps.length == 1)
    val m = snaps.head.getAs[Map[String, Double]]("metrics")
    assert(m == Map("temp" -> 21.5, "fan" -> 1.0))
  }
}
