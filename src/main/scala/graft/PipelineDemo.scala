package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.DetectionConfig
import graft.operators._
import graft.sources.IoTSimulator

/** End-to-end demo of the IoT pipeline (the reference's main dataflow,
  * SURVEY.md §3.1-3.3): simulate a fleet with an injected compressor
  * failure, snapshot, profile, detect on all three paths, emit events.
  *
  * Run: sbt "runMain graft.PipelineDemo"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val readings = IoTSimulator.readings(spark, nTicks = 600,
      injections = IoTSimulator.compressorFailure("RTU-001", 400, 450))
    val snaps = Snapshotter.snapshots(readings, dim = 384).cache()
    // Train profiles on the clean warmup period (reference semantics:
    // anomalous snapshots are excluded from profile builds, P5 — here by
    // time split since flags don't exist yet on first pass).
    val profiles = Profiles.build(
      snaps.filter(col("snapshot_time") < timestamp_seconds(lit(1704067200L + 300 * 10))))
    val detected = Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone).cache()
    val withP3 = Detection.pathThreeAfterOneTwo(detected, DetectionConfig.VectorSearch)
    val ruled = Rules.evaluateNarrow(snaps) // shuffle-free rules path
      .select(col("device_id"), col("snapshot_time"), col("rules_triggered"))
    val consensus = Detection.consensus(withP3.join(ruled, Seq("device_id", "snapshot_time")))
    val events = Detection.anomalyEvents(detected)

    println(s"readings=${readings.count()} snapshots=${snaps.count()} " +
      s"profiles=${profiles.count()} anomalies=${detected.filter(col("is_anomalous")).count()} " +
      s"consensus=${consensus.filter(col("consensus_anomalous")).count()} events=${events.count()}")
    println("sample snapshot text: " + snaps
      .select(Snapshotter.snapshotText(col("device_id"), col("metrics"))).head().getString(0).take(100))
    events.select("device_id", "snapshot_time", "anomaly_score", "detection_details")
      .orderBy("snapshot_time").show(5, 100)
    println("similar-states investigation for the first anomaly:")
    val firstAnom = detected.filter(col("is_anomalous"))
      .orderBy(col("snapshot_time")).limit(1)
    val investigation = SimilarStates.find(detected, firstAnom, topN = 3)
    investigation.select("device_id", "rk", "sim", "similar_time", "similar_anomalous").show(3)
    SimilarStates.summary(investigation).show(1, false)
    println("all-methods comparison (detect_anomalies_all):")
    Detection.methodComparison(
      withP3.join(ruled, Seq("device_id", "snapshot_time")))
      .orderBy("device_id").show(10, false)
    spark.stop()
  }
}
