package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.DetectionConfig
import graft.sources.IoTSimulator

/** End-to-end mirror of the reference's test_anomaly_detection.sh: inject a
  * compressor failure into RTU-001, build profiles from the clean period,
  * run detection, assert the injected window (and only it) is flagged.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val nTicks = 600L
  private val injectFrom = 400L
  private val injectUntil = 450L
  private val startEpoch = 1704067200L

  private lazy val readings = IoTSimulator.readings(
    spark, nTicks,
    injections = IoTSimulator.compressorFailure("RTU-001", injectFrom, injectUntil))

  private lazy val snaps = Snapshotter.snapshots(readings, dim = 64).cache()

  // profiles from the clean warmup period only (tick < 300)
  private lazy val profiles = Profiles.build(
    snaps.filter($"snapshot_time" < timestamp_seconds(lit(startEpoch + 300 * 10)))).cache()

  private lazy val detected =
    Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone).cache()

  private def inWindow = $"device_id" === "RTU-001" &&
    $"snapshot_time" >= timestamp_seconds(lit(startEpoch + injectFrom * 10)) &&
    $"snapshot_time" < timestamp_seconds(lit(startEpoch + injectUntil * 10))

  test("snapshotter: one snapshot per device per tick, full metric map") {
    assert(snaps.count() == 5 * nTicks)
    val m = snaps.filter($"device_id" === "RTU-001").select(size($"metrics"))
      .distinct().as[Int].collect().toSeq
    assert(m == Seq(IoTSimulator.metricSpecs("rooftop_unit").size))
  }

  test("profiles: one per device, centroid is unit-ish, stats carry all metrics") {
    assert(profiles.count() == 5)
    val p = profiles.filter($"device_id" === "RTU-001").head()
    val stats = p.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("metric_stats")
    assert(stats.size == IoTSimulator.metricSpecs("rooftop_unit").size)
    // constant metric (compressor_status) has std 0 → must be skipped in z-scores
    val compStd = stats.find(_.getAs[String]("metric") == "compressor_status").get.getAs[Double]("std")
    assert(compStd == 0.0)
  }

  test("path 1 flags the injected window") {
    val flaggedInWindow = detected.filter(inWindow && $"path1_triggered").count()
    assert(flaggedInWindow >= 45, s"only $flaggedInWindow of 50 injected snapshots flagged")
  }

  test("normal snapshots are almost never flagged") {
    val normal = detected.filter(!inWindow)
    val falsePos = normal.filter($"is_anomalous").count()
    assert(falsePos <= normal.count() / 50, s"$falsePos false positives")
  }

  test("injected snapshots carry top-3 outlier details and a positive score") {
    val r = detected.filter(inWindow && $"is_anomalous").head()
    val details = r.getAs[String]("detection_details")
    assert(details.contains("PATH 1 (Rules):"))
    assert(r.getAs[Double]("anomaly_score") > 0.0)
    // power_consumption is the strongest injected deviation
    assert(details.contains("power_consumption") || details.contains("supply_air_temp"))
  }

  test("rules engine: compressor-power relationship rule fires in the window") {
    val ruled = Rules.evaluate(spark, snaps)
    val hits = ruled.filter(inWindow && $"rules_triggered")
    assert(hits.count() >= 45)
    val v = hits.select(explode($"rule_violations").as("v")).select($"v.rule")
      .distinct().as[String].collect().toSet
    assert(v.contains("compressor_power_correlation"))
    // rules score follows F11
    val s = ruled.filter(inWindow).select($"rules_score").as[Double].collect()
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("narrow rules evaluator is equivalent to the join-based one") {
    val a = Rules.evaluate(spark, snaps)
      .select($"device_id", $"snapshot_time", $"rule_violations",
        $"n_critical", $"n_warning", $"rules_score", $"rules_triggered")
    val b = Rules.evaluateNarrow(snaps)
      .select($"device_id", $"snapshot_time", $"rule_violations",
        $"n_critical", $"n_warning", $"rules_score", $"rules_triggered")
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
    // and it is a pure projection: adds no exchange beyond the input's own
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(Rules.evaluateNarrow(snaps)) == exchanges(snaps.toDF()),
      "narrow rules must not add a shuffle")
  }

  test("path 3: warmup guard yields NULL verdicts early, verdicts later") {
    val p3 = Detection.pathThreeAfterOneTwo(detected, DetectionConfig.VectorSearch)
    val first = p3.filter($"device_id" === "RTU-001")
      .orderBy($"snapshot_time").select($"path3_triggered").head()
    assert(first.isNullAt(0), "earliest snapshot should be in warmup")
    assert(p3.filter($"path3_triggered".isNotNull).count() > 0)
  }

  test("consensus combines rules + paths votes") {
    val ruled = Rules.evaluate(spark, snaps)
      .select($"device_id", $"snapshot_time", $"rules_triggered")
    val p3 = Detection.pathThreeAfterOneTwo(detected, DetectionConfig.VectorSearch)
      .join(ruled, Seq("device_id", "snapshot_time"))
    val c = Detection.consensus(p3, votes = 2)
    // injected window: rules + path1 both fire → consensus
    assert(c.filter(inWindow && $"consensus_anomalous").count() >= 40)
    assert(c.filter(!inWindow && $"consensus_anomalous").count() <= 5)
  }

  test("method comparison report: rates and consensus per device") {
    val ruled = Rules.evaluate(spark, snaps)
      .select($"device_id", $"snapshot_time", $"rules_triggered")
    val p3 = Detection.pathThreeAfterOneTwo(detected, graft.core.DetectionConfig.VectorSearch)
      .join(ruled, Seq("device_id", "snapshot_time"))
    val rep = Detection.methodComparison(p3)
    assert(rep.count() == 5)
    val rtu = rep.filter($"device_id" === "RTU-001").head()
    assert(rtu.getAs[Long]("n_snapshots") == nTicks)
    assert(rtu.getAs[Long]("profile_n") >= 45)   // path1 fires in the window
    assert(rtu.getAs[Long]("rules_n") >= 45)     // relationship rule fires too
    assert(rtu.getAs[Long]("rules_profile_agree") >= 45)
    assert(rtu.getAs[Long]("consensus_n") >= 45)
    val quiet = rep.filter($"device_id" === "CT-001").head()
    assert(quiet.getAs[Long]("consensus_n") <= nTicks / 50)
  }

  test("anomaly events: deterministic ids, one row per anomalous snapshot") {
    val ev = Detection.anomalyEvents(detected)
    assert(ev.count() == detected.filter($"is_anomalous").count())
    assert(ev.select($"anomaly_id").distinct().count() == ev.count())
    val ev2 = Detection.anomalyEvents(detected)
    assert(ev.select($"anomaly_id").collect().toSet ==
      ev2.select($"anomaly_id").collect().toSet) // deterministic surrogate ids
  }

  test("similar states: neighbors are same-device, non-self, with metric diffs") {
    val targets = detected.filter(inWindow).limit(2)
    val out = SimilarStates.find(snaps.withColumn("is_anomalous", lit(false)), targets, topN = 3)
    assert(out.count() == 6)
    assert(out.filter($"similar_time" === $"snapshot_time").count() == 0)
    val diffs = out.select($"metric_diffs").head().getMap[String, Double](0)
    assert(diffs.nonEmpty)
    // "happened before?" summary (find_similar_states.py:298-315)
    val rep = SimilarStates.summary(out)
    assert(rep.count() == 2)
    val r = rep.head()
    assert(r.getAs[Long]("n_similar") == 3L)
    assert(r.getAs[Double]("avg_similarity") <= r.getAs[Double]("best_similarity") + 1e-9)
  }
}
