package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Path 1a — static rules engine (reference
  * `/root/reference/pipeline/detect_anomalies_rules.py`).
  *
  * Threshold rules are *data*: a small DataFrame broadcast-joined against
  * exploded metrics (R1). Relationship rules are *expressions*: pure
  * `Column` predicates over the metric map (R2) — no UDFs, fully
  * codegen'd. The verdict and score mirror record_rule_anomaly
  * (detect_anomalies_rules.py:190-202): score = min(1, 0.3·crit + 0.1·warn).
  */
object Rules {

  /** (device_type, metric, min, max, critical) — mirror of DEVICE_RULES
    * (detect_anomalies_rules.py:28-67). */
  val thresholdRules: Seq[(String, String, Double, Double, Boolean)] = Seq(
    ("rooftop_unit", "supply_air_temp", 50, 90, true),
    ("rooftop_unit", "return_air_temp", 60, 85, false),
    ("rooftop_unit", "outdoor_air_temp", -20, 120, false),
    ("rooftop_unit", "power_consumption", 0, 50, true),
    ("rooftop_unit", "compressor_status", 0, 1, false),
    ("rooftop_unit", "fan_speed", 0, 1200, false),
    ("rooftop_unit", "fan_current", 0, 30, false),
    ("makeup_air_unit", "supply_air_temp", 50, 90, false),
    ("makeup_air_unit", "return_air_temp", 60, 85, false),
    ("makeup_air_unit", "outdoor_air_temp", -20, 120, false),
    ("makeup_air_unit", "power_consumption", 0, 45, true),
    ("makeup_air_unit", "fan_speed", 0, 1200, false),
    ("chiller", "chilled_water_supply_temp", 35, 55, true),
    ("chiller", "chilled_water_return_temp", 45, 65, false),
    ("chiller", "condenser_water_temp", 60, 100, false),
    ("chiller", "power_consumption", 0, 200, true),
    ("chiller", "capacity_percentage", 0, 100, false),
    ("chiller", "refrigerant_pressure", 0, 200, false),
    ("cooling_tower", "inlet_water_temp", 60, 110, false),
    ("cooling_tower", "outlet_water_temp", 50, 90, true),
    ("cooling_tower", "ambient_temp", -20, 120, false),
    ("cooling_tower", "water_flow_rate", 0, 2000, true),
    ("cooling_tower", "power_consumption", 0, 30, false),
    ("air_compressor", "discharge_pressure", 80, 150, true),
    ("air_compressor", "discharge_temp", 100, 250, true),
    ("air_compressor", "motor_current", 0, 100, false),
    ("air_compressor", "power_consumption", 0, 150, true),
    ("air_compressor", "tank_pressure", 80, 150, false))

  /** Relationship rule: a named cross-metric predicate over the `metrics`
    * map (RELATIONSHIP_RULES, detect_anomalies_rules.py:70-91). */
  case class RelationshipRule(
      name: String, deviceType: String, critical: Boolean, message: String)(
      val condition: Column => Column)

  val relationshipRules: Seq[RelationshipRule] = Seq(
    RelationshipRule("compressor_power_correlation", "rooftop_unit", critical = false,
      "Compressor on but power consumption too low")(m =>
      m.getItem("compressor_status") === 1.0 && m.getItem("power_consumption") < 5.0),
    RelationshipRule("temp_differential", "rooftop_unit", critical = false,
      "Abnormal temperature differential between supply and return air")(m =>
      abs(m.getItem("supply_air_temp") - m.getItem("return_air_temp")) > 25.0),
    RelationshipRule("delta_t_check", "chiller", critical = true,
      "Delta T too low - possible flow issues")(m =>
      m.getItem("chilled_water_delta_t") < 3.0))

  /** Narrow variant: the static rule tables compiled into one per-row
    * column expression — no explode, no join, no shuffle. Streaming-safe
    * (pure projection) and the faster batch path when rules are compile-time
    * constants; [[evaluate]] remains the shape for rules-as-data. Output
    * columns match [[evaluate]] exactly. */
  def evaluateNarrow(snapshots: DataFrame): DataFrame = {
    val dt = col("device_type")
    val m = col("metrics")
    val thresholdStructs = thresholdRules.map { case (rdt, metric, mn, mx, crit) =>
      val v = m.getItem(metric)
      when(dt === rdt && v.isNotNull && (v < mn || v > mx),
        struct(
          lit("threshold").as("rule"), lit(metric).as("metric"),
          lit(if (crit) "CRITICAL" else "WARNING").as("severity"),
          concat(lit(metric), lit(s" out of range [${fmt(mn)}, ${fmt(mx)}]: "), v).as("message")))
    }
    val relStructs = relationshipRules.map { r =>
      when(dt === r.deviceType && coalesce(r.condition(m), lit(false)),
        struct(
          lit(r.name).as("rule"), lit(null).cast("string").as("metric"),
          lit(if (r.critical) "CRITICAL" else "WARNING").as("severity"),
          lit(r.message).as("message")))
    }
    val all = array_sort(filter(array((thresholdStructs ++ relStructs): _*), v => v.isNotNull))
    snapshots
      .withColumn("rule_violations", all)
      .withColumn("n_critical",
        size(filter(col("rule_violations"), v => v.getField("severity") === "CRITICAL")))
      .withColumn("n_warning",
        size(filter(col("rule_violations"), v => v.getField("severity") === "WARNING")))
      .withColumn("rules_score",
        least(lit(1.0), col("n_critical") * 0.3 + col("n_warning") * 0.1))
      .withColumn("rules_triggered", size(col("rule_violations")) > 0)
  }

  /** Format thresholds the way the join-based message does (Spark casts the
    * numeric literal to string: integral doubles render like "50.0"). */
  private def fmt(d: Double): String = d.toString

  /** Snapshot-level rules verdict: appends
    * `rule_violations array<struct<rule,metric,severity,message>>`,
    * `rules_score` (F11) and `rules_triggered`. */
  def evaluate(spark: SparkSession, snapshots: DataFrame): DataFrame = {
    import spark.implicits._
    val rulesDf = broadcast(thresholdRules
      .toDF("r_device_type", "r_metric", "r_min", "r_max", "r_critical"))

    val key = snapshots.select(col("device_id"), col("snapshot_time"),
      col("device_type"), col("metrics"))

    // R1: explode metrics, equi-join rule table, keep out-of-range rows
    val thresholdViol = key
      .select(col("device_id"), col("snapshot_time"), col("device_type"),
        explode(col("metrics")).as(Seq("metric", "v")))
      .join(rulesDf,
        col("device_type") === col("r_device_type") && col("metric") === col("r_metric"))
      .filter(col("v") < col("r_min") || col("v") > col("r_max"))
      .select(col("device_id"), col("snapshot_time"),
        struct(
          lit("threshold").as("rule"), col("metric"),
          when(col("r_critical"), "CRITICAL").otherwise("WARNING").as("severity"),
          concat(col("metric"), lit(" out of range ["), col("r_min"), lit(", "),
            col("r_max"), lit("]: "), col("v")).as("message")).as("violation"))

    // R2: relationship predicates evaluated directly on the metric map
    val relViol = relationshipRules.map { r =>
      key.filter(col("device_type") === r.deviceType &&
          coalesce(r.condition(col("metrics")), lit(false)))
        .select(col("device_id"), col("snapshot_time"),
          struct(
            lit(r.name).as("rule"), lit(null).cast("string").as("metric"),
            lit(if (r.critical) "CRITICAL" else "WARNING").as("severity"),
            lit(r.message).as("message")).as("violation"))
    }.reduce(_ unionByName _)

    val allViol = thresholdViol.unionByName(relViol)
      .groupBy(col("device_id"), col("snapshot_time"))
      .agg(array_sort(collect_list(col("violation"))).as("rule_violations"))

    snapshots.join(allViol, Seq("device_id", "snapshot_time"), "left")
      .withColumn("rule_violations",
        coalesce(col("rule_violations"), array().cast(
          "array<struct<rule:string,metric:string,severity:string,message:string>>")))
      .withColumn("n_critical",
        size(filter(col("rule_violations"), v => v.getField("severity") === "CRITICAL")))
      .withColumn("n_warning",
        size(filter(col("rule_violations"), v => v.getField("severity") === "WARNING")))
      // F11 (detect_anomalies_rules.py:198-202)
      .withColumn("rules_score",
        least(lit(1.0), col("n_critical") * 0.3 + col("n_warning") * 0.1))
      .withColumn("rules_triggered", size(col("rule_violations")) > 0)
  }
}
