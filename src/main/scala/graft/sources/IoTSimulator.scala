package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fleet data generator (reference S1:
  * `/root/reference/iot_simulator/iot_simulator.py` — stateful random-walk
  * simulators for 5 HVAC device types with anomaly injection).
  *
  * Spark-first re-expression: instead of a stateful per-device Python loop,
  * the signal is a *closed-form* function of (device, metric, tick) — a
  * seasonal sine plus hash-seeded noise — generated distributively from
  * `spark.range(nTicks) × fleet × metrics`. Determinism comes from
  * `xxhash64`, not RNG state, so any partition can compute any slice
  * independently (crucial for a 1000-executor generator: no sequential
  * state, no driver loop).
  *
  * Anomaly injection mirrors the reference's failure modes
  * (iot_simulator.py:197-606) as declarative overrides on tick ranges.
  */
object IoTSimulator {

  case class Device(deviceId: String, deviceType: String, location: String, buildingId: String)

  /** (metric, unit, base, amplitude, noiseAmp) per device type — compact
    * mirror of the simulator MetricSpec dicts
    * (iot_simulator.py:156-176,275-293,352-371,448-466,530-548). */
  val metricSpecs: Map[String, Seq[(String, String, Double, Double, Double)]] = Map(
    "rooftop_unit" -> Seq(
      ("supply_air_temp", "°F", 62.0, 4.0, 1.0), ("return_air_temp", "°F", 73.0, 3.0, 1.0),
      ("outdoor_air_temp", "°F", 68.0, 15.0, 2.0), ("power_consumption", "kW", 22.0, 6.0, 1.5),
      ("compressor_status", "0/1", 1.0, 0.0, 0.0), ("fan_speed", "RPM", 900.0, 80.0, 20.0),
      ("fan_current", "Amps", 12.0, 2.0, 0.5), ("filter_dp", "inH2O", 0.6, 0.1, 0.05),
      ("humidity", "%", 45.0, 8.0, 2.0), ("damper_position", "%", 40.0, 15.0, 3.0)),
    "makeup_air_unit" -> Seq(
      ("supply_air_temp", "°F", 65.0, 4.0, 1.0), ("return_air_temp", "°F", 72.0, 3.0, 1.0),
      ("outdoor_air_temp", "°F", 68.0, 15.0, 2.0), ("power_consumption", "kW", 18.0, 5.0, 1.2),
      ("fan_speed", "RPM", 850.0, 70.0, 18.0), ("heating_coil_temp", "°F", 95.0, 10.0, 2.0),
      ("airflow", "CFM", 5200.0, 400.0, 100.0)),
    "chiller" -> Seq(
      ("chilled_water_supply_temp", "°F", 44.0, 2.0, 0.5),
      ("chilled_water_return_temp", "°F", 54.0, 2.5, 0.6),
      ("chilled_water_delta_t", "°F", 10.0, 1.0, 0.3),
      ("condenser_water_temp", "°F", 85.0, 4.0, 1.0),
      ("power_consumption", "kW", 120.0, 25.0, 5.0), ("capacity_percentage", "%", 65.0, 15.0, 3.0),
      ("refrigerant_pressure", "PSIG", 120.0, 10.0, 2.0), ("vibration", "mm/s", 2.0, 0.4, 0.1)),
    "cooling_tower" -> Seq(
      ("inlet_water_temp", "°F", 95.0, 5.0, 1.0), ("outlet_water_temp", "°F", 82.0, 4.0, 1.0),
      ("ambient_temp", "°F", 70.0, 12.0, 2.0), ("water_flow_rate", "GPM", 1200.0, 150.0, 30.0),
      ("power_consumption", "kW", 15.0, 4.0, 1.0), ("fan_vibration", "mm/s", 1.5, 0.3, 0.1)),
    "air_compressor" -> Seq(
      ("discharge_pressure", "PSIG", 115.0, 8.0, 2.0), ("discharge_temp", "°F", 180.0, 15.0, 3.0),
      ("motor_current", "Amps", 60.0, 10.0, 2.0), ("power_consumption", "kW", 75.0, 15.0, 3.0),
      ("tank_pressure", "PSIG", 110.0, 6.0, 1.5), ("oil_pressure", "PSIG", 45.0, 4.0, 1.0)))

  /** The 5-device default fleet (README.md:1141-1151 shape). */
  val defaultFleet: Seq[Device] = Seq(
    Device("RTU-001", "rooftop_unit", "building-A", "bldg-001"),
    Device("RTU-002", "rooftop_unit", "building-B", "bldg-002"),
    Device("MAU-001", "makeup_air_unit", "building-A", "bldg-001"),
    Device("CH-001", "chiller", "building-C", "bldg-003"),
    Device("CT-001", "cooling_tower", "building-C", "bldg-003"))

  /** Declarative anomaly override applied to a device's metric over a tick
    * range: v' = v * scale + offset (compose modes with several entries). */
  case class Injection(
      deviceId: String, metric: String, fromTick: Long, untilTick: Long,
      scale: Double = 1.0, offset: Double = 0.0)

  /** Reference-style failure-mode presets (iot_simulator.py:197-269). */
  def compressorFailure(deviceId: String, from: Long, until: Long): Seq[Injection] = Seq(
    Injection(deviceId, "power_consumption", from, until, scale = 0.1),
    Injection(deviceId, "supply_air_temp", from, until, offset = 18.0))

  /** Three simultaneous failure modes — the demo-validation injector
    * (inject_extreme_anomaly.py:16-80): compressor failure + fan failure +
    * filter blockage at once. */
  def extremeAnomaly(deviceId: String, from: Long, until: Long): Seq[Injection] =
    compressorFailure(deviceId, from, until) ++ Seq(
      Injection(deviceId, "fan_speed", from, until, scale = 0.2),
      Injection(deviceId, "fan_current", from, until, scale = 2.5),
      Injection(deviceId, "filter_dp", from, until, scale = 4.0))

  /** Narrow metric readings DataFrame (FIXTURES.md A1 schema). */
  def readings(
      spark: SparkSession,
      nTicks: Long,
      tickSeconds: Int = 10,
      startEpoch: Long = 1704067200L, // 2024-01-01T00:00:00Z
      fleet: Seq[Device] = defaultFleet,
      injections: Seq[Injection] = Nil): DataFrame = {
    import spark.implicits._

    val specRows = fleet.flatMap { d =>
      metricSpecs(d.deviceType).map { case (m, unit, base, amp, noise) =>
        (d.deviceId, d.deviceType, d.location, d.buildingId, m, unit, base, amp, noise)
      }
    }
    val specs = specRows.toDF(
      "device_id", "device_type", "location", "building_id",
      "metric_name", "unit", "base", "amp", "noise")

    val ticks = spark.range(nTicks).select($"id".as("tick"))
    // deterministic per-(device, metric) phase and per-(device, metric, tick) noise
    val phase = (pmod(xxhash64($"device_id", $"metric_name"), lit(6283)) / 1000.0)
    val noiseU = pmod(xxhash64($"device_id", $"metric_name", $"tick"), lit(10001)) / 10000.0 - 0.5
    val raw = ticks.crossJoin(broadcast(specs))
      // period ~63 ticks: short enough that any few-hundred-tick training
      // window sees every phase (so profiles generalize), long enough that
      // adjacent ticks are similar (so path-3 finds near neighbors)
      .withColumn("value_clean",
        $"base" + $"amp" * sin($"tick" / 10.0 + phase) + $"noise" * noiseU * 2.0)

    val injected = injections.foldLeft(raw) { (df, inj) =>
      df.withColumn("value_clean",
        when($"device_id" === inj.deviceId && $"metric_name" === inj.metric &&
          $"tick" >= inj.fromTick && $"tick" < inj.untilTick,
          $"value_clean" * inj.scale + inj.offset)
          .otherwise($"value_clean"))
    }

    injected
      .withColumn("timestamp",
        timestamp_seconds(lit(startEpoch) + $"tick" * tickSeconds))
      .select(
        $"device_id", $"device_type", $"timestamp", $"metric_name",
        round($"value_clean", 2).as("metric_value"), // F5: 2-dp at source
        $"unit", $"location", $"building_id",
        date_format($"timestamp", "yyyy-MM-dd").as("date")) // F1: date bucket
  }
}
