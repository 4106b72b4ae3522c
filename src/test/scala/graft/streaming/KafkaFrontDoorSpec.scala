package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class KafkaFrontDoorSpec extends AnyFunSuite {
  import KafkaFrontDoor._

  test("first-start lookback becomes startingTimestamp = now - lookback") {
    val cfg = SourceConfig("broker:9092", "iot-metrics",
      lookbackMs = Some(10L * 60 * 1000), maxOffsetsPerTrigger = Some(50000L))
    val opts = sourceOptions(cfg, nowMs = 1_700_000_600_000L)
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "iot-metrics")
    assert(opts("startingTimestamp") == (1_700_000_600_000L - 600_000L).toString)
    assert(!opts.contains("startingOffsets"), "timestamp rewind replaces startingOffsets")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("failOnDataLoss") == "false",
      "reference policy: tolerate expired offsets, seek to earliest available")
  }

  test("no lookback: start from latest, no rate cap") {
    val opts = sourceOptions(SourceConfig("b:9092", "t"), nowMs = 1L)
    assert(opts("startingOffsets") == "latest")
    assert(!opts.contains("startingTimestamp"))
    assert(!opts.contains("maxOffsetsPerTrigger"))
  }

  test("sink options carry broker + topic") {
    val opts = sinkOptions("b1:9092,b2:9092", "iot-out")
    assert(opts == Map("kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "topic" -> "iot-out"))
  }
}
