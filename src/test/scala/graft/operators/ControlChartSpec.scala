package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class ControlChartSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: Seq[(Long, Int, Double)]) =
    rows.toDF("user_id", "event_id", "value")
      .select($"user_id", timestamp_seconds(lit(1700000000L) + $"event_id").as("ts"),
        $"event_id".cast("long").as("event_id"), $"value")

  test("ewma matches a naive sequential recomputation") {
    val vals = Seq(10.0, 10.5, 9.5, 30.0, 10.0, 10.2, 9.8, 10.1)
    val df = series(vals.zipWithIndex.map { case (v, i) => (1L, i, v) })
    val out = ControlChart.ewma(df, "user_id", "ts", "event_id", "value",
      alpha = 0.2, nSigma = 3.0).collect().head
    // naive recompute with the same exact baseline
    val n = vals.length
    def dec(d: Double, s: Int) = BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    // decimal sum → double FIRST, then double division (the engine's op order)
    val mu = vals.map(dec(_, 2)).sum.toDouble / n
    val sigma = math.sqrt(vals.map(v => dec(v * v, 4)).sum.toDouble / n - mu * mu)
    var z = mu; var exceed = 0L
    vals.foreach { x =>
      if (math.abs(x - z) > 3.0 * sigma) exceed += 1
      z = z + 0.2 * (x - z)
    }
    assert(out.getAs[Long]("n") == n)
    assert(out.getAs[Double]("ewma_final") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getAs[Long]("n_out_of_control") == exceed)
  }

  test("ewma: the spike is flagged, constant series never fires") {
    val spiky = series((0 until 50).map(i =>
      (1L, i, if (i == 25) 100.0 else 10.0 + (i % 3) * 0.1)))
    val r = ControlChart.ewma(spiky, "user_id", "ts", "event_id", "value", 0.2, 3.0)
      .collect().head
    assert(r.getAs[Long]("n_out_of_control") >= 1)
    val const = series((0 until 20).map(i => (2L, i, 5.0)))
    val rc = ControlChart.ewma(const, "user_id", "ts", "event_id", "value", 0.2, 3.0)
      .collect().head
    assert(rc.getAs[Long]("n_out_of_control") == 0L)
    assert(rc.getAs[Double]("ewma_final") == 5.0)
  }

  test("cusum catches a sustained small shift that ewma's 3-sigma misses") {
    // mean 10, sd ~1 noise; from tick 60 a persistent +1.2 shift — never
    // beyond 3 sigma pointwise, but the drift accumulates.
    val vals = (0 until 120).map { i =>
      val noise = ((i * 37) % 7 - 3) * 0.3
      if (i < 60) 10.0 + noise else 11.2 + noise
    }
    val df = series(vals.zipWithIndex.map { case (v, i) => (1L, i, v) })
    val cu = ControlChart.cusum(df, "user_id", "ts", "event_id", "value",
      kSigma = 0.5, hSigma = 4.0).collect().head
    assert(cu.getAs[Long]("n_alerts") >= 1, "drift must fire cusum")
    val ew = ControlChart.ewma(df, "user_id", "ts", "event_id", "value", 0.2, 3.0)
      .collect().head
    assert(ew.getAs[Long]("n_out_of_control") == 0L,
      "pointwise test stays blind to the small shift")
  }

  test("cusum accumulators are non-negative and reset after alerts") {
    val df = series((0 until 40).map(i => (1L, i, if (i % 10 == 9) 50.0 else 10.0)))
    val r = ControlChart.cusum(df, "user_id", "ts", "event_id", "value", 0.5, 4.0)
      .collect().head
    assert(r.getAs[Double]("cusum_high") >= 0.0)
    assert(r.getAs[Double]("cusum_low") >= 0.0)
  }

  test("per-key independence: results match single-key runs on real data") {
    val events = Tables(spark, sf("sf0.001"), "events")
    val all = ControlChart.ewma(events, "user_id", "ts", "event_id", "value", 0.2, 3.0)
    val one = ControlChart.ewma(events.filter($"user_id" === 7), "user_id", "ts",
      "event_id", "value", 0.2, 3.0)
    assert(all.filter($"user_id" === 7).collect().toSeq == one.collect().toSeq)
  }
}
