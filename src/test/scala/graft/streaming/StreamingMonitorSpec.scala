package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.{Histogram, Sketch}

/** The new monitoring aggregations are pure groupBy aggregates, so the
  * SAME operator code runs incrementally under Structured Streaming:
  * the count-min grid and the drift bin table are streaming state, and
  * the bounded readouts (estimates, TVD) run per trigger on the
  * materialized table. Batch ≡ stream is the contract proven here.
  */
class StreamingMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("count-min grid maintained on a stream equals the batch grid") {
    val mem = MemoryStream[String](spark)
    val grid = Sketch.countMin(mem.toDF().withColumnRenamed("value", "w"),
      "w", depth = 4, width = 64)
    val q = grid.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("cm_grid").start()
    val words = Seq("a", "b", "a", "c", "a", "b", "d", "e", "a", "f")
    mem.addData(words.take(5): _*)
    q.processAllAvailable()
    mem.addData(words.drop(5): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cm_grid").orderBy($"d", $"b")
      .as[(Int, Long, Long)].collect().toSeq
    val batch = Sketch.countMin(words.toDF("w"), "w", 4, 64)
      .orderBy($"d", $"b").as[(Int, Long, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("trend moment sums maintained on a stream equal the batch moments") {
    import org.apache.spark.sql.types.DecimalType
    import graft.operators.Trend
    val mem = MemoryStream[(String, Long, Double)](spark)
    def typed(df: org.apache.spark.sql.DataFrame) =
      df.toDF("k", "xs", "vs").select(col("k"),
        col("xs").cast(DecimalType(10, 0)).as("x"),
        col("vs").cast(DecimalType(12, 2)).as("y"))
    val q = Trend.momentSums(typed(mem.toDF()), "k", "x", "y")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("moments").start()
    val rows = (1 to 30).map(i => ("g", i.toLong * 60, (i % 7) + 0.25))
    mem.addData(rows.take(17): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(17): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = Trend.slope(spark.table("moments"), "k", 86400d, 6)
      .as[(String, Long, Double)].collect().toSeq
    val batch = Trend.slope(
        Trend.momentSums(typed(rows.toDF()), "k", "x", "y"), "k", 86400d, 6)
      .as[(String, Long, Double)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("drift bins maintained on a stream yield the batch TVD") {
    val mem = MemoryStream[(String, Double, Boolean)](spark)
    val bins = Histogram.driftBins(mem.toDF().toDF("k", "v", "p"),
      "k", "v", col("p"), binWidth = 1.0)
    val q = bins.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("drift_bins").start()
    val rows = (1 to 40).map(i => ("g", (i % 7).toDouble, i % 2 == 0)) ++
      (1 to 20).map(i => ("g", (i % 3).toDouble + 10.0, i % 3 == 0))
    mem.addData(rows.take(25): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(25): _*)
    q.processAllAvailable()
    q.stop()
    // per-trigger readout: bounded TVD over the materialized bin table
    val streamed = Histogram.tvFromBins(spark.table("drift_bins"), "k")
      .as[(String, Long, Long, Long)].collect().toSeq
    val batch = Histogram.tvDrift(rows.toDF("k", "v", "p"), "k", "v",
        col("p"), binWidth = 1.0)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("correlation moments maintained on a stream equal the batch matrix") {
    import graft.operators.Trend
    val mem = MemoryStream[(Double, Double, Double)](spark)
    val cols = Seq("x", "y", "z")
    val q = Trend.corrMoments(mem.toDF().toDF("x", "y", "z"), cols)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("corr_moments").start()
    val rows = (1 to 40).map(i =>
      (i.toDouble, 2.0 * i + (i % 3), 100.0 - i + (i % 5)))
    mem.addData(rows.take(23): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(23): _*)
    q.processAllAvailable()
    q.stop()
    // per-trigger readout: the 3-pair matrix from the one-row moment state
    val streamed = Trend.corrFromMoments(spark.table("corr_moments"), cols)
      .orderBy($"col_a", $"col_b")
      .as[(String, String, Double)].collect().toSeq
    val batch = Trend.corrPairs(rows.toDF("x", "y", "z"), cols)
      .orderBy($"col_a", $"col_b")
      .as[(String, String, Double)].collect().toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }
}
