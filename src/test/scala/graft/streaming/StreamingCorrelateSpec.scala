package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StreamingCorrelate.{Click, Err}

class StreamingCorrelateSpec extends SparkSpec {
  import spark.implicits._

  private val MIN_US = 60L * 1000000L

  private def run(clickBatches: Seq[Seq[Click]], errBatches: Seq[Seq[Err]])
      : Set[(Long, Long, Long)] = {
    val cm = MemoryStream[Click](spark)
    val em = MemoryStream[Err](spark)
    val q = StreamingCorrelate.clicksBeforeErrors(cm.toDS(), em.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("corr").start()
    clickBatches.zipAll(errBatches, Seq.empty[Click], Seq.empty[Err])
      .foreach { case (cb, eb) =>
        if (cb.nonEmpty) cm.addData(cb: _*)
        if (eb.nonEmpty) em.addData(eb: _*)
        q.processAllAvailable()
      }
    q.stop()
    val out = spark.table("corr")
      .select($"user_id", $"click_id", $"err_id")
      .as[(Long, Long, Long)].collect().toSet
    spark.sql("DROP VIEW IF EXISTS corr")
    out
  }

  test("errors pair with same-user clicks in the preceding window only") {
    val clicks = Seq(
      Click(1, 10, 0),            // 12 min before err -> outside window
      Click(1, 11, 5 * MIN_US),   // 7 min before -> inside
      Click(1, 12, 13 * MIN_US),  // 1 min AFTER the error -> excluded
      Click(2, 20, 11 * MIN_US))  // other user
    val errs = Seq(Err(1, 100, 12 * MIN_US))
    val out = run(Seq(clicks), Seq(errs))
    assert(out == Set((1L, 11L, 100L)))
  }

  test("cross-trigger pairing: a click buffered in state joins a later-batch error") {
    val out = run(
      Seq(Seq(Click(1, 10, 5 * MIN_US)), Seq.empty),
      Seq(Seq.empty, Seq(Err(1, 100, 12 * MIN_US))))
    assert(out == Set((1L, 10L, 100L)))
  }

  test("batch and stream agree (time-ordered trigger cuts)") {
    val clicks = (1L to 60L).map { i =>
      Click(i % 4, i, ((i * 7919L) % 50L) * MIN_US)
    }.sortBy(_.click_us)
    val errs = (1L to 20L).map { j =>
      Err(j % 4, 100 + j, ((j * 104729L) % 50L + 5L) * MIN_US)
    }.sortBy(_.err_us)
    val streamed = run(
      Seq(clicks.take(30), clicks.drop(30), Seq.empty),
      Seq(errs.take(10), errs.drop(10), Seq.empty))
    val batch = StreamingCorrelate.clicksBeforeErrors(clicks.toDS(), errs.toDS())
      .select($"user_id", $"click_id", $"err_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must actually produce correlations")
  }

  test("watermark bounds state: ancient clicks can no longer match") {
    // batch 1 pushes both watermarks far ahead; batch 2's ancient click
    // (far below watermark - window) must not pair with batch-2 errors
    val out = run(
      Seq(Seq(Click(1, 10, 500 * MIN_US)), Seq(Click(1, 11, 8 * MIN_US))),
      Seq(Seq(Err(1, 100, 505 * MIN_US)), Seq(Err(1, 101, 10 * MIN_US))))
    assert(out == Set((1L, 10L, 100L)))
  }
}
