package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamingTransitions._

class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    Step(1L, 100L, 0L, "view"), Step(1L, 200L, 1L, "click"),
    Step(1L, 300L, 2L, "view"), Step(1L, 400L, 3L, "buy"),
    Step(2L, 100L, 4L, "click"), Step(2L, 100L, 5L, "click"), // same ts: seq breaks tie
    Step(3L, 50L, 6L, "view") // single event: no transition
  )

  private def pairs(ts: Seq[Transition]): Seq[(Long, String, String)] =
    ts.map(t => (t.key, t.prev_type, t.next_type)).sorted

  test("batch run equals the lag-window pairs, disorder replayed in order") {
    // feed the events shuffled: the in-batch sort must restore step order
    val shuffled = new scala.util.Random(7).shuffle(events)
    val got = pairs(steps(shuffled.toDS()).collect().toSeq)
    assert(got == Seq(
      (1L, "click", "view"), (1L, "view", "buy"), (1L, "view", "click"),
      (2L, "click", "click")).sorted)
  }

  test("cross-trigger pairing: last event of trigger N pairs with first of N+1") {
    val mem = MemoryStream[Step](spark)
    val q = steps(mem.toDS()).writeStream
      .outputMode(OutputMode.Update()).format("memory")
      .queryName("trans").start()
    mem.addData(Step(9L, 100L, 0L, "view"))
    q.processAllAvailable()
    mem.addData(Step(9L, 200L, 1L, "click")) // pairs with the stored view
    q.processAllAvailable()
    mem.addData(Step(9L, 150L, 2L, "buy"))   // STALE: older than stored last
    q.processAllAvailable()
    mem.addData(Step(9L, 300L, 3L, "buy"))
    q.processAllAvailable()
    q.stop()
    val got = pairs(spark.table("trans").as[Transition].collect().toSeq)
    assert(got == Seq(
      (9L, "view", "click"), (9L, "click", "buy")).sorted)
  }

  test("drained in-order stream ≡ batch for a multi-key fixture") {
    val mem = MemoryStream[Step](spark)
    val q = steps(mem.toDS()).writeStream
      .outputMode(OutputMode.Update()).format("memory")
      .queryName("trans2").start()
    val ordered = events.sortBy(e => (e.epoch_us, e.seq))
    ordered.grouped(3).foreach { batch =>
      mem.addData(batch: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = pairs(spark.table("trans2").as[Transition].collect().toSeq)
    val batch = pairs(steps(events.toDS()).collect().toSeq)
    assert(streamed == batch)
  }
}
