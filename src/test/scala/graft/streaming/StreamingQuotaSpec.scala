package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StreamingQuota.DocIn

class StreamingQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[DocIn]], cap: Int): Seq[DocIn] = {
    val mem = MemoryStream[DocIn](spark)
    val q = StreamingQuota.capPerGroup(mem.toDS(), cap)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("quota").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val out = spark.table("quota").as[DocIn].collect().toSeq
    spark.sql("DROP VIEW IF EXISTS quota")
    out
  }

  test("admits exactly the first k per group in event-time order, across triggers") {
    val b1 = Seq(
      DocIn(1, "a", 100), DocIn(2, "a", 200), DocIn(3, "b", 100))
    val b2 = Seq(
      DocIn(4, "a", 300), DocIn(5, "a", 400), DocIn(6, "b", 200))
    val out = run(Seq(b1, b2), cap = 3)
    // group a: seen 1,2 (t1), then 4 admitted, 5 over cap; group b: 3, 6
    assert(out.map(_.doc_id).sorted == Seq(1L, 2L, 3L, 4L, 6L))
  }

  test("state is count+HWM only: late and duplicate rows are dropped, cap holds") {
    val b1 = Seq(DocIn(10, "g", 500), DocIn(11, "g", 600))
    val b2 = Seq(
      DocIn(10, "g", 500),  // duplicate delivery
      DocIn(9, "g", 400),   // late arrival below HWM
      DocIn(12, "g", 700))
    val out = run(Seq(b1, b2), cap = 2)
    assert(out.map(_.doc_id).sorted == Seq(10L, 11L))
  }

  test("batch and stream agree when rows arrive in order") {
    val docs = (1L to 30L).map(i => DocIn(i, s"s${i % 3}", i * 10))
    val streamed = run(Seq(docs.take(15), docs.drop(15)), cap = 4)
      .map(_.doc_id).sorted
    // batch reference: first 4 per group in (epoch, id) order
    val batch = docs.groupBy(_.group).values
      .flatMap(_.sortBy(d => (d.epoch_us, d.doc_id)).take(4))
      .map(_.doc_id).toSeq.sorted
    assert(streamed == batch)
    // and the one-pass batch Dataset execution matches too
    val oneShot = StreamingQuota.capPerGroup(docs.toDS(), 4)
      .as[DocIn].collect().map(_.doc_id).sorted.toSeq
    assert(oneShot == batch)
  }
}
