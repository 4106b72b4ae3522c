package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, max_by, struct}
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamingCdc._

class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long): Timestamp = new Timestamp(m * 60000L)

  private val updates = Seq(
    Upd(1L, ts(10), 1L, 5.0), Upd(1L, ts(20), 2L, 9.0),  // added, changed
    Upd(1L, ts(30), 3L, 9.0),                            // same value: silent
    Upd(2L, ts(15), 4L, 3.0),                            // added only
    Upd(3L, ts(40), 6L, 7.0), Upd(3L, ts(35), 5L, 1.0))  // in-batch disorder

  private def run(slices: Seq[Seq[Upd]]): Seq[Change] = {
    val mem = MemoryStream[Upd](spark)
    val q = changelog(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cdc").start()
    slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    q.stop()
    val out = spark.table("cdc").as[Change].collect().toSeq
    spark.sql("DROP TABLE cdc")
    out
  }

  test("changelog emits added/changed transitions, suppresses no-ops") {
    val out = run(Seq(updates)).sortBy(c => (c.key, c.ts.getTime))
    assert(out.map(c => (c.key, c.status, c.old_value, c.new_value)) == Seq(
      (1L, "added", None, 5.0), (1L, "changed", Some(5.0), 9.0),
      (2L, "added", None, 3.0),
      // in-batch disorder is replayed in (ts, tie) order: the full
      // history surfaces, ending at the true latest value
      (3L, "added", None, 1.0), (3L, "changed", Some(1.0), 7.0)))
  }

  test("cross-trigger disorder: stale updates are ignored, view matches batch") {
    // one update per trigger, key 3's stale event arrives in a LATER trigger
    val out = run(updates.map(Seq(_)))
    // key 3 emits only the ts(40) add; ts(35) arrives later but is stale
    assert(out.filter(_.key == 3L).map(c => (c.status, c.new_value)) ==
      Seq(("added", 7.0)))
    // folding the changelog (last new_value per key) == batch latest view
    val folded = out.groupBy(_.key).map { case (k, cs) =>
      k -> cs.maxBy(_.ts.getTime).new_value }
    val batch = updates.toDS().toDF()
      .groupBy(col("key"))
      .agg(max_by(col("value"), struct(col("ts"), col("tie"))).as("v"))
      .as[(Long, Double)].collect().toMap
    assert(folded == batch)
  }
}
