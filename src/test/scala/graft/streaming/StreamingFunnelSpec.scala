package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamingFunnel._

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  // view=0, click=1, purchase=2
  private val events = Seq(
    FunnelEvent(1L, 0, 100L), FunnelEvent(1L, 1, 200L), FunnelEvent(1L, 2, 300L),
    FunnelEvent(2L, 1, 50L), // click before any view: must not count
    FunnelEvent(2L, 0, 100L), FunnelEvent(2L, 1, 150L),
    FunnelEvent(3L, 2, 10L), // purchase with no prior stages: ignored
    FunnelEvent(4L, 0, 500L), FunnelEvent(4L, 1, 400L), // click predates view
  )

  private def finalRows(rows: Seq[FunnelRow]): Map[Long, Seq[Long]] =
    rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.last.stageUs }

  test("batch funnel state matches the q99-style min-chain on a fixture") {
    val out = track(events.toDS(), nStages = 3).collect().toSeq
    val byUser = finalRows(out)
    val M = Long.MaxValue
    assert(byUser(1L) == Seq(100L, 200L, 300L))
    assert(byUser(2L) == Seq(100L, 150L, M)) // the 50us click was rejected
    assert(!byUser.contains(3L) || byUser(3L) == Seq(M, M, M))
    assert(byUser(4L) == Seq(500L, M, M)) // click predating the view rejected
  }

  test("stream across triggers (in event-time order) equals the batch run") {
    val mem = MemoryStream[FunnelEvent](spark)
    val q = track(mem.toDS(), nStages = 3).writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName("funl").start()
    val ordered = events.sortBy(_.epoch_us)
    mem.addData(ordered.take(4): _*)
    q.processAllAvailable()
    mem.addData(ordered.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = finalRows(
      spark.table("funl").as[FunnelRow].collect().toSeq.sortBy(_.user_id))
    val batch = finalRows(track(events.toDS(), nStages = 3).collect().toSeq)
    // compare on users that produced any state change in either run
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
  }

  test("funnel state survives a checkpointed restart (simulated crash)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, lit}
    val src = Files.createTempDirectory("graft_fun_src").toString
    val sink = Files.createTempDirectory("graft_fun_sink").toString
    val ckpt = Files.createTempDirectory("graft_fun_ckpt").toString
    val schema = Seq.empty[FunnelEvent].toDS().schema

    def append(evs: Seq[FunnelEvent]): Unit =
      evs.toDS().coalesce(1).write.mode("append").parquet(src)

    def startQuery() = {
      val stream = spark.readStream.schema(schema).parquet(src).as[FunnelEvent]
      // parquet sinks are append-only; update-mode state output lands via
      // foreachBatch appends — the standard deployment shape
      track(stream, nStages = 3)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelRow], _: Long) =>
          df.select(col("user_id"), col("stageUs"))
            .write.mode("append").parquet(sink)
        }
        .start()
    }
    // phase 1: user 7 reaches stage 1, then the query "crashes"
    append(Seq(FunnelEvent(7L, 0, 100L), FunnelEvent(7L, 1, 200L)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // phase 2: the purchase arrives while down; restart from checkpoint —
    // the recovered state must still know stages 0/1, so stage 2 admits
    append(Seq(FunnelEvent(7L, 2, 300L)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(sink)
      .filter(col("user_id") === lit(7L))
      .select(col("stageUs")).as[Seq[Long]].collect()
    assert(rows.contains(Seq(100L, 200L, 300L)),
      s"recovered state lost the funnel frontier: ${rows.toSeq}")
  }

  test("cross-trigger disorder only tightens floors, never loosens them") {
    val mem = MemoryStream[FunnelEvent](spark)
    val q = track(mem.toDS(), nStages = 2).writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName("funl2").start()
    // trigger 1: view@100, click@200 -> admitted
    mem.addData(FunnelEvent(9L, 0, 100L), FunnelEvent(9L, 1, 200L))
    q.processAllAvailable()
    // trigger 2: an EARLIER view arrives late -> floor tightens to 50,
    // the already-admitted click remains valid (200 >= 50)
    mem.addData(FunnelEvent(9L, 0, 50L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funl2").as[FunnelRow].collect().last
    assert(last.stageUs == Seq(50L, 200L))
  }
}
