package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Audit

/** Exactly-once discipline of the front door's parquet landing sink:
  * a replayed micro-batch (at-least-once delivery after a crash before
  * the checkpoint commit) must leave the landed table CONTENT-IDENTICAL
  * — gated on [[Audit.tableChecksum]], the order-independent table
  * checksum. */
class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(id: Long, k: String, v: Double)

  private def checksum(path: String): Row =
    Audit.tableChecksum(spark.read.parquet(path),
      Seq("id", "k", "v", "_batch_id")).head()

  test("landBatch replay: a re-fired batch leaves the table content-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val out = s"$dir/landing"
    val b0 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v")
    val b1 = Seq((3L, "c", 30.0)).toDF("id", "k", "v")
    KafkaFrontDoor.landBatch(b0, 0, out)
    KafkaFrontDoor.landBatch(b1, 1, out)
    val before = checksum(out)
    assert(before.getAs[Long]("n_rows") === 3)

    // crash-replay: batch 0 re-fires with the same deterministic rows —
    // dynamic partition overwrite replaces ONLY _batch_id=0
    KafkaFrontDoor.landBatch(b0, 0, out)
    val after = checksum(out)
    assert(after === before, "replayed batch must not change table content")
    assert(spark.read.parquet(out).filter($"_batch_id" === 1).count() === 1,
      "other batches' partitions must be untouched by the replay")

    // a batch with CHANGED rows would be caught (checksum is a real gate)
    KafkaFrontDoor.landBatch(
      Seq((1L, "a", 99.0), (2L, "b", 20.0)).toDF("id", "k", "v"), 0, out)
    assert(checksum(out) !== before)
    // restore and re-verify — overwrite is self-healing for batch 0
    KafkaFrontDoor.landBatch(b0, 0, out)
    assert(checksum(out) === before)
  }

  test("landToParquet: MemoryStream end-to-end; restart appends, never duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_e2e").toString
    val out = s"$dir/landing"
    val ckpt = s"$dir/ckpt"
    val ms = MemoryStream[Ev](spark)
    ms.addData(Ev(1, "a", 1.0), Ev(2, "b", 2.0))
    val q1 = KafkaFrontDoor.landToParquet(ms.toDF(), out, ckpt).start()
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = checksum(out)
    assert(afterFirst.getAs[Long]("n_rows") === 2)

    // restart from the same checkpoint: already-committed batches are NOT
    // re-fired; new data lands as the next batch id
    ms.addData(Ev(3, "c", 3.0))
    val q2 = KafkaFrontDoor.landToParquet(ms.toDF(), out, ckpt).start()
    q2.processAllAvailable()
    q2.stop()
    val table = spark.read.parquet(out)
    assert(table.count() === 3)
    assert(table.select($"id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(table.select($"_batch_id").distinct().count() === 2)
  }

  test("engine-level crash replay: batch dies AFTER the sink write, restart re-fires it; table unchanged") {
    // THE crash window, induced for real: the foreachBatch body lands
    // batch 1 and then throws BEFORE the checkpoint commit is recorded.
    // On restart Spark re-fires batch 1 with the same offsets through
    // the same sink — the dynamic partition overwrite must leave the
    // landed table content-identical.
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_replay").toString
    val out = s"$dir/landing"
    val ckpt = s"$dir/ckpt"
    val ms = MemoryStream[Ev](spark)
    ms.addData(Ev(1, "a", 1.0), Ev(2, "b", 2.0))
    val q1 = KafkaFrontDoor.landToParquet(ms.toDF(), out, ckpt).start()
    q1.processAllAvailable(); q1.stop()

    // crashing run: batch 1 lands, then the "process dies" pre-commit
    ms.addData(Ev(3, "c", 3.0))
    val q2 = ms.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        KafkaFrontDoor.landBatch(batch, batchId, out)
        throw new RuntimeException("injected crash after sink write, before commit")
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    val afterCrash = checksum(out)
    assert(afterCrash.getAs[Long]("n_rows") === 3, "batch 1 DID land before the crash")

    // restart: the engine replays batch 1 (its commit never happened)
    val q3 = KafkaFrontDoor.landToParquet(ms.toDF(), out, ckpt).start()
    q3.processAllAvailable(); q3.stop()
    assert(checksum(out) === afterCrash,
      "engine-replayed batch must leave the landed table content-identical")
    assert(spark.read.parquet(out).select($"id").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
  }
}
