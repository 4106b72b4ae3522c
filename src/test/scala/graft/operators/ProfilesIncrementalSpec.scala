package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.IoTSimulator

/** Incremental ≡ batch, bit-for-bit: profile stats maintained as mergeable
  * decimal sufficient statistics must finalize to EXACTLY the doubles the
  * from-scratch build computes, regardless of how the history was split
  * into batches or the merge order. */
class ProfilesIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("split/merge/finalize equals the from-scratch stats exactly") {
    val snaps = Snapshotter.snapshots(
      IoTSimulator.readings(spark, nTicks = 120), dim = 8).cache()

    // batch reference: build's stats branch
    val batch = Profiles.build(snaps, minSnapshots = 1)
      .select($"device_id", $"metric_stats")

    // incremental: three uneven chunks, merged pairwise in a skewed order
    val c1 = snaps.filter($"snapshot_time" < timestamp_seconds(lit(1704067200L + 300)))
    val c2 = snaps.filter($"snapshot_time" >= timestamp_seconds(lit(1704067200L + 300)) &&
      $"snapshot_time" < timestamp_seconds(lit(1704067200L + 700)))
    val c3 = snaps.filter($"snapshot_time" >= timestamp_seconds(lit(1704067200L + 700)))
    assert(c1.count() > 0 && c2.count() > 0 && c3.count() > 0, "3 non-empty chunks")
    val merged = Profiles.mergeStatsState(
      Profiles.mergeStatsState(Profiles.statsState(c3), Profiles.statsState(c1)),
      Profiles.statsState(c2))
    val incr = Profiles.finalizeStats(merged)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"device_id", to_json($"metric_stats").as("j"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(canon(incr) == canon(batch), "incremental must equal batch bit-for-bit")
  }

  test("portable centroid ≡ Aggregator centroid to float precision") {
    val snaps = Snapshotter.snapshots(
      IoTSimulator.readings(spark, nTicks = 120), dim = 16).cache()
    def emb(portable: Boolean) =
      Profiles.build(snaps, minSnapshots = 1, portableCentroid = portable)
        .select($"device_id", $"profile_embedding")
        .as[(String, Seq[Float])].collect().sortBy(_._1).toSeq
    val (p, a) = (emb(true), emb(false))
    assert(p.map(_._1) == a.map(_._1))
    // the decimal-exact mean and the partition-order double mean may
    // differ in the double's last ulps; after the float cast they must
    // agree to within one float ulp per component
    p.zip(a).foreach { case ((d, pe), (_, ae)) =>
      pe.zip(ae).foreach { case (x, y) =>
        assert(math.abs(x - y) <= math.ulp(math.max(math.abs(x), math.abs(y))),
          s"$d: $x vs $y")
      }
    }
  }

  test("streaming foreachBatch maintains the profile state table (stream ≡ batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.core.MetricReading

    val snaps = Snapshotter.snapshots(
      IoTSimulator.readings(spark, nTicks = 60), dim = 8).cache()
    val readings = IoTSimulator.readings(spark, nTicks = 60)
      .as[MetricReading].collect().toSeq

    // state table accumulated across micro-batches (the reference's
    // continuously-updated device_profiles, kafka_consumer.py:486-519)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val mem = MemoryStream[MetricReading](spark)
    val q = mem.toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batchSnaps = Snapshotter.snapshots(batch.toDF(), dim = 8)
        val delta = Profiles.statsState(batchSnaps)
        // materialize the merged state so lineage doesn't accrete per batch
        state = Some(state.fold(delta)(s =>
          Profiles.mergeStatsState(s, delta)).localCheckpoint(eager = true))
      }
      .start()
    // three arbitrary micro-batches; per-metric stats see each reading
    // exactly once no matter where a tick's rows split
    readings.grouped(math.max(1, readings.size / 3 + 1)).foreach { chunk =>
      mem.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = Profiles.finalizeStats(state.get)
    val batchRef = Profiles.build(snaps, minSnapshots = 1)
      .select($"device_id", $"metric_stats")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"device_id", to_json($"metric_stats").as("j"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(canon(streamed) == canon(batchRef),
      "stream-maintained profiles must equal the batch build bit-for-bit")
  }
}
