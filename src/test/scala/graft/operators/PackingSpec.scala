package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy: every doc in exactly one pack, budgets respected, deterministic") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .select($"doc_id", (length($"text") / 5).cast("long").as("n_tokens"))
    val budget = 200L
    val packs = Packing.packGreedy(docs, "doc_id", "n_tokens", budget, numPartitions = 8).cache()
    val members = packs.flatMap(_.doc_ids).collect().sorted.toSeq
    val all = docs.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(members == all, "every doc packed exactly once")
    // budget respected except singleton oversized docs
    val tokens = docs.as[(Long, Long)].collect().toMap
    packs.collect().foreach { p =>
      assert(p.total_tokens == p.doc_ids.map(tokens).sum)
      assert(p.total_tokens <= budget || p.doc_ids.length == 1,
        s"pack ${p.pack_id} over budget with ${p.doc_ids.length} members")
    }
    // deterministic
    val again = Packing.packGreedy(docs, "doc_id", "n_tokens", budget, numPartitions = 8)
    assert(packs.collect().sortBy(_.pack_id).toSeq == again.collect().sortBy(_.pack_id).toSeq)
  }

  test("paddingWaste: exact waste on a known fixture; bucketing never loses") {
    // lens: batchSize 2, bucketWidth 4 → naive batches (id order): (7,1),(5,3),(2,8)
    //   waste: (7-1)+(5-3)+(8-2) = 14; real = 26
    // bucketed: bucket ceil(len/4): 7→2,1→1,5→2,3→1,2→1,8→2
    //   bucket1 ids (2,4,5) lens (1,3,2): batches (1,3),(2) → waste 2+0
    //   bucket2 ids (1,3,6) lens (7,5,8): batches (7,5),(8) → waste 2+0
    val docs = Seq((1L, 7L), (2L, 1L), (3L, 5L), (4L, 3L), (5L, 2L), (6L, 8L))
      .toDF("doc_id", "len")
    val out = Packing.paddingWaste(docs, "doc_id", "len", batchSize = 2, bucketWidth = 4)
      .orderBy($"strategy", $"bucket")
      .select($"strategy", $"bucket", $"n_batches", $"real_tokens", $"pad_tokens")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("length_bucketed", 1L, 2L, 6L, 2L),
      ("length_bucketed", 2L, 2L, 20L, 2L),
      ("naive", 0L, 3L, 26L, 14L)))
    // on real data: total bucketed waste <= naive waste (the point of bucketing)
    val real = Tables(spark, sf("sf0.001"), "documents")
      .select($"doc_id", length($"text").as("len"))
    val waste = Packing.paddingWaste(real, "doc_id", "len", 8, 64)
      .groupBy($"strategy").agg(sum($"pad_tokens").as("w"))
      .as[(String, Long)].collect().toMap
    assert(waste("length_bucketed") <= waste("naive"))
  }

  test("writeSharded bounds file sizes and covers all rows") {
    val dir = Files.createTempDirectory("graft_shard").toString
    val docs = Tables(spark, sf("sf0.001"), "documents").select($"doc_id", $"lang")
    Maintenance.writeSharded(docs, dir, "doc_id", recordsPerShard = 50, numShards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10, s"expected >= 500/50 files, got ${files.length}")
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 50, s"${f.getName} has $n rows")
    }
  }

  test("extreme anomaly preset: three failure modes fire at once") {
    val r = graft.sources.IoTSimulator.readings(spark, 20,
      injections = graft.sources.IoTSimulator.extremeAnomaly("RTU-001", 5, 10))
    val snaps = Snapshotter.snapshots(r, dim = 16)
    val hot = snaps.filter($"device_id" === "RTU-001" &&
      $"snapshot_time" === timestamp_seconds(lit(1704067200L + 50)))
      .select($"metrics").as[Map[String, Double]].head()
    val cold = snaps.filter($"device_id" === "RTU-001" &&
      $"snapshot_time" === timestamp_seconds(lit(1704067200L)))
      .select($"metrics").as[Map[String, Double]].head()
    assert(hot("power_consumption") < cold("power_consumption") / 2)
    assert(hot("fan_speed") < cold("fan_speed") / 2)
    assert(hot("filter_dp") > cold("filter_dp") * 2)
  }
}
