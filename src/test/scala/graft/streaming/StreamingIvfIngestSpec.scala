package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Ivf, Knn}
import graft.sources.Tables

class StreamingIvfIngestSpec extends SparkSpec {
  import spark.implicits._

  private case class Vec(vec_id: Long, embedding: Seq[Float])

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings").cache()

  test("streaming assignment equals batch assignment (pure map, no state)") {
    val base = emb.filter($"vec_id" < 400)
    val late = emb.filter($"vec_id" >= 400)
    val idx = Ivf.buildPortable(base, nCells = 8, iters = 2)

    val rows = late.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().map { case (i, e) => Vec(i, e) }
    val ms = MemoryStream[Vec](spark)
    val q = StreamingIvfIngest.assigned(idx, ms.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("ivf_assign").start()
    ms.addData(rows.take(30): _*)
    q.processAllAvailable()
    ms.addData(rows.drop(30): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ivf_assign")
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toSet
    val batch = Ivf.assignVectors(idx, late)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toSet
    spark.sql("DROP VIEW IF EXISTS ivf_assign")
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("ingested vectors join the stored layout; pruned search sees them, still prunes") {
    val base = emb.filter($"vec_id" < 400)
    val late = emb.filter($"vec_id" >= 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    try {
      val idx = Ivf.buildPortable(base, nCells = 8, iters = 2)
      Ivf.writeIndex(idx, s"$dir/idx")

      val rows = late.select($"vec_id", $"embedding")
        .as[(Long, Seq[Float])].collect().map { case (i, e) => Vec(i, e) }
      val ms = MemoryStream[Vec](spark)
      ms.addData(rows: _*)
      val q = StreamingIvfIngest.ingest(idx, ms.toDF(), s"$dir/idx", s"$dir/ckpt")
      q.awaitTermination()

      val stored = Ivf.readIndex(spark, s"$dir/idx")
      assert(stored.assigned.count() == emb.count(),
        "stored corpus must contain base + streamed vectors")

      // exhaustive pruned probe over the GROWN index == exact kNN over ALL
      val queries = emb.filter($"vec_id" < 5)
      val got = Ivf.searchPrunedPortable(stored, queries, k = 5, nprobe = 8)
      got.collect()
      val planStr = got.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[cell_id".r.findFirstIn(planStr).isDefined,
        s"grown index must still prune the scan:\n$planStr")
      val exact = Knn.exact(emb, queries, k = 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      assert(got.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet == exact)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("compactDedup removes crash-window duplicate appends; search is restored") {
    val base = emb.filter($"vec_id" < 400)
    val late = emb.filter($"vec_id" >= 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf_compact").toString
    try {
      val idx = Ivf.buildPortable(base, nCells = 8, iters = 2)
      Ivf.writeIndex(idx, s"$dir/idx")
      // simulate a replay landing in the append→marker crash window:
      // the same assigned batch appended twice
      val dup = Ivf.assignVectors(idx, late)
        .select($"vec_id", $"embedding", $"cell_id")
      dup.write.mode("append").partitionBy("cell_id").parquet(s"$dir/idx/assigned")
      dup.write.mode("append").partitionBy("cell_id").parquet(s"$dir/idx/assigned")
      val before = spark.read.parquet(s"$dir/idx/assigned")
      assert(before.count() == emb.count() + late.count(), "duplicates present")

      StreamingIvfIngest.compactDedup(spark, s"$dir/idx")
      val stored = Ivf.readIndex(spark, s"$dir/idx")
      assert(stored.assigned.count() == emb.count(), "one row per vector again")
      // and exhaustive pruned search equals exact kNN over the full corpus
      val queries = emb.filter($"vec_id" < 5)
      val exact = Knn.exact(emb, queries, k = 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      assert(Ivf.searchPrunedPortable(stored, queries, k = 5, nprobe = 8)
        .select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet == exact)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
