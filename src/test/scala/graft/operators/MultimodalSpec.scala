package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    Tables(spark, sf("sf0.001"), "documents")).cache()

  test("media table: binary payloads with typed kind metadata") {
    assert(media.count() == 500)
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(media.filter(length($"payload") > 0).count() == 500)
  }

  test("feature extraction: per-partition decoder, fixed-dim deterministic features") {
    val f1 = Multimodal.extractFeatures(media).cache()
    assert(f1.count() == 500)
    val r = f1.head()
    assert(r.features.length == 16)
    assert(math.abs(r.features.sum - 1.0f) < 1e-3, "histogram must sum to ~1")
    assert(r.decode_ok && r.n_bytes > 0)
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(media)
    assert(f1.collect().sortBy(_.media_id).toSeq == f2.collect().sortBy(_.media_id).toSeq)
  }

  test("chunk sampling keeps every stride-th chunk") {
    val out = Multimodal.sampleChunks(media.toDF(), chunkBytes = 50, stride = 2)
    val one = out.filter($"media_id" === media.head().media_id)
    assert(one.count() >= 1)
    assert(out.filter(length($"chunk") > 50).count() == 0)
  }

  test("resize stub: caps payload size, preserves metadata, deterministic") {
    val resized = Multimodal.resizeStub(media, targetBytes = 40)
    assert(resized.collect().forall(_.payload.length <= 40))
    val before = media.collect().map(r => r.media_id -> r.kind).toMap
    assert(resized.collect().map(r => r.media_id -> r.kind).toMap == before)
    val a = Multimodal.resizeStub(media, 40).collect().map(_.payload.toSeq).toSet
    val b = Multimodal.resizeStub(media, 40).collect().map(_.payload.toSeq).toSet
    assert(a == b)
    // short payloads pass through untouched
    val short = media.filter(r => r.payload.length <= 40).collect().map(_.media_id).toSet
    val kept = Multimodal.resizeStub(media, 40).collect()
      .filter(r => short(r.media_id)).map(_.payload.length).toSet
    assert(media.collect().filter(r => short(r.media_id))
      .map(_.payload.length).toSet == kept)
  }

  test("features feed the standard vector operators (cosine over media)") {
    import graft.functions.GraftFunctions.cosine_sim
    val f = Multimodal.extractFeatures(media).toDF()
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val knn = Knn.exact(f, f.filter($"vec_id" < 3), k = 2)
    assert(knn.count() == 6)
    val sims = knn.select($"sim").as[Double].collect()
    assert(sims.forall(s => s >= -1.0 && s <= 1.0 + 1e-9))
  }
}
