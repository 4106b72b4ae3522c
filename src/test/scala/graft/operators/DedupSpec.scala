package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "  The  QUICK brown fox jumps over the lazy dog "), // exact dup after norm
    (2L, "the quick brown fox jumps over the lazy cat"),     // near dup of 0/1
    (3L, "completely different words entirely here today now friend"),
  ).toDF("doc_id", "text")

  test("exactGroups collapses normalization-equivalent duplicates") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .orderBy($"keep_id").as[(Long, Long)].collect().toSeq
    assert(g == Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("minhash LSH finds the near-duplicate pair") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))              // identical → always banded
    assert(!pairs.exists(p => p._2 == 3L))        // unrelated doc never pairs
  }

  test("simhash of identical docs has Hamming distance 0; dissimilar docs don't") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(!out.contains((0L, 3L)))
  }

  test("shingleJaccard computes exact jaccard") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.shingleJaccard(docs, pairs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 1L)) === 1.0)          // identical shingle sets
    assert(!j.contains((0L, 3L)))        // zero intersection → no row
  }

  test("embeddingNearDup: LSH banding finds near-identical vectors without O(n^2)") {
    // synthetic near-dup regime: 50 bases x 3 noisy copies, true pairs at
    // cosine ~0.99+ (sign-LSH collision prob per bit ~1 there)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).flatMap { g =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 3).map { c =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.02).toFloat).toSeq
        ((g * 3 + c).toLong, v)
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, minCosine = 0.95, dim = 64)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val truePairs = (0 until 50).flatMap { g =>
      val ids = (0 until 3).map(c => (g * 3 + c).toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val recall = (truePairs & pairs).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"recall $recall")
    // rescoring keeps only genuinely similar pairs
    assert(pairs.forall { case (a, b) => a / 3 == b / 3 }, "no cross-group pairs")
  }

  test("nearDupGroups: transitive chains collapse to one component") {
    // component logic on explicit pairs: 10-11-12 chained, 20-21 separate
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val groups = Dedup.nearDupGroups(pairs).as[(Long, Long)].collect().toMap
    assert(groups(11L) == 10L && groups(12L) == 10L && groups(10L) == 10L)
    assert(groups(21L) == 20L)
  }

  test("nearDupSurvivors: one survivor per near-identical group, others untouched") {
    val base = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    val v1 = base.replace("w30", "zzz")            // ~ base
    val v2 = v1.replace("w01", "yyy")               // ~ v1 (and ~ base)
    val docs = Seq((10L, base), (11L, v1), (12L, v2),
      (13L, "completely unrelated words entirely different content here")).toDF("doc_id", "text")
    val survivors = Dedup.nearDupSurvivors(docs, "doc_id", "text", minJaccard = 0.5)
      .as[Long].collect().toSet
    assert(survivors == Set(10L, 13L), s"survivors: $survivors")
  }

  test("simhash blockBits prunes the pair space") {
    val all = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64, blockBits = 0).count()
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64, blockBits = 8).count()
    assert(blocked <= all)
  }
}
