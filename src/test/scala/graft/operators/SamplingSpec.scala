package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("sf0.01"), "documents")

  test("hashSample is deterministic and lands near the target rate") {
    val a = Sampling.hashSample(docs, "doc_id", 20, seed = 1)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs, "doc_id", 20, seed = 1)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "same seed, same rows")
    val n = docs.count().toDouble
    assert(a.length > n * 0.12 && a.length < n * 0.28,
      s"20% target, got ${a.length}/$n")
    // a different seed draws a different set
    val c = Sampling.hashSample(docs, "doc_id", 20, seed = 2)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }

  test("sampled set is monotone in the rate (bucket nesting)") {
    val small = Sampling.hashSample(docs, "doc_id", 10, seed = 3)
      .select($"doc_id").as[Long].collect().toSet
    val big = Sampling.hashSample(docs, "doc_id", 40, seed = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), "pct=10 rows must all appear at pct=40")
  }

  test("stratified rates apply per stratum") {
    val s = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 0), defaultPct = 100, seed = 7)
    assert(s.filter($"lang" === "en").count() == 0)
    val nonEn = docs.filter($"lang" =!= "en").count()
    assert(s.count() == nonEn, "non-en strata kept at 100%")
  }

  test("deterministicShuffle: a contiguous permutation equal to the global hash order") {
    import graft.functions.TextFunctions.hash32
    val out = Sampling.deterministicShuffle(docs, "doc_id", seed = 13, numBuckets = 16)
      .select($"shuffle_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    val n = docs.count()
    assert(out.map(_._1).toSeq == (1L to n).toSeq, "positions are 1..n with no gaps")
    // bucketed offset+rank must equal the single global-order rank
    val expected = docs.select($"doc_id",
        hash32($"doc_id".cast("string"), 13).as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
      .zipWithIndex.map { case ((id, _), i) => (i + 1L, id) }.toSeq
    assert(out.toSeq == expected)
    // reruns identical; different seed -> different permutation
    val again = Sampling.deterministicShuffle(docs, "doc_id", seed = 13, numBuckets = 16)
      .select($"shuffle_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
    val other = Sampling.deterministicShuffle(docs, "doc_id", seed = 14, numBuckets = 16)
      .select($"shuffle_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(other.toSeq != out.toSeq)
  }
}
