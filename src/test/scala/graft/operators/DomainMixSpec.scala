package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Contract of [[Corpus.domainMixWeights]] — the DoReMi exponentiated-
  * gradient step. The declared q260 runs it on the synthetic corpus's
  * statistically-identical sources (near-uniform weights, honest for
  * that data); THIS spec feeds fabricated per-domain losses to pin the
  * mechanism's dynamic range: a 1-bit excess doubles the weight, the
  * exponent cap bounds a degenerate spread, smoothing mixes toward
  * uniform, and the ppm masses always form a near-partition of 1e6. */
class DomainMixSpec extends SparkSpec {
  import spark.implicits._

  test("one bit of excess loss doubles the weight (2^(eta*excess) exactly)") {
    val losses = Seq(
      ("a", 100L, 200000L),            // the min -> excess 0 -> raw 2^0
      ("b", 100L, 200000L + 65536L),   // +1 bit -> raw 2^1
      ("c", 100L, 200000L + 131072L)   // +2 bits -> raw 2^2
    ).toDF("domain", "mass", "loss_fp")
    val out = Corpus.domainMixWeights(losses, etaNum = 1, etaDen = 1,
        smoothPpm = 0)
      .select($"domain", $"excess_fp", $"weight_ppm")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0L, 65536L, 131072L))
    // weights 1:2:4 -> ppm floor(1e6 * {1,2,4} / 7)
    assert(out.map(_._3).toSeq == Seq(142857L, 285714L, 571428L))
  }

  test("eta scales the step; the exponent cap bounds a degenerate spread") {
    val losses = Seq(
      ("a", 1L, 0L),
      ("b", 1L, 30L * 65536)  // 30 bits of excess
    ).toDF("domain", "mass", "loss_fp")
    // eta = 1/2 -> 15 bits: ratio 2^15
    val half = Corpus.domainMixWeights(losses, etaNum = 1, etaDen = 2,
        smoothPpm = 0)
      .select($"domain", $"weight_ppm").as[(String, Long)].collect().toMap
    assert(half("b") / math.max(half("a"), 1L) >= 30000,
      s"eta=1/2 should give ~2^15 ratio: $half")
    // eta = 1 -> raw excess 30 bits exceeds the 20-bit cap -> 2^20 ratio
    val capped = Corpus.domainMixWeights(losses, etaNum = 1, etaDen = 1,
        smoothPpm = 0)
      .select($"domain", $"weight_ppm").as[(String, Long)].collect().toMap
    assert(capped("a") >= 0L) // the starved side is floored, not negative
    assert(capped("b") <= 1000000L && capped("b") >= 999998L,
      s"capped ratio is 2^20 -> b holds ~all mass: $capped")
  }

  test("smoothing mixes toward uniform: c ppm of mass is redistributed") {
    val losses = Seq(("a", 1L, 0L), ("b", 1L, 10L * 65536))
      .toDF("domain", "mass", "loss_fp")
    val out = Corpus.domainMixWeights(losses, smoothPpm = 100000L)
      .select($"domain", $"weight_ppm", $"smoothed_ppm")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (_, w, s) =>
      assert(s == (900000L * w) / 1000000L + 50000L, s"w=$w s=$s")
    }
    // starved domain keeps at least the uniform floor share
    assert(out.head._3 >= 50000L)
  }

  test("weights are a near-partition of 1e6 (floor shortfall < 3n)") {
    // three floor stages each lose at most ~n ppm across n domains: the
    // weight_ppm normalization (< n), the (1-c) rescale (< n), and the
    // smoothPpm div n truncation (< n) — so the true mechanism bound is
    // 3n, not the per-stage n
    val losses = (0 until 7)
      .map(i => (s"d$i", 10L, i * 17000L)).toDF("domain", "mass", "loss_fp")
    val w = Corpus.domainMixWeights(losses, smoothPpm = 1000L)
      .select($"smoothed_ppm").as[Long].collect()
    assert(w.sum <= 1000000L && w.sum > 1000000L - 3 * 7,
      s"sum=${w.sum}")
  }

  test("doremiLoop: thinning the easy domain compresses the spread round-over-round") {
    // domain-skewed fixture: "easy" docs share one sentence (the LM
    // learns its bigrams from the training fold -> low held-out loss);
    // "hard" docs are all-unique tokens (held-out bigrams unseen at any
    // mixture -> high loss). Round 1 must upweight hard; the resample
    // then thins easy's share of the training mix, easy's held-out loss
    // rises, and the round-2 spread COMPRESSES — the paper's
    // equilibrating dynamic, pinned here end-to-end.
    val easyText = "the cat sat on the mat and the dog sat on the rug"
    val docs = ((0L until 60L).map(i => (i, easyText, "easy")) ++
      (60L until 120L).map(i =>
        (i, s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e", "hard")))
      .toDF("doc_id", "text", "source")
    val out = Corpus.doremiLoop(docs, rounds = 2, seed = 18)
      .select($"round", $"domain", $"smoothed_ppm")
      .as[(Int, String, Long)].collect()
    val r1 = out.filter(_._1 == 1).map(r => r._2 -> r._3).toMap
    val r2 = out.filter(_._1 == 2).map(r => r._2 -> r._3).toMap
    assert(r1.keySet == Set("easy", "hard") && r2.keySet == Set("easy", "hard"))
    // round 1: unseen-bigram loss dominates -> hard holds most mass
    assert(r1("hard") > r1("easy"), s"r1=$r1")
    // round 2: the spread compresses, strictly
    assert(r2("hard") - r2("easy") < r1("hard") - r1("easy"),
      s"r1=$r1 r2=$r2")
    // each round's smoothed weights near-partition 1e6 (3n floor bound)
    Seq(r1, r2).foreach(m =>
      assert(m.values.sum <= 1000000L && m.values.sum > 1000000L - 6, s"$m"))
  }

  test("domainMixFromSurprisal drops domains with no held-out bigram mass") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      // a synthetic extra domain whose only doc is held-out but has a
      // single token (zero bigrams): it carries no price signal
      .unionByName(Seq((100000L, "onlyword", "ghost"))
        .toDF("doc_id", "text", "source"), allowMissingColumns = true)
    val out = Corpus.domainMixFromSurprisal(docs)
      .select($"domain").as[String].collect()
    assert(!out.contains("ghost"), s"domains: ${out.toSeq}")
    assert(out.nonEmpty)
  }
}
