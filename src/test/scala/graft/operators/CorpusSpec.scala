package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("prepare drops exact dups, near-dups, and low quality; splits deterministically") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val out = Corpus.prepare(docs).cache()
    val kept = out.select($"doc_id").as[Long].collect().toSet

    // near-dup pairs: at most one side survives
    Dedup.nearDupPairs(docs, "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(!(kept(a) && kept(b)), s"near-dup pair ($a,$b) both kept") }

    // quality floor holds
    assert(out.filter($"quality" < 0.65).count() == 0)

    // split is deterministic and roughly 80/20
    val out2 = Corpus.prepare(docs)
    assert(out.select($"doc_id", $"split").exceptAll(
      out2.select($"doc_id", $"split")).count() == 0)
    val frac = out.filter($"split" === "train").count().toDouble / out.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("tokenBudgetMix: budget respected, best-first whole bins, never over") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val budgets = Corpus.proportionalBudgets(docs, pct = 40)
    val mix = Corpus.tokenBudgetMix(docs, budgets).cache()
    val perSource = mix.groupBy($"source")
      .agg(sum($"n_tokens").as("taken"), min($"quality_ppm").as("worst_kept"))
      .join(budgets, Seq("source"))
      .collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      val taken = r.getAs[Long]("taken"); val budget = r.getAs[Long]("token_budget")
      assert(taken <= budget, s"${r.getAs[String]("source")}: $taken > $budget")
    }
    // best-first: every kept doc's quality bin >= the worst kept bin of
    // its source, and every unkept doc with a STRICTLY better bin than the
    // worst kept one would overflow — i.e. no unkept doc sits in a bin
    // above the source's worst kept bin
    val scored = Corpus.tokenBudgetMix(docs,
      budgets.withColumn("token_budget", lit(Long.MaxValue))) // all docs, scored
    val worst = mix.groupBy($"source").agg(min($"quality_ppm").as("worst_kept"))
    val skippedAbove = scored.join(mix.select($"doc_id"), Seq("doc_id"), "left_anti")
      .join(worst, Seq("source"))
      .filter($"quality_ppm" > $"worst_kept")
    assert(skippedAbove.count() == 0, "a skipped doc outranked a kept one")
    // whole bins: a bin is either fully in or fully out
    val binSizes = scored.groupBy($"source", $"quality_ppm").count()
      .withColumnRenamed("count", "n_all")
    val keptSizes = mix.groupBy($"source", $"quality_ppm").count()
      .withColumnRenamed("count", "n_kept")
    val partial = binSizes.join(keptSizes, Seq("source", "quality_ppm"))
      .filter($"n_kept" =!= $"n_all")
    assert(partial.count() == 0, "partial bin detected")
  }

  test("curate: exact/near losers and contained snippets dropped, mutual containment keeps the lower id") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "s1"),
      (1L, "  The  QUICK brown fox jumps over the lazy dog today ", "s1"), // exact dup of 0
      (3L, "alpha beta gamma delta epsilon zeta", "s2"),    // snippet …
      (4L, s"$filler alpha beta gamma delta epsilon zeta", "s2"), // … inside this doc
      (5L, "completely different content about something else entirely", "s2"),
      (6L, "p q r p q r", "s3"),        // same shingle SET as 7 (mutual containment)
      (7L, "p q r p q r p q r", "s3")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Corpus.curate(docs, minNormPpm = 0L)
      .select($"doc_id", $"comp", $"weight_ppm", $"split")
      .as[(Long, Long, Long, String)].collect()
    val kept = out.map(_._1).toSet
    assert(!kept.contains(1L), "exact dup loser must drop")
    assert(!kept.contains(3L), "contained snippet must drop")
    assert(!kept.contains(7L), "mutual containment keeps the LOWER id")
    assert(kept.contains(0L) && kept.contains(4L) &&
      kept.contains(5L) && kept.contains(6L), kept)
    // weights agree with the standalone dedupWeights on every kept doc
    val w = Dedup.dedupWeights(docs, "doc_id", "text")
      .select($"doc_id", $"comp", $"weight_ppm")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (id, comp, wppm, _) =>
      assert(w(id) == ((comp, wppm)), s"doc $id")
    }
    // split is the component-keyed hash rule
    import graft.functions.TextFunctions.hash32
    val expect = docs.select($"doc_id",
        when(hash32($"doc_id".cast("string"), 9) % 100 < 80, "train")
          .otherwise("test").as("sp"))
      .as[(Long, String)].collect().toMap
    out.filter(r => r._1 == r._2) // singleton comps: comp == own id
      .foreach { case (id, _, _, sp) => assert(sp == expect(id), s"doc $id") }
  }

  test("sourceDrift: skewed source shows higher KL than a corpus-typical one") {
    // sources a and b share the corpus-wide mix; source c is skewed
    val docs = Seq(
      ("a", "alpha beta gamma delta alpha beta"),
      ("a", "alpha beta gamma delta"),
      ("b", "alpha beta gamma delta alpha beta"),
      ("b", "alpha beta gamma delta"),
      ("c", "zed zed zed zed zed zed zed zed zed zed"),
    ).toDF("source", "text")
    val out = Corpus.sourceDrift(docs)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // KL is non-negative up to the ~1-fp-unit log quantization
    assert(out.values.forall(_._4 >= -2L), s"negative KL: $out")
    // the skewed source diverges hard (its token is rare corpus-wide);
    // the typical sources sit near zero
    assert(out("c")._4 > out("a")._4 + 65536 / 2, s"KL: $out")
    assert(out("a")._4 == out("b")._4, "identical sources, identical KL")
    assert(out("c")._2 == 10L && out("c")._3 == 1L)
  }

  test("dsirScores: target-domain-like docs score and select above off-domain ones") {
    val target = Seq(
      (100L, "quantum physics entangles qubits across superposed states"),
      (101L, "quantum field theory predicts particle interactions precisely"),
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "quantum physics explains entangled qubits and superposed states"),
      (2L, "the football game ended with a late touchdown drive"),
      (3L, "quantum field interactions follow the theory of particles"),
      (4L, "basketball players traded the ball before the buzzer"),
      (5L, "qubits hold superposed quantum states until measured"),
      (6L, "the referee paused the football match for a review"),
    ).toDF("doc_id", "text")
    val out = Corpus.dsirScores(raw, target, nBuckets = 1024, selectPct = 50)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val mean = out.map(r => r._1 -> r._4).toMap
    val quantum = Seq(1L, 3L, 5L)
    val sports = Seq(2L, 4L, 6L)
    // every in-domain doc outranks every off-domain doc on the
    // log-likelihood-ratio mean (the paper's separation property)
    for (q <- quantum; s <- sports)
      assert(mean(q) > mean(s), s"doc $q (${mean(q)}) !> doc $s (${mean(s)})")
    // whole-bin top-50%: only in-domain docs make the cut
    val selected = out.filter(_._5).map(_._1).toSet
    assert(selected.nonEmpty && selected.subsetOf(quantum.toSet), s"selected: $selected")
    // deterministic across reruns
    val rerun = Corpus.dsirScores(raw, target, nBuckets = 1024, selectPct = 50)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rerun.toSeq == out.toSeq)
  }

  // ---- The ppb-ceiling lift (round-9): the rate math must stay EXACT
  // past 10⁹ totals — the 100 TB scale these operators target, where
  // round 8 failed loudly. Fabricated count tables, no giant fixture.

  test("dsirWeights: exact past the ppb ceiling (totals > 1e9), verbatim within it") {
    import graft.functions.FixedPoint.{log2FpRef, log2FpRefWide}
    val nB = 16
    // totals: tt = 12e9 (past ppb), tr = 3e13 (the 100 TB shape)
    val tCnt = Seq((0L, 2000000000L), (1L, 9999999983L), (2L, 1L))
      .toDF("b", "ct")
    val rCnt = Seq((0L, 5L), (1L, 29999999999994L), (3L, 1L))
      .toDF("b", "cr")
    val tt = 2000000000L + 9999999983L + 1L
    val tr = 5L + 29999999999994L + 1L
    def expect(ct: Long, cr: Long): Long =
      (log2FpRefWide(ct + 1) - log2FpRefWide(tt + nB)) -
        (log2FpRefWide(cr + 1) - log2FpRefWide(tr + nB))
    val w = Corpus.dsirWeights(tCnt, rCnt, nB)
      .as[(Long, Long)].collect().toMap
    assert(w(0L) == expect(2000000000L, 5L))
    assert(w(1L) == expect(9999999983L, 29999999999994L))
    assert(w(2L) == expect(1L, 0L)) // full-outer: missing raw side
    assert(w(3L) == expect(0L, 1L)) // full-outer: missing target side
    // in-domain bucket (huge target rate, tiny raw) weighs positive,
    // off-domain negative — the separation the selection runs on
    assert(w(0L) > 0 && w(1L) < 0)

    // within ppb: bit-identical to the round-8 quotient arithmetic
    val tS = Seq((0L, 900L), (1L, 50L)).toDF("b", "ct")
    val rS = Seq((0L, 10L), (1L, 4000L)).toDF("b", "cr")
    val (ttS, trS) = (950L, 4010L)
    def expectSmall(ct: Long, cr: Long): Long =
      log2FpRef(((ct + 1) * 1000000000L) / (ttS + nB)) -
        log2FpRef(((cr + 1) * 1000000000L) / (trS + nB))
    val wS = Corpus.dsirWeights(tS, rS, nB).as[(Long, Long)].collect().toMap
    assert(wS(0L) == expectSmall(900L, 10L))
    assert(wS(1L) == expectSmall(50L, 4000L))
  }

  test("sourceDriftTerms: exact KL past the ppb ceiling via the decimal wide leg") {
    import graft.functions.FixedPoint.log2FpRefWide
    // one source holding most of a 1.2e10-token corpus, one tiny skewed
    // source — tg > 1e9 forces the wide branch end-to-end
    val tg = 12000000000L
    val rows = Seq(
      // (source, c, cg, ts, tg): common word + rare word per source
      ("big", 7000000000L, 7000000100L, 11999999000L, tg),
      ("big", 4999999000L, 4999999800L, 11999999000L, tg),
      ("tiny", 100L, 7000000100L, 1000L, tg),
      ("tiny", 900L, 900L, 1000L, tg),
    ).toDF("source", "c", "cg", "ts", "tg")
    def term(c: Long, cg: Long, ts: Long): BigInt =
      BigInt(c) * ((log2FpRefWide(c) - log2FpRefWide(ts)) -
        (log2FpRefWide(cg) - log2FpRefWide(tg)))
    val expBig = (term(7000000000L, 7000000100L, 11999999000L) +
      term(4999999000L, 4999999800L, 11999999000L)) / BigInt(11999999000L)
    val expTiny = (term(100L, 7000000100L, 1000L) +
      term(900L, 900L, 1000L)) / BigInt(1000L)
    val out = Corpus.sourceDriftTerms(rows)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("big")._4 == expBig.toLong, s"big: ${out("big")._4} vs $expBig")
    assert(out("tiny")._4 == expTiny.toLong, s"tiny: ${out("tiny")._4} vs $expTiny")
    assert(out("big")._2 == 11999999000L && out("big")._3 == 2L)
    // the skewed tiny source diverges far more than the corpus-dominant one
    assert(out("tiny")._4 > out("big")._4)
  }

  test("qualityPerceptron: separable classes classify correctly, margins integer-exact") {
    // two disjoint vocabularies -> linearly separable by construction;
    // the batch perceptron must fit the training set
    val target = Seq(
      (0L, "alpha beta gamma alpha beta"),
      (7L, "beta gamma alpha gamma"),
      (14L, "gamma alpha beta alpha"),
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "delta epsilon zeta delta"),
      (2L, "epsilon zeta delta zeta"),
      (3L, "zeta delta epsilon epsilon"),
    ).toDF("doc_id", "text")
    val out = Corpus.qualityPerceptron(raw, target, nBuckets = 64, seed = 11,
        steps = 4)
      .orderBy($"doc_id")
      .as[(Long, Int, Long, Long, Boolean)].collect().toSeq
    assert(out.length == 6)
    out.foreach { case (id, y, nf, score, pred) =>
      assert(nf > 0)
      assert(pred == (score > 0))
      // separable fixture: every training doc ends on its own side
      assert((y == 1) == pred, s"doc $id: y=$y score=$score")
    }
    // pure-integer training: rerun is bit-identical
    val rerun = Corpus.qualityPerceptron(raw, target, nBuckets = 64, seed = 11,
        steps = 4).orderBy($"doc_id")
      .as[(Long, Int, Long, Long, Boolean)].collect().toSeq
    assert(rerun == out)
  }

  test("qualityPerceptron: step-1 weights are the class-mass difference per bucket") {
    // with w0 = 0 every doc is a mistake, so after ONE step
    // w(b) = sum_target c(b) - sum_raw c(b); a doc's score under those
    // weights is checkable by hand on a tiny vocabulary
    val target = Seq((0L, "a a")).toDF("doc_id", "text")
    val raw = Seq((1L, "b")).toDF("doc_id", "text")
    // features: unigrams + bigrams -> target: a(2), "a a"(1); raw: b(1)
    // step-1 w: w[a]=+2, w["a a"]=+1, w[b]=-1 (distinct buckets at 64)
    val out = Corpus.qualityPerceptron(raw, target, nBuckets = 64, seed = 11,
        steps = 1).orderBy($"doc_id")
      .as[(Long, Int, Long, Long, Boolean)].collect().toSeq
    // doc 0 score = 2*2 + 1*1 = 5; doc 1 score = 1*(-1) = -1
    assert(out == Seq((0L, 1, 3L, 5L, true), (1L, -1, 1L, -1L, false)))
  }
}
