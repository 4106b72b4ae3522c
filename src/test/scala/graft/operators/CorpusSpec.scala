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
}
