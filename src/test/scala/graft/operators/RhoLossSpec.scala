package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Contract of [[Corpus.rhoLossScores]] — RHO-LOSS reducible-holdout-loss
  * selection. The q261 oracle hash-gates the full fixed-point chain; this
  * spec pins the structural invariants the gate can't express by itself. */
class RhoLossSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("sf0.01"), "documents")
  private lazy val out = Corpus.rhoLossScores(docs)
    .select($"doc_id", $"n_bigrams", $"train_bits_fp", $"holdout_bits_fp",
      $"rho_fp", $"is_selected")
    .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq

  test("covers the candidate pool exactly once; rho is the chain difference") {
    val poolIds = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == poolIds && out.size == poolIds.size)
    out.foreach { case (id, _, tr, ho, rho, sel) =>
      assert(rho == tr - ho, s"doc $id")
      assert(sel == (rho > 0), s"doc $id")
    }
    // the fixture must exercise both verdicts, and the iid shape holds:
    // the 3x-larger training model wins on MOST docs (sparse selection)
    val nSel = out.count(_._6)
    assert(nSel > 0 && nSel < out.size / 2,
      s"selection should be a sparse positive tail: $nSel/${out.size}")
  }

  test("each side equals its own lmSurprisal run (no cross-chain leakage)") {
    val pool = docs.filter($"doc_id" % 5 === 0)
    val tr = TextAnalysis.lmSurprisal(pool,
        docs.filter($"doc_id" % 5 >= 2), "doc_id", "text")
      .select($"doc_id", $"bits_fp").as[(Long, Long)].collect().toMap
    val ho = TextAnalysis.lmSurprisal(pool,
        docs.filter($"doc_id" % 5 === 1), "doc_id", "text")
      .select($"doc_id", $"bits_fp").as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, t, h, _, _) =>
      assert(t == tr(id) && h == ho(id), s"doc $id")
    }
  }

  test("zero-bigram docs carry zero bits on both sides and are never selected") {
    val withGhost = docs.unionByName(
      Seq((100000L, "one", "ghost")).toDF("doc_id", "text", "source"),
      allowMissingColumns = true)
    val row = Corpus.rhoLossScores(withGhost)
      .filter($"doc_id" === 100000L)
      .select($"n_bigrams", $"train_bits_fp", $"holdout_bits_fp", $"is_selected")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(row.toSeq == Seq((0L, 0L, 0L, false)))
  }
}
