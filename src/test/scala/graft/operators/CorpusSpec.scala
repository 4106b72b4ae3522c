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
}
