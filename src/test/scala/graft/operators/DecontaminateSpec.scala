package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.functions.TextFunctions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("sf0.01"), "documents")
  private lazy val train = docs.filter($"doc_id" % 5 =!= 0)
  private lazy val test_ = docs.filter($"doc_id" % 5 === 0)

  private def exactContaminated() = {
    def hs(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", tokens($"text").as("tok"))
      .select($"doc_id", explode(shingles($"tok", 4)).as("sh"))
      .select($"doc_id", hash32($"sh", 0).as("h")).distinct()
    hs(train).join(hs(test_).select($"h").distinct(), Seq("h"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
  }

  test("bloom-accelerated contamination equals the exact join") {
    val got = Decontaminate.contaminated(train, test_, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val exp = exactContaminated().as[(Long, Long)].collect().toMap
    assert(got == exp, s"bloom result must be exact (no FNs, FPs verified away)")
    assert(exp.nonEmpty, "fixture should contain contamination")
  }

  test("clean() removes exactly the contaminated train docs") {
    val cleaned = Decontaminate.clean(train, test_, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    val contaminatedIds = exactContaminated().as[(Long, Long)].collect().map(_._1).toSet
    val all = train.select($"doc_id").as[Long].collect().toSet
    assert(cleaned == all -- contaminatedIds)
  }

  test("exciseContaminatedSpans strict: every colliding span removed; reconciles with the report") {
    val tr = Seq(
      (10L, "m n o p q r"),        // "m n o p" collides with the eval doc
      (11L, "f g h i j k"),        // clean
      (12L, "a m n o p b"),        // second holder of the same collision
    ).toDF("doc_id", "text")
    val te = Seq((20L, "z z m n o p z")).toDF("doc_id", "text")
    val out = Decontaminate.exciseContaminatedSpans(tr, te, "doc_id", "text", n = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // strict: BOTH holders lose the span — any surviving copy still leaks
    assert(out == Seq(
      (10L, 6L, 2L, "q r"),
      (11L, 6L, 6L, "f g h i j k"),
      (12L, 6L, 2L, "a b")))
    // n_tokens - n_kept reconciles row for row with the report's mass
    val rep = Decontaminate.spanContamination(tr, te, "doc_id", "text", n = 3)
      .select($"doc_id", $"contam_tokens").as[(Long, Long)].collect().toMap
    out.foreach { case (id, nt, nk, _) => assert(nt - nk == rep(id)) }
  }

  test("exciseContaminatedSpans keepOne: lowest-id training holder keeps the span") {
    val tr = Seq(
      (10L, "m n o p q r"),
      (11L, "f g h i j k"),
      (12L, "a m n o p b"),
    ).toDF("doc_id", "text")
    val te = Seq((20L, "z z m n o p z")).toDF("doc_id", "text")
    val out = Decontaminate.exciseContaminatedSpans(tr, te, "doc_id", "text",
        n = 3, keepOne = true)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 10 is the min-id holder of both colliding grams -> intact;
    // doc 12 owns neither -> excised exactly as in strict mode
    assert(out == Seq(
      (10L, 6L, 6L, "m n o p q r"),
      (11L, 6L, 6L, "f g h i j k"),
      (12L, 6L, 2L, "a b")))
    // determinism: owner election is a min over unique ids
    val rerun = Decontaminate.exciseContaminatedSpans(tr, te, "doc_id", "text",
        n = 3, keepOne = true).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rerun == out)
  }

  test("spanContamination reports the exact overlapping span, zero rows for clean docs") {
    val tr = Seq(
      (10L, "m n o p q r"),        // "m n o p" overlaps the eval doc
      (11L, "f g h i j k"),        // clean
    ).toDF("doc_id", "text")
    val te = Seq((20L, "z z m n o p z")).toDF("doc_id", "text")
    val out = Decontaminate.spanContamination(tr, te, "doc_id", "text", n = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // hits: "m n o"@0, "n o p"@1 -> one island, union len 1-0+3 = 4 tokens
    assert(out == Seq(
      (10L, 6L, 1L, 4L, 666666L),
      (11L, 6L, 0L, 0L, 0L)))
  }
}
