package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** The incremental-dedup contract: processing a delta against the persisted
  * band/set index finds exactly the pairs a full recompute over the whole
  * corpus finds, restricted to pairs touching the delta — at delta cost.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("sf0.01"), "documents")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet

  test("incremental == full recompute restricted to delta-touching pairs") {
    val base = docs.filter($"doc_id" < 400)
    val delta = docs.filter($"doc_id" >= 400)
    val deltaIds = delta.select($"doc_id").as[Long].collect().toSet

    Dedup.writeNearDupIndex(base, "doc_id", "text", "inc_idx", nBuckets = 4)
    try {
      val incr = pairSet(Dedup.incrementalNearDupPairs(
        delta, "doc_id", "text", "inc_idx", minJaccard = 0.2))

      val full = pairSet(Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.2))
        .filter { case (a, b, _) => deltaIds(a) || deltaIds(b) }

      assert(incr == full, s"incr=${incr.size} full=${full.size}\n" +
        s"only-incr=${incr -- full}\nonly-full=${full -- incr}")
      assert(incr.nonEmpty, "threshold too high for the fixture — test is vacuous")
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_idx_bands")
      spark.sql("DROP TABLE IF EXISTS inc_idx_sets")
    }
  }

  test("append keeps the index equivalent to a fresh full build") {
    val a = docs.filter($"doc_id" < 300)
    val b = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
    val c = docs.filter($"doc_id" >= 400)
    val cIds = c.select($"doc_id").as[Long].collect().toSet

    Dedup.writeNearDupIndex(a, "doc_id", "text", "inc_idx2", nBuckets = 4)
    try {
      // fold increment b into the index, then process increment c
      Dedup.appendToNearDupIndex(b, "doc_id", "text", "inc_idx2")
      val incr = pairSet(Dedup.incrementalNearDupPairs(
        c, "doc_id", "text", "inc_idx2", minJaccard = 0.2))

      val full = pairSet(Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.2))
        .filter { case (x, y, _) => cIds(x) || cIds(y) }
      assert(incr == full)
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_idx2_bands")
      spark.sql("DROP TABLE IF EXISTS inc_idx2_sets")
    }
  }

  test("the stored-side band join reads the bucketed table without an exchange") {
    Dedup.writeNearDupIndex(docs.filter($"doc_id" < 400), "doc_id", "text",
      "inc_idx3", nBuckets = 4)
    try {
      val df = Dedup.incrementalNearDupPairs(
        docs.filter($"doc_id" >= 400), "doc_id", "text", "inc_idx3")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the bands scan must come from the bucketed table files
      assert(plan.contains("inc_idx3_bands"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_idx3_bands")
      spark.sql("DROP TABLE IF EXISTS inc_idx3_sets")
    }
  }
}
