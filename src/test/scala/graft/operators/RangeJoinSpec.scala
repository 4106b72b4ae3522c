package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // anchors at t=100, 1000; probes straddling band edges and the ±50 boundary
  private def fixture = (
    Seq((1L, 10L, 100L), (1L, 11L, 1000L), (2L, 20L, 100L))
      .toDF("k", "lid", "lt"),
    Seq(
      (1L, 90L, 50L),   // Δ=50 from lid 10: exactly on the boundary -> included
      (1L, 91L, 151L),  // Δ=51 -> excluded
      (1L, 92L, 99L),   // Δ=1, band below (99 div 50 = 1 vs 100 div 50 = 2)
      (1L, 93L, 1049L), // Δ=49 from lid 11
      (2L, 94L, 140L),  // Δ=40 but key 2 -> matches lid 20 only
      (3L, 95L, 100L))  // key with no anchors
      .toDF("k", "rid", "rt"))

  test("intervalJoinPairs: exact pair set, boundary inclusive, once each") {
    val (l, r) = fixture
    val pairs = RangeJoin.intervalJoinPairs(l, r, Seq("k"), "lt", "rt", window = 50L)
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    assert(pairs == Seq((10L, 90L), (10L, 92L), (11L, 93L), (20L, 94L)))
  }

  test("countWithin keeps zero-match anchors and never double-counts") {
    val (l, r) = fixture
    val extra = l.union(Seq((9L, 99L, 777L)).toDF("k", "lid", "lt")) // no probes at all
    val counts = RangeJoin.countWithin(extra, r, Seq("k"), "lt", "rt",
        window = 50L, rightKey = "rid", as = "n")
      .select($"lid", $"n").as[(Long, Long)].collect().toMap
    assert(counts == Map(10L -> 2L, 11L -> 1L, 20L -> 1L, 99L -> 0L))
  }

  test("banded plan is an equi-join, not a nested loop") {
    val (l, r) = fixture
    val df = RangeJoin.intervalJoinPairs(l, r, Seq("k"), "lt", "rt", window = 50L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
