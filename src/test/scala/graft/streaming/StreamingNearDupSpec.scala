package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Dedup

/** Streaming MinHash near-dup: batch ≡ stream pair sets, exactly-once
  * cross-band emission, cross-trigger pairing, watermark-horizon
  * eviction. */
case class DocIn(doc_id: Long, ts: Timestamp, text: String)

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val HOUR_US = 3600L * 1000000L
  // h+1: Spark's injected late-row filter drops rows at exactly the
  // initial watermark (epoch 0), a degenerate edge only a synthetic
  // fixture can hit — keep event times strictly positive
  private def at(h: Long) = new Timestamp((h + 1) * 3600L * 1000L)

  // three near-dup families + singletons; shared phrasing inside a family
  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val fam2 =
    "large language models learn statistical patterns from very large text corpora"
  private def docs(h: Long => Long): Seq[DocIn] = Seq(
    DocIn(1, at(h(0)), base),
    DocIn(2, at(h(1)), base + " indeed"),
    DocIn(3, at(h(2)), "completely unrelated content about cooking pasta al dente with garlic"),
    DocIn(4, at(h(3)), fam2),
    DocIn(5, at(h(4)), fam2 + " and more"),
    DocIn(6, at(h(5)), base.replace("lazy", "sleepy")))

  private def runStream(batches: Seq[Seq[DocIn]], delay: String = "100 hours")
      : Set[(Long, Long, Double)] = {
    val mem = MemoryStream[DocIn](spark)
    val q = StreamingNearDup.pairs(mem.toDF(), "ts", "doc_id", "text",
        watermarkDelay = delay, minJaccard = 0.3)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("nd").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val out = spark.table("nd")
      .select($"id_a", $"id_b", round($"jaccard", 6))
      .as[(Long, Long, Double)].collect().toSet
    spark.sql("DROP VIEW IF EXISTS nd")
    out
  }

  private def batchPairs(ds: Seq[DocIn]): Set[(Long, Long, Double)] =
    Dedup.nearDupPairs(ds.toDF(), "doc_id", "text", minJaccard = 0.3)
      .select($"id_a", $"id_b", round($"jaccard", 6))
      .as[(Long, Long, Double)].collect().toSet

  test("stream ≡ batch: same pairs, same jaccard, each exactly once") {
    val d = docs(identity)
    val expected = batchPairs(d)
    assert(expected.nonEmpty, "fixture must contain near-dups")
    val got = runStream(Seq(d))
    assert(got == expected)
    // exactly-once even though near-identical docs collide in EVERY band:
    // re-run counting multiplicity
    val mem = MemoryStream[DocIn](spark)
    val q = StreamingNearDup.pairs(mem.toDF(), "ts", "doc_id", "text",
        watermarkDelay = "100 hours", minJaccard = 0.3)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("nd2").start()
    mem.addData(d: _*); q.processAllAvailable(); q.stop()
    val counts = spark.table("nd2").groupBy($"id_a", $"id_b").count()
      .select($"count").as[Long].collect()
    spark.sql("DROP VIEW IF EXISTS nd2")
    assert(counts.nonEmpty && counts.forall(_ == 1L))
  }

  test("pairs form across triggers via band state") {
    val d = docs(identity)
    val got = runStream(Seq(d.take(2), d.slice(2, 4), d.drop(4)))
    assert(got == batchPairs(d))
  }

  test("watermark horizon: a doc outside the lookback no longer pairs") {
    // doc 1 at h=1, its near-dup arrives at h=51; horizon is 10 hours and
    // the watermark has advanced past h=40 via doc 3/4/5 traffic
    val d = Seq(
      DocIn(1, at(0), base),
      DocIn(3, at(30), "completely unrelated content about cooking pasta al dente with garlic"),
      DocIn(4, at(45), fam2),
      DocIn(2, at(50), base + " indeed"),
      DocIn(5, at(51), fam2 + " and more"))
    val got = runStream(Seq(d.take(3), d.drop(3)), delay = "10 hours")
    assert(!got.exists(p => p._1 == 1L && p._2 == 2L),
      "evicted resident must not pair")
    assert(got.exists(p => p._1 == 4L && p._2 == 5L),
      "in-horizon pair must still emit")
  }

  test("signature mirror: Scala sigsOf == the Catalyst expression sigs") {
    val d = docs(identity).toDF()
    val sigs = Dedup.shingleSetSigs(d, "doc_id", "text", 8)
      .select($"doc_id", $"hs".cast("array<bigint>"),
        array((0 until 8).map(i => col(s"sig$i")): _*))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    sigs.foreach { case (_, hs, expected) =>
      assert(StreamingNearDup.sigsOf(hs, 8).toSeq == expected)
    }
  }
}
