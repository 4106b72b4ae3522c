package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

/** Gates the ScaleProbe synthesis invariants SCALE.md's ratios rest on:
  * k× replication must multiply row counts, PRESERVE join integrity
  * across the shifted key spaces, and scale the near-dup pair/component
  * structure exactly k× (disjoint replica shingle spaces). */
class ScaleProbeSpec extends SparkSpec {
  import spark.implicits._

  private val k = 2
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("scaleprobe_spec").toString
    ScaleProbe.synthesize(spark, sf("sf0.001"), d, k)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
  private def src(name: String) =
    spark.read.parquet(sf("sf0.001") + s"/$name.parquet")

  test("row counts scale k× for facts, stay fixed for region/nation") {
    Seq("customer", "orders", "lineitem", "events", "documents",
      "embeddings").foreach { n =>
      assert(t(n).count() === k * src(n).count(), n)
    }
    Seq("region", "nation").foreach(n => assert(t(n).count() === src(n).count(), n))
  }

  test("join integrity: every fact key resolves in its replica's dimension") {
    // orders ⋈ customer must match ALL orders (keys shifted consistently)
    val o = t("orders"); val c = t("customer")
    assert(o.join(c, o("o_custkey") === c("c_custkey")).count() === o.count())
    // lineitem ⋈ orders likewise
    val l = t("lineitem")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey")).count() === l.count())
    // and replicas are DISJOINT: no key space overlap
    assert(o.select(countDistinct(col("o_orderkey"))).head().getLong(0)
      === o.count())
  }

  test("near-dup structure scales exactly k× (disjoint replica shingle spaces)") {
    val basePairs = Dedup.nearDupPairs(src("documents"), "doc_id", "text").count()
    val scaledPairs = Dedup.nearDupPairs(t("documents"), "doc_id", "text").count()
    assert(scaledPairs === k * basePairs,
      s"pairs must scale exactly $k×: $basePairs -> $scaledPairs")
    // and no pair crosses replicas (both ids in the same 1e9 band)
    val cross = Dedup.nearDupPairs(t("documents"), "doc_id", "text")
      .filter(expr("id_a div 1000000000") =!= expr("id_b div 1000000000"))
      .count()
    assert(cross === 0L)
  }

  test("duplicated-span structure replicates exactly per replica (q242 family)") {
    // replica-disjoint gram spaces ⇒ every replica reproduces the 1×
    // span structure verbatim: the 2× output is two id-shifted copies
    val base = Dedup.repeatedSpans(src("documents"), "doc_id", "text")
      .select($"doc_id", $"n_dup_spans", $"dup_tokens")
      .as[(Long, Long, Long)].collect().toSet
    val scaled = Dedup.repeatedSpans(t("documents"), "doc_id", "text")
      .select($"doc_id", $"n_dup_spans", $"dup_tokens")
      .as[(Long, Long, Long)].collect().toSet
    val expected = (0 until k).flatMap(i =>
      base.map { case (id, s, d) => (id + i * 1000000000L, s, d) }).toSet
    assert(scaled === expected)
  }
}
