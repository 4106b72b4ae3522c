package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, sources}
import graft.sources.Tables

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("binPercentiles within binWidth of exact percentiles, never above") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val approx = Histogram.binPercentiles(docs, "lang", "n_chars",
        binWidth = 50.0, ppms = Seq(250000, 500000, 900000))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // exact rank-based percentile (type-1: value at 1-based rank
    // ceil(n*p)) — the definition binPercentiles bins; Spark's
    // `percentile` interpolates (type-7), a different statistic whose
    // distance from the binned one is an order-stat gap, not binWidth
    val vals = docs.select($"lang", $"n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (l, vs) => l -> vs.map(_._2).sorted }
    def typeOne(vs: Array[Long], ppm: Long): Long =
      vs(((vs.length * ppm + 999999L) / 1000000L).toInt - 1)
    assert(approx.keySet == vals.keySet && approx.nonEmpty)
    approx.foreach { case (lang, (a25, a50, a90)) =>
      Seq((a25, 250000L), (a50, 500000L), (a90, 900000L)).foreach { case (a, p) =>
        val e = typeOne(vals(lang), p).toDouble
        // a is the lower edge of e's bin: within (e - binWidth, e]
        assert(a > e - 50.0 && a <= e, s"$lang ppm=$p: bin-edge $a vs exact $e")
      }
    }
  }

  test("tvDrift: identical distributions score 0, disjoint score ~1e6") {
    val same = (1 to 100).flatMap(i =>
      Seq(("g", (i % 10).toDouble, true), ("g", (i % 10).toDouble, false)))
      .toDF("k", "v", "p")
    val s0 = Histogram.tvDrift(same, "k", "v", $"p", binWidth = 1.0)
      .select($"tvd_ppm").as[Long].head()
    assert(s0 == 0L)
    val disjoint = ((1 to 50).map(i => ("g", (i % 5).toDouble, true)) ++
      (1 to 50).map(i => ("g", 100.0 + (i % 5), false)))
      .toDF("k", "v", "p")
    val s1 = Histogram.tvDrift(disjoint, "k", "v", $"p", binWidth = 1.0)
      .select($"tvd_ppm").as[Long].head()
    assert(s1 >= 999000L && s1 <= 1000000L, s"tvd $s1")
    // a group with an empty side is dropped, not scored
    val oneSided = (1 to 10).map(i => ("h", i.toDouble, true)).toDF("k", "v", "p")
    assert(Histogram.tvDrift(oneSided, "k", "v", $"p", 1.0).count() == 0L)
  }

  test("binPercentiles p=1e6 picks the max bin; tiny groups stay exact") {
    val df = Seq(("g", 3.0), ("g", 7.0), ("g", 11.0)).toDF("k", "v")
    val out = Histogram.binPercentiles(df, "k", "v", binWidth = 1.0,
        ppms = Seq(1, 500000, 1000000))
      .as[(String, Double, Double, Double)].head()
    // bins are the values themselves at width 1: min=3, median=7, max=11
    assert(out == (("g", 3.0, 7.0, 11.0)))
  }

  test("grid2d: known cells, overflow clamps to max bin, shares sum to ~1e6") {
    val df = Seq(
      (0L, 100L), (0L, 150L),   // cell (0,1) x2
      (550L, 100L),             // cell (1,1)
      (99999L, 99999L)          // clamps to (19, 9) with width 500/100
    ).toDF("x", "y")
    val out = Histogram.grid2d(df, "x", 500L, 19, "y", 100L, 9)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 1L, 2L, 500000L), (1L, 1L, 1L, 250000L), (19L, 9L, 1L, 250000L)))
    // shares sum to 1e6 up to div truncation
    assert(out.toSeq.map(_._4).sum <= 1000000L &&
      out.toSeq.map(_._4).sum > 1000000L - out.size)
  }

  test("grid2d grids merge by cell-wise addition across shards") {
    val a = Seq((0L, 0L), (600L, 0L)).toDF("x", "y")
    val b = Seq((0L, 0L), (0L, 150L)).toDF("x", "y")
    val merged = Histogram.grid2d(a.union(b), "x", 500L, 19, "y", 100L, 9)
      .select($"xb", $"yb", $"n").as[(Long, Long, Long)].collect().toSet
    val sharded = (Histogram.grid2d(a, "x", 500L, 19, "y", 100L, 9) union
        Histogram.grid2d(b, "x", 500L, 19, "y", 100L, 9))
      .groupBy($"xb", $"yb").agg(org.apache.spark.sql.functions.sum($"n").as("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == sharded)
  }

  test("rfmSegments: aligned quintiles on a 5-customer fixture") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(d.toLong))
    // customer c: c orders of value 100·c, last order on day c
    //   -> recency, frequency and monetary ranks all align: scores (c,c,c)
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong, day(if (i == c) c else 0), 100.0 * c))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Histogram.rfmSegments(orders, "o_custkey", "o_orderdate",
        "o_totalprice")
      .orderBy($"r_score")
      .select($"r_score", $"f_score", $"m_score", $"n_customers",
        $"total_cents")
      .as[(Int, Int, Int, Long, Long)].collect().toSeq
    assert(out == (1 to 5).map(c =>
      (c, c, c, 1L, c.toLong * c * 100 * 100)))
  }
}
