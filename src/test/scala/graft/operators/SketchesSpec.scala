package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.functions.TextFunctions._

/** The approximate-sketch scale path: when exact distributions (q36/q42)
  * or memberships (q53) are too expensive at 100 TB, Spark's mergeable
  * sketches bound the cost — HyperLogLog for cardinality, count-min for
  * frequency, Bloom for membership. Each is validated here against the
  * exact computation with its documented error bound, so swapping
  * exact → sketch in a pipeline is a measured decision, not a guess. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tok = Tables(spark, sf("sf0.01"), "documents")
    .select(explode(tokens($"text")).as("w")).cache()

  test("HyperLogLog cardinality is within the configured rsd of exact") {
    val exact = tok.select(countDistinct($"w")).as[Long].head()
    val approx = tok.select(approx_count_distinct($"w", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"exact=$exact approx=$approx")
  }

  test("count-min sketch overestimates by at most eps*N (never underestimates)") {
    val n = tok.count()
    val eps = 0.001
    val sketch = tok.stat.countMinSketch($"w", eps = eps, confidence = 0.99, seed = 42)
    val exact = tok.groupBy($"w").count().orderBy($"count".desc)
      .limit(20).as[(String, Long)].collect()
    exact.foreach { case (w, c) =>
      val est = sketch.estimateCount(w)
      assert(est >= c, s"CMS must never underestimate: $w exact=$c est=$est")
      assert(est <= c + (eps * n).toLong + 1, s"$w exact=$c est=$est over bound")
    }
  }

  test("approx_percentile tracks the exact percentile within its accuracy bound") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val exact = docs.select(expr("percentile(n_chars, 0.5)")).as[Double].head()
    val approx = docs.select(
      expr("approx_percentile(n_chars, 0.5, 1000)")).as[Long].head()
    // accuracy 1000 => rank error <= n/1000; translate to a loose value
    // tolerance via the exact quartiles
    val (q25, q75) = (
      docs.select(expr("percentile(n_chars, 0.25)")).as[Double].head(),
      docs.select(expr("percentile(n_chars, 0.75)")).as[Double].head())
    assert(approx >= q25 && approx <= q75,
      s"approx median $approx wildly off exact $exact")
    assert(math.abs(approx - exact) / exact < 0.1)
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val words = tok.distinct()
    val nw = words.count()
    val bf = words.stat.bloomFilter($"w", nw, 0.01)
    val present = words.as[String].collect()
    assert(present.forall(bf.mightContain), "no false negatives, ever")
    val absent = (0 until 2000).map(i => s"__definitely_not_a_token_$i")
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp < 0.05, s"false-positive rate $fp should track the configured 1%")
  }
}
