package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class EvaluateSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Boolean, Long)]): (Long, Long, Long, Long, Long) =
    Evaluate.binaryAuc(rows.toDF("y", "sc"), col("y"), "sc")
      .as[(Long, Long, Long, Long, Long, Double)].head() match {
        case (np, nn, c, t, ppm, _) => (np, nn, c, t, ppm)
      }

  test("perfect separation -> AUC 1.0") {
    val r = auc(Seq((true, 10L), (true, 9L), (false, 1L), (false, 2L)))
    assert(r == ((2L, 2L, 4L, 0L, 1000000L)))
  }

  test("inverted separation -> AUC 0.0") {
    val r = auc(Seq((true, 1L), (false, 10L), (false, 9L)))
    assert(r == ((1L, 2L, 0L, 0L, 0L)))
  }

  test("all scores tied -> AUC 0.5") {
    val r = auc(Seq((true, 5L), (true, 5L), (false, 5L)))
    assert(r == ((2L, 1L, 0L, 2L, 500000L)))
  }

  test("mixed case matches hand count") {
    // pos scores {3, 1}, neg scores {2, 1}
    // pairs: (3,2)+ (3,1)+ (1,2)- (1,1)=  -> conc 2, tied 1 of 4
    // AUC = (2 + 0.5) / 4 = 0.625
    val r = auc(Seq((true, 3L), (true, 1L), (false, 2L), (false, 1L)))
    assert(r == ((2L, 2L, 2L, 1L, 625000L)))
  }

  test("calibration bins: widths, rates, out-of-range filtered") {
    val rows = Seq(
      (false, 5L), (false, 15L), (true, 15L),   // bins 0 and 1
      (true, 95L), (true, 100L),                // bin 9 (100 clamps into 9)
      (true, 101L), (false, -1L))               // out of range: dropped
      .toDF("y", "sc")
    val out = Evaluate.calibrationBins(rows, col("y"), "sc", 0L, 100L, 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 1L, 0L, 0L),
      (1L, 2L, 1L, 500000L),
      (9L, 2L, 2L, 1000000L)))
  }

  test("chi-squared matches the hand-computed 2x2 table") {
    // o: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=50; N=100
    // chi2 = 196/16 + 196/24 + 196/24 + 196/36 = 34.0278 (ppm-floored)
    val rows =
      Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(50)(("y", "q"))
    val out = Evaluate.chiSquared(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(out._1 == 100L && out._2 == 4L)
    assert(out._3 == 12250000L + 8166666L + 8166666L + 5444444L) // 34027776
  }

  test("ks statistic: max CDF gap and its smallest attaining score") {
    // distinct scores 1,2,3; np = 0,1,1; nn = 1,1,0; P = N = 2
    // d(1) = |0*2-1*2|/4 = .5; d(2) = |2-4|/4 = .5; d(3) = 0
    // max 500000, first attained at score 1
    val r = Evaluate.ksStatistic(
        Seq((false, 1L), (false, 2L), (true, 2L), (true, 3L)).toDF("y", "sc"),
        col("y"), "sc")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r == ((2L, 2L, 500000L, 1L, 0.5)))
  }

  test("ks statistic: perfect separation -> 1.0 at the top negative score") {
    val r = Evaluate.ksStatistic(
        Seq((true, 10L), (true, 9L), (false, 2L), (false, 1L)).toDF("y", "sc"),
        col("y"), "sc")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r == ((2L, 2L, 1000000L, 2L, 1.0)))
  }

  test("threshold sweep: per-threshold tp/fp/fn and ppm metrics") {
    val out = Evaluate.thresholdSweep(
        Seq((false, 1L), (false, 2L), (true, 2L), (true, 3L)).toDF("y", "sc"),
        col("y"), "sc")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0L, 500000L, 1000000L, 666666L),
      (2L, 2L, 1L, 0L, 666666L, 1000000L, 800000L),
      (3L, 1L, 0L, 1L, 1000000L, 500000L, 666666L)))
  }

  test("cumulative gain: equal-count bins, tied groups stay whole") {
    val rows = Seq((true, 4L), (false, 3L), (true, 2L), (false, 1L))
    val out = Evaluate.cumulativeGain(rows.toDF("y", "sc"), col("y"), "sc", 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 2L, 1L, 1L, 500000L, 1000000L),
      (1L, 2L, 1L, 2L, 1000000L, 1000000L)))
    // all scores tied: one whole group in bin 0
    val tied = Seq((true, 5L), (false, 5L), (true, 5L), (false, 5L))
    val t2 = Evaluate.cumulativeGain(tied.toDF("y", "sc"), col("y"), "sc", 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(t2 == Seq((0L, 4L, 2L, 2L, 1000000L, 1000000L)))
  }

  test("cohen kappa: textbook 2x2 agreement table") {
    // agree 35/50, marginals r=(25,25) c=(30,20) -> pe = 1250/2500
    // kappa = (50*35 - 1250) / (2500 - 1250) = 0.4 exactly
    val rows =
      Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val r = Evaluate.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((50L, 35L, 400000L, 0.4)))
  }

  test("cohen kappa: degenerate constant table -> null; one-sided categories count") {
    val d = Evaluate.cohenKappa(
        Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b")
      .select("kappa_ppm").as[Option[Long]].head()
    assert(d.isEmpty)
    // b has category z never seen in a: union marginals still exact
    // cells (x,x)=1 (y,z)=1; sum_rc = 1*1 -> kappa = (2-1)/(4-1) = 1/3
    val s = Evaluate.cohenKappa(
        Seq(("x", "x"), ("y", "z")).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(s._1 == 2L && s._2 == 1L && s._3 == 333333L)
  }

  test("chi-squared: independent uniform table scores ~zero; zero cells count") {
    // perfectly independent 2x2: chi2 == 0
    val indep =
      Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(20)(("y", "q"))
    val z = Evaluate.chiSquared(indep.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(z._3 == 0L)
    // a structurally missing cell: (y,q) absent -> zero-cell term r*c/N
    // x: p=10,q=10; y: p=10,q=0  => E(y,q)=20*10/30=6.67 contributes ~6.67
    val sparse =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p"))
    val s = Evaluate.chiSquared(sparse.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(s._2 == 3L) // only observed cells materialize
    // naive ppm recomputation over ALL 4 cells (zero cell included)
    val n = 30L
    val cells = Seq((10L, 20L, 20L), (10L, 20L, 10L), (10L, 10L, 20L))
    val obs = cells.map { case (o, r, c) =>
      val d = o * n - r * c; d * d * 1000000L / (n * r * c)
    }.sum
    val obsExp = cells.map { case (_, r, c) => r * c * 1000000L / n }.sum
    assert(s._3 == obs + n * 1000000L - obsExp)
  }

  test("cluster quality: tight well-separated clusters score near 1") {
    // two clusters far apart, points at centroid ± 0.1 on dim 0
    val rows = Seq(
      (0L, "a", Seq(0.1, 0.0)), (1L, "a", Seq(-0.1, 0.0)),
      (2L, "b", Seq(10.1, 0.0)), (3L, "b", Seq(9.9, 0.0)))
    val out = Evaluate.clusterQuality(
        rows.toDF("id", "lbl", "v"), "id", "lbl", "v")
      .orderBy(col("label"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("a", "b"))
    out.foreach { case (_, n, intra, nearest, sil) =>
      assert(n == 2L)
      assert(intra == 0.01) // (±0.1)² to own centroid
      assert(nearest == 100.01) // 10² + own offset²
      assert(sil > 0.999) // (b-a)/b ≈ 1
    }
  }

  test("cluster quality: single point per cluster -> intra 0, silhouette 1") {
    val rows = Seq((0L, "a", Seq(0.0, 0.0)), (1L, "b", Seq(3.0, 4.0)))
    val out = Evaluate.clusterQuality(
        rows.toDF("id", "lbl", "v"), "id", "lbl", "v")
      .orderBy(col("label"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.forall(_._3 == 0.0)) // sits on its own centroid
    assert(out.forall(_._4 == 25.0)) // 3² + 4²
    assert(out.forall(_._5 == 1.0)) // a=0 -> s = b/b
  }

  test("mrr: first-relevant reciprocal in exact ppm, misses count zero") {
    import org.apache.spark.sql.functions._
    // q1 hits at rank 2 -> 500000; q2 at rank 1 -> 1000000; q3 never -> 0
    val ranked = Seq(
      (1L, 1L, false), (1L, 2L, true), (1L, 3L, true),
      (2L, 1L, true),
      (3L, 1L, false), (3L, 2L, false)).toDF("query_id", "rk", "rel")
    val queries = Seq(1L, 2L, 3L).toDF("query_id")
    val out = Evaluate.mrr(ranked, queries, col("rel")).collect().head
    assert(out.getAs[Long]("n_queries") == 3L)
    assert(out.getAs[Long]("n_hit") == 2L)
    assert(out.getAs[Long]("mrr_ppm") == (500000L + 1000000L) / 3L)
    // a query absent from `ranked` entirely still sits in the denominator
    val out2 = Evaluate.mrr(ranked, Seq(1L, 2L, 3L, 4L).toDF("query_id"),
      col("rel")).collect().head
    assert(out2.getAs[Long]("n_queries") == 4L)
    assert(out2.getAs[Long]("mrr_ppm") == 1500000L / 4L)
  }

  test("ndcgAtK: known fixtures, IDCG truncation, no-relevant null") {
    val w = Evaluate.ndcgWeights(5)
    assert(w == Seq(1000000L, 630930L, 500000L, 430677L, 386853L))
    val ranked = Seq(
      // q1: relevant at ranks 1 and 3
      (1L, 1, true), (1L, 2, false), (1L, 3, true), (1L, 4, false), (1L, 5, false),
      // q2: relevant at rank 2 only, but n_rel = 1 -> IDCG = w1
      (2L, 1, false), (2L, 2, true), (2L, 3, false),
      // q3: nothing relevant in top-5
      (3L, 1, false), (3L, 2, false),
      // q4 absent from ranked entirely
    ).toDF("query_id", "rk", "rel")
    val queries = Seq((1L, 10L), (2L, 1L), (3L, 4L), (4L, 0L))
      .toDF("query_id", "n_rel")
    val out = Evaluate.ndcgAtK(ranked, queries, col("rel"), k = 5)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val cum = w.scanLeft(0L)(_ + _).tail
    assert(out(1L) == ((w(0) + w(2), cum(4), Some((w(0) + w(2)) * 1000000L / cum(4)))))
    assert(out(2L) == ((w(1), w(0), Some(w(1) * 1000000L / w(0)))))
    assert(out(3L) == ((0L, cum(3), Some(0L))))
    assert(out(4L) == ((0L, 0L, None))) // n_rel = 0: undefined nDCG
  }

  test("splitConformal: fold accounting and the conformal coverage guarantee") {
    val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
    val out = Evaluate.splitConformal(orders, "o_orderkey",
      "o_orderpriority", "o_totalprice", alphaPct = 10, seed = 41).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val (ntr, nca, nte) = (r.getAs[Long]("n_train"),
        r.getAs[Long]("n_cal"), r.getAs[Long]("n_test"))
      // 60/20/20 hash folds (train:cal = 3:1), within generous slack
      assert(ntr > 3 * nca - nca && ntr < 3 * nca + nca)
      assert(math.abs(nca - nte) < (nca + nte) / 4)
      // marginal coverage >= 1 - alpha minus finite-sample slack: the
      // guarantee is over random splits, a FIXED split wobbles ~1.2%
      // (sigma of a Bernoulli(0.9) mean over ~600 test rows); allow 5σ
      val cov = r.getAs[Long]("coverage_ppm")
      assert(cov >= 840000L, s"coverage $cov ppm under the conformal bound")
      assert(r.getAs[Long]("qhat_cents") > 0)
    }
  }

  test("splitConformal q-hat is the exact order statistic on a hand fixture") {
    // one group, ids chosen so folds are known only after hashing — use
    // alphaPct=20 over a tiny calibration set and recompute naively
    val df = (1 to 200).map(i => (i.toLong, "g", i * 1.0)).toDF("id", "g", "v")
    val r = Evaluate.splitConformal(df, "id", "g", "v", alphaPct = 20, seed = 7)
      .head()
    // recompute: same hash folds via the operator's own building blocks
    import graft.functions.TextFunctions.hash32
    val folds = df.select(col("id"), col("v"),
        (hash32(col("id").cast("string"), 7) % 10).as("f"))
      .as[(Long, Double, Long)].collect()
    val cents = folds.map { case (id, v, f) => (id, math.round(v * 100), f) }
    val tr = cents.filter(_._3 <= 5).map(_._2)
    val pred = tr.sum / tr.length // floor division on longs
    val resid = cents.filter(c => c._3 == 6 || c._3 == 7)
      .map(c => math.abs(c._2 - pred)).sorted
    val k = math.min((((resid.length + 1) * 80) + 99) / 100, resid.length)
    assert(r.getAs[Long]("pred_cents") === pred)
    assert(r.getAs[Long]("qhat_cents") === resid(k - 1))
  }
}
