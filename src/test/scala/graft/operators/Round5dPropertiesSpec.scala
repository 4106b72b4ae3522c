package graft.operators

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the round-5b/5d operators on RANDOM inputs —
  * the any-input properties beside the hand-fixture value checks.
  */
class Round5dPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Int, nUsers: Int, maxHour: Int) = {
    val rnd = new Random(seed)
    (1 to nUsers).flatMap { u =>
      val n = 1 + rnd.nextInt(6)
      (1 to n).map(_ => (u.toLong,
        new Timestamp(rnd.nextInt(maxHour).toLong * 3600L * 1000L)))
    }.toDF("user_id", "ts")
  }

  // ---- Kaplan-Meier ------------------------------------------------------

  test("KM: risk accounting, monotone survival, and exact-product bound on random inputs") {
    for (seed <- Seq(1, 2, 3)) {
      val events = randomEvents(seed, 120, 400)
      val km = Survival.kaplanMeier(events, "user_id", "ts", quietHours = 48)
        .collect()
      // s_ppm equals the floor-folded product recomputed from (n, d) rows
      var s = 1000000L
      km.foreach { r =>
        val n = r.getAs[Long]("n_risk"); val d = r.getAs[Long]("n_events")
        s = s * (n - d) / n
        assert(r.getAs[Long]("s_ppm") === s)
      }
      // and the floor product is within k ppm of the exact real product
      val exact = km.foldLeft(1.0) { (acc, r) =>
        acc * (r.getAs[Long]("n_risk") - r.getAs[Long]("n_events")).toDouble /
          r.getAs[Long]("n_risk")
      }
      assert(math.abs(s - math.floor(exact * 1e6)) <= km.length,
        s"seed $seed: folded $s vs exact ${exact * 1e6}")
    }
  }

  // ---- changepoint ---------------------------------------------------------

  test("changepoint score at the reported split is the max over all candidates") {
    val rnd = new Random(13)
    val rows = (0 until 300).flatMap { h =>
      val rate = if (h < 120) 2 + rnd.nextInt(2) else 4 + rnd.nextInt(3)
      Seq.fill(rate)(("k", new Timestamp(h.toLong * 3600L * 1000L)))
    }.toDF("event_type", "ts")
    val r = Timeseries.changepoint(rows, "event_type", "ts", minSeg = 24).head()
    // recompute every candidate score naively
    val xs = rows.groupBy(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("t"))
      .agg(count(lit(1)).as("x")).orderBy($"t")
      .as[(Long, Long)].collect()
    val n = xs.length.toLong; val tot = xs.map(_._2).sum
    var cum = 0L
    val scores = xs.zipWithIndex.flatMap { case ((t, x), idx) =>
      val i = idx + 1L; cum += x
      if (i >= 24 && i <= n - 24) {
        val d = cum * (n - i) - (tot - cum) * i
        Some((t, d * d / (i * (n - i))))
      } else None
    }
    assert(r.getAs[Long]("score") === scores.map(_._2).max)
    assert(r.getAs[Long]("split_t") ===
      scores.filter(_._2 == scores.map(_._2).max).map(_._1).min)
  }

  // ---- attribution ---------------------------------------------------------

  test("attribution conserves revenue under every model on random journeys") {
    val rnd = new Random(17)
    val events = (1 to 60).flatMap { u =>
      (0 until (3 + rnd.nextInt(15))).map { i =>
        val t = if (rnd.nextInt(5) == 0) "purchase"
          else Seq("view", "click", "signup")(rnd.nextInt(3))
        (u.toLong, new Timestamp((i * 60L) * 1000L), (u * 100 + i).toLong,
          t, if (t == "purchase") 1 + rnd.nextInt(10000) * 0.01 else 0.0)
      }
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Attribution.modelComparison(events, "user_id", "ts",
      "event_id", "event_type", "value").collect()
    val last = out.map(_.getAs[Long]("last_cents")).sum
    val lin = out.map(_.getAs[Long]("linear_cents")).sum
    val ush = out.map(_.getAs[Long]("ushape_cents")).sum
    // all three models credit the same attributable total (exact splits;
    // only the final div 1000 per channel can floor, so totals agree
    // within one cent per channel per model)
    assert(math.abs(last - lin) <= out.length)
    assert(math.abs(last - ush) <= out.length)
  }

  // ---- target encoding -------------------------------------------------

  test("targetEncode folds partition each category's rows exactly") {
    val rnd = new Random(23)
    val rows = (1 to 500).map(i =>
      (i.toLong, s"c${rnd.nextInt(7)}", rnd.nextInt(100000) * 0.01))
    val out = Normalize.targetEncode(rows.toDF("id", "cat", "v"),
      "id", "cat", "v", folds = 5, seed = 3).collect()
    val perCat = out.groupBy(_.getString(0))
    perCat.foreach { case (c, fs) =>
      val total = fs.map(_.getAs[Long]("n_rows")).sum
      assert(total === rows.count(_._2 == c), s"category $c fold sizes")
    }
  }

  // ---- DP noise ---------------------------------------------------------

  test("dpNoisedCounts never strays more than the clamp from the truth") {
    val rnd = new Random(29)
    val df = (1 to 2000).map(i => (i.toLong, s"g${rnd.nextInt(40)}"))
      .toDF("id", "g")
    val truth = df.groupBy($"g").count().as[(String, Long)].collect().toMap
    Seq(1, 2, 55).foreach { seed =>
      Scrub.dpNoisedCounts(df, "g", seed).collect().foreach { r =>
        val t = truth(r.getString(0)); val z = r.getAs[Long]("noised_count")
        assert(z >= math.max(0L, t - 8) && z <= t + 8)
      }
    }
  }
}
