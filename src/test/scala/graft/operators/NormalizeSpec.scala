package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    graft.sources.Tables(spark, sf("sf0.01"), "events")
      .select($"event_id", $"value")

  test("quantile rank equals the global-sort rank it avoids") {
    val ours = Normalize.featureScale(events, "event_id", "value")
      .select($"event_id", $"quantile_ppm")
    val n = events.count()
    val naive = events.select($"event_id",
      expr(s"(CAST(rank() OVER (ORDER BY value) AS BIGINT) - 1) * 1000000 div ${n - 1}")
        .as("quantile_ppm"))
    assert(ours.exceptAll(naive).isEmpty && naive.exceptAll(ours).isEmpty)
  }

  test("result is invariant to the bucket count") {
    val a = Normalize.featureScale(events, "event_id", "value", numBuckets = 4)
    val b = Normalize.featureScale(events, "event_id", "value", numBuckets = 997)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("known values: minmax and zscore") {
    val df = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0)).toDF("id", "value")
    val out = Normalize.featureScale(df, "id", "value")
      .orderBy($"id").collect()
    assert(out(0).getDouble(2) == 0.0 && out(2).getDouble(2) == 1.0)
    assert(out(1).getDouble(2) == 0.5)
    assert(out(1).getDouble(3) == 0.0) // mean point
    // symmetric z-scores: std = sqrt(50/3); ±5/std
    assert(math.abs(out(0).getDouble(3) + out(2).getDouble(3)) < 1e-9)
    assert(out(0).getLong(4) == 0L && out(1).getLong(4) == 500000L &&
      out(2).getLong(4) == 1000000L)
  }

  test("degenerate inputs yield null, never NaN") {
    val const = Seq((1L, 7.0), (2L, 7.0)).toDF("id", "value")
    val c = Normalize.featureScale(const, "id", "value").collect()
    assert(c.forall(r => r.isNullAt(2) && r.isNullAt(3))) // no range, no std
    assert(c.forall(r => !r.isNullAt(4))) // rank still defined (all tied at 0)
    assert(c.forall(_.getLong(4) == 0L))

    val single = Seq((1L, 3.0)).toDF("id", "value")
    val s1 = Normalize.featureScale(single, "id", "value").collect()
    assert(s1.forall(r => r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("ties spanning bucket boundaries share the min-rank") {
    // many duplicates of few values forces ties into the same bucket check
    val df = (1L to 100L).map(i => (i, (i % 5).toDouble)).toDF("id", "value")
    val ours = Normalize.featureScale(df, "id", "value", numBuckets = 3)
      .select($"id", $"quantile_ppm")
    val naive = df.select($"id",
      expr("(CAST(rank() OVER (ORDER BY value) AS BIGINT) - 1) * 1000000 div 99")
        .as("quantile_ppm"))
    assert(ours.exceptAll(naive).isEmpty && naive.exceptAll(ours).isEmpty)
  }

  test("quantileNormalize ≡ naive global-window implementation; several bucket counts") {
    // three groups with wildly different score scales + one singleton
    val rnd = new scala.util.Random(5)
    val rows =
      (0 until 40).map(i => (i.toLong, "a", (rnd.nextInt(100) + 900).toLong)) ++
      (40 until 90).map(i => (i.toLong, "b", rnd.nextInt(50).toLong)) ++
      (90 until 120).map(i => (i.toLong, "c", (rnd.nextInt(10) * 1000).toLong)) ++
      Seq((120L, "solo", 77L))
    val df = rows.toDF("id", "grp", "v")
    def naive: Set[(Long, String, Long, Long)] = {
      val g = df.select($"id", $"grp", $"v",
        expr("CAST(row_number() OVER (PARTITION BY grp ORDER BY v, id) AS BIGINT)").as("r"),
        expr("CAST(count(*) OVER (PARTITION BY grp) AS BIGINT)").as("ng"),
        expr("CAST(count(*) OVER () AS BIGINT)").as("n"))
      val pos = df.select($"v".as("gv"),
        expr("CAST(row_number() OVER (ORDER BY v, id) AS BIGINT)").as("gpos"))
      g.withColumn("idx",
          when($"ng" > 1, lit(1L) + expr("(r - 1) * (n - 1) div (ng - 1)"))
            .otherwise(expr("(n + 1) div 2")))
        .join(pos, $"idx" === $"gpos")
        .select($"id", $"grp", $"v", $"gv")
        .as[(Long, String, Long, Long)].collect().toSet
    }
    for (b <- Seq(1, 7, 256)) {
      val got = Normalize.quantileNormalize(df, "id", "grp", "v", numBuckets = b)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == naive, s"buckets=$b")
    }
    // the singleton group lands on the global median value
    val med = Normalize.quantileNormalize(df, "id", "grp", "v")
      .filter($"grp" === "solo").select($"norm_v").as[Long].head()
    val sortedVals = rows.sortBy(r => (r._3, r._1)).map(_._3)
    assert(med == sortedVals((rows.size + 1) / 2 - 1))
  }

  test("targetEncode: out-of-fold means match a naive recomputation; no leakage") {
    import graft.functions.TextFunctions.hash32
    val rows = (1 to 200).map(i => (i.toLong, s"c${i % 3}", i * 1.0))
    val df = rows.toDF("id", "cat", "v")
    val out = Normalize.targetEncode(df, "id", "cat", "v", folds = 4, seed = 17)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("fold")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("enc_cents"))).toMap
    // recompute with the operator's own fold hash, naively in Scala
    val folds = df.select($"id", (hash32($"id".cast("string"), 17) % 4).as("f"))
      .as[(Long, Long)].collect().toMap
    val data = rows.map { case (id, c, v) =>
      (c, folds(id), math.round(v * 100)) }
    for (((c, f), (n, enc)) <- out) {
      val others = data.filter(d => d._1 == c && d._2 != f)
      assert(n === data.count(d => d._1 == c && d._2 == f))
      assert(others.nonEmpty)
      assert(enc === others.map(_._3).sum / others.length,
        s"category $c fold $f")
    }
    // and the encoding NEVER equals the own-fold mean when they differ
    // (the leakage a naive mean join would introduce)
    for (((c, f), (_, enc)) <- out) {
      val own = data.filter(d => d._1 == c && d._2 == f).map(_._3)
      val ownMean = own.sum / own.length
      val all = data.filter(_._1 == c).map(_._3)
      if (ownMean != all.sum / all.length) assert(enc !== ownMean)
    }
  }
}
