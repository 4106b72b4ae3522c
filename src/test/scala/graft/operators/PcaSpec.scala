package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // synthetic corpus with a planted dominant direction along (1,1,0,...)
  private def planted(n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val t = rnd.nextGaussian() * 3.0 // dominant coordinate
      val v = Array.tabulate(dim)(d =>
        (if (d == 0 || d == 1) t + rnd.nextGaussian() * 0.1
         else rnd.nextGaussian() * 0.1).toFloat)
      (i.toLong, v.toSeq)
    }
  }

  test("topComponent finds the planted dominant direction") {
    val emb = planted(400, 8).toDF("vec_id", "embedding")
    val (v, vq, n) = Pca.topComponent(emb, dim = 8, iters = 10)
    assert(n == 400)
    // dominant direction ~ (1,1,0..)/sqrt(2): the two lead loadings are
    // large and near-equal, the rest near zero
    assert(math.abs(v(0)) > 0.6 && math.abs(v(1)) > 0.6, v.toSeq)
    assert((2 until 8).forall(i => math.abs(v(i)) < 0.1), v.toSeq)
    // sign rule: the largest-|.| component is positive
    val mx = v.map(math.abs).max
    assert(v(v.indexWhere(x => math.abs(x) == mx)) > 0)
    // unit norm and consistent quantization
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(vq.zip(v).forall { case (qi, vi) =>
      qi == math.floor(vi * 1e6 + 0.5).toLong })
  }

  test("projectTop ≡ naive integer projection with the same component") {
    val emb = planted(200, 8).toDF("vec_id", "embedding")
    val (_, vq, _) = Pca.topComponent(emb, dim = 8, iters = 10)
    val naive = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (id, xs) =>
        val p = (0 until 8).map(i =>
          math.floor(xs(i).toDouble * 1e6).toLong * vq(i)).sum
        id -> p
      }.toMap
    val got = Pca.projectTop(emb, dim = 8, iters = 10)
      .select($"vec_id", $"proj_scaled").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("projection separates the planted direction from noise rows") {
    // rows along the planted direction project far; pure-noise rows near 0
    val rnd = new scala.util.Random(3)
    val strong = (0 until 50).map { i =>
      val t = 2.0 + i * 0.01
      (i.toLong, Seq.tabulate(8)(d => if (d == 0) t.toFloat else 0.0f))
    }
    val noise = (50 until 300).map { i =>
      (i.toLong, Seq.tabulate(8)(d => (rnd.nextGaussian() * 0.01).toFloat))
    }
    val emb = (strong ++ noise).toDF("vec_id", "embedding")
    val proj = Pca.projectTop(emb, dim = 8, iters = 10)
      .select($"vec_id", abs($"proj")).as[(Long, Double)].collect().toMap
    val strongMin = (0 until 50).map(i => proj(i.toLong)).min
    val noiseMax = (50 until 300).map(i => proj(i.toLong)).max
    assert(strongMin > noiseMax * 10)
  }

  test("scatter moments merge across shards by field-wise addition") {
    // the 100 TB story: per-shard/per-day moment rows sum into the
    // corpus moments, so the component retrains incrementally without
    // touching old shards
    val a = planted(120, 8).toDF("vec_id", "embedding")
    val b = planted(80, 8).map { case (id, v) => (id + 1000L, v) }
      .toDF("vec_id", "embedding")
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = Pca.scatterMoments(df, 8, "embedding").collect()(0)
      (0 until r.length).map { i =>
        if (i == 0) BigDecimal(r.getLong(0)) else BigDecimal(r.getDecimal(i))
      }
    }
    val (ra, rb, ru) = (row(a), row(b), row(a.union(b)))
    assert(ru == ra.zip(rb).map { case (x, y) => x + y })
  }

  test("moments pass plans a single-row partial aggregate — no shuffle of rows") {
    val emb = planted(100, 8).toDF("vec_id", "embedding")
    val plan = Pca.scatterMoments(emb, 8, "embedding")
      .queryExecution.executedPlan.toString
    // partial + final hash aggregate around a single exchange of ONE row
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }
}
