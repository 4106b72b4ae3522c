package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.functions.TextFunctions.tokens

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val words = Tables(spark, sf("sf0.01"), "documents")
    .select(explode(tokens($"text")).as("w")).cache()

  test("countMin estimates never undercount, bounded overcount") {
    val grid = Sketch.countMin(words, "w", depth = 4, width = 256)
    val exact = words.groupBy($"w").agg(count(lit(1)).as("exact"))
    val joined = Sketch.estimate(grid, exact, "w", depth = 4, width = 256)
      .join(exact, Seq("w"))
      .select($"w", $"exact", $"cm_est")
      .as[(String, Long, Long)].collect()
    val n = words.count()
    assert(joined.nonEmpty)
    joined.foreach { case (w, ex, est) =>
      assert(est >= ex, s"$w: estimate $est < exact $ex")
      // classic CMS bound with margin: overcount ≤ (e/width)·N whp
      assert(est - ex <= (3.0 * math.E / 256.0 * n).toLong, s"$w: overcount ${est - ex}")
    }
  }

  test("kmvDistinct: estimate within KMV error bounds of exact; tiny groups exact") {
    val est = Sketch.kmvDistinct(words, "w", "w", k = 64) // degenerate: group == key
    // every group has exactly 1 distinct key -> below k -> exact count 1
    assert(est.filter($"est_distinct" =!= 1L).count() == 0)
    // real estimate over a high-cardinality set: distinct 3-gram shingles
    import graft.functions.TextFunctions.shingles
    val shs = Tables(spark, sf("sf0.01"), "documents")
      .select(explode(shingles(tokens($"text"), 3)).as("sh"))
      .withColumn("g", lit("all")).cache()
    val exact = shs.select($"sh").distinct().count()
    assert(exact > 64, s"fixture must exceed k (got $exact)") // estimator path
    val kmv = Sketch.kmvDistinct(shs, "sh", "g", k = 64)
      .select($"est_distinct").as[Long].head()
    // k=64 -> relative error ~1/sqrt(k) = 12.5%; allow 4 sigma
    assert(math.abs(kmv - exact).toDouble / exact < 0.5,
      s"kmv $kmv vs exact $exact")
  }

  test("countMin grids merge by cell-wise addition") {
    val gridAll = Sketch.countMin(words, "w", 4, 256)
    val half1 = words.filter(crc32($"w") % 2 === 0)
    val half2 = words.filter(crc32($"w") % 2 =!= 0)
    val merged = Sketch.countMin(half1, "w", 4, 256)
      .unionByName(Sketch.countMin(half2, "w", 4, 256))
      .groupBy($"d", $"b").agg(sum($"c").as("c"))
    val diff = gridAll.join(merged, Seq("d", "b"), "full_outer")
      .filter(gridAll("c") =!= merged("c") ||
        gridAll("c").isNull =!= merged("c").isNull)
    assert(diff.count() == 0, "merged grid differs from whole-corpus grid")
  }
}
