package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("sf0.01"), "embeddings")

  test("codes stay in [-127, 127] and the max-|x| component pins the range") {
    val q = Quantize.int8(emb, "vec_id", "embedding")
      .select($"vec_id", $"scale", $"codes")
    val rows = q.as[(Long, Double, Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id out of range")
      assert(scale > 0)
      // the element that defined the scale quantizes to exactly ±127
      assert(codes.exists(c => math.abs(c) == 127), s"vec $id misses full range")
    }
  }

  test("reconstruction error is bounded by half a quantization step per dim") {
    // |x - c*s/127| <= s/254 per component (half-up rounding), so
    // mse <= (s/254)^2
    val stats = Quantize.int8Stats(emb, "vec_id", "embedding")
      .select($"vec_id", $"scale", $"mse").as[(Long, Double, Double)].collect()
    stats.foreach { case (id, s, mse) =>
      val bound = (s / 254.0) * (s / 254.0)
      assert(mse <= bound + 1e-12, s"vec $id: mse=$mse > bound=$bound")
    }
  }

  test("zero vectors quantize to zero codes with scale 0 and zero error") {
    val z = Seq((1L, Array.fill(8)(0.0f)), (2L, Array(0.5f, -1.0f, 0.25f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.int8Stats(z, "vec_id", "embedding")
      .orderBy($"vec_id")
      .select($"vec_id", $"scale", $"code_sum", $"code_min", $"code_max", $"mse")
      .as[(Long, Double, Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 0.0, 0L, 0L, 0L, 0.0)))
    val (_, s2, _, mn2, mx2, _) = out(1)
    assert(s2 == 1.0 && mn2 == -127L && mx2 == 64L)
  }

  test("quantization is a pure function: reruns produce identical codes") {
    val a = Quantize.int8(emb, "vec_id", "embedding")
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().sortBy(_._1)
    val b = Quantize.int8(emb, "vec_id", "embedding")
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("dequantized vectors preserve cosine geometry (serving-tier sanity)") {
    import graft.functions.GraftFunctions.cosine_sim
    val deq = Quantize.int8(emb, "vec_id", "embedding")
      .select($"vec_id",
        transform($"codes", c => c.cast("double") * $"scale" / lit(127.0))
          .cast("array<float>").as("deq"))
    val both = emb.select($"vec_id", $"embedding").join(deq, "vec_id")
      .select(cosine_sim($"embedding", $"deq").as("sim"))
      .as[Double].collect()
    assert(both.forall(_ > 0.999), s"min self-sim ${both.min}")
  }
}
