package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions._

class HashFeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private def embed(ms: Map[String, Double]*) =
    ms.map(Tuple1(_)).toDF("m")
      .select(hash_featurize($"m", 64).as("e"))
      .as[Seq[Float]].collect()

  test("deterministic and unit-norm") {
    val Array(a, b) = embed(Map("x" -> 1.0, "y" -> 2.0), Map("x" -> 1.0, "y" -> 2.0))
    assert(a == b)
    val norm = math.sqrt(a.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty map → zero vector (failed-embed semantics, F15)") {
    val Array(z) = embed(Map.empty[String, Double])
    assert(z.forall(_ == 0.0f))
    // and zero vector scores cosine 0.0 against anything
    val c = Seq((Map.empty[String, Double], Map("x" -> 1.0)))
      .toDF("a", "b")
      .select(cosine_sim(hash_featurize($"a", 64), hash_featurize($"b", 64)))
      .as[Double].head()
    assert(c == 0.0)
  }

  test("similar metric maps → nearby vectors; dissimilar → distant") {
    val base = Map("temp" -> 70.0, "power" -> 20.0, "fan" -> 900.0)
    val near = Map("temp" -> 70.5, "power" -> 20.2, "fan" -> 905.0)
    val far = Map("temp" -> 20.0, "power" -> 90.0, "fan" -> 100.0)
    val df = Seq((base, near, far)).toDF("b", "n", "f")
    val (cn, cf) = df.select(
      cosine_sim(hash_featurize($"b", 64), hash_featurize($"n", 64)),
      cosine_sim(hash_featurize($"b", 64), hash_featurize($"f", 64)))
      .as[(Double, Double)].head()
    assert(cn > 0.99, s"near cosine $cn")
    assert(cf < cn, s"far cosine $cf should be below near $cn")
  }
}
