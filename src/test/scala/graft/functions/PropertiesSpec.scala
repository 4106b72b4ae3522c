package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.functions.GraftFunctions._

/** Property-based checks (SURVEY §5 test strategy item 2): algebraic laws
  * the vector/text operators must satisfy for any input, evaluated through
  * the real expressions over seeded ScalaCheck generators (scalatestplus
  * isn't on the offline classpath, so cases are drawn explicitly).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Seq[Double]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(-50.0, 50.0)))

  test("cosine: symmetric, bounded, scale-invariant for positive scale") {
    val cases = samples(Gen.zip(vecGen, vecGen, Gen.choose(0.1, 10.0)), 15)
    cases.foreach { case (a0, b0, s) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val rows = Seq((a, b), (b, a), (a.map(_ * s), b)).toDF("x", "y")
        .select(cosine_sim($"x", $"y")).as[Double].collect()
      assert(rows(0) === rows(1), s"symmetry: $a $b") // bit-exact: same loop order
      assert(rows.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
      assert(math.abs(rows(2) - rows(0)) < 1e-9, s"scale invariance: $a $b $s")
    }
  }

  test("cosine of a vector with itself is 1 (or 0 for the zero vector)") {
    (samples(vecGen, 10) :+ Seq(0.0, 0.0)).foreach { a =>
      val c = Seq((a, a)).toDF("x", "y").select(cosine_sim($"x", $"y")).as[Double].head()
      if (a.forall(_ == 0.0)) assert(c === 0.0)
      else assert(math.abs(c - 1.0) < 1e-9, s"self-cosine: $a -> $c")
    }
  }

  test("l2_normalize output has unit norm (or stays zero)") {
    (samples(vecGen, 10) :+ Seq(0.0)).foreach { a =>
      val n = Seq(Tuple1(a)).toDF("x")
        .select(l2_norm(l2_normalize($"x"))).as[Double].head()
      if (a.forall(_ == 0.0)) assert(n === 0.0) else assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("top_k_by_score equals sort-take for any scores") {
    val pairGen = Gen.listOfN(40, Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L)))
    samples(pairGen, 8).foreach { items =>
      val got = items.toDF("score", "id").repartition(3)
        .groupBy(lit(1)).agg(top_k_by_score($"score", $"id", 4).as("t"))
        .select(explode($"t").as("p")).select($"p.score", $"p.id")
        .as[(Double, Long)].collect().toSeq
      val exp = items.sortBy { case (s, i) => (-s, i) }.take(4)
      assert(got == exp, s"items=$items")
    }
  }

  test("tumbling windows conserve row counts (bucketing law)") {
    samples(Gen.listOfN(30, Gen.choose(0L, 10000L)), 6).foreach { secs =>
      val df = secs.toDF("sec").select(timestamp_seconds($"sec").as("ts"))
      val total = df.groupBy(window($"ts", "60 seconds")).count()
        .agg(sum($"count")).as[Long].head()
      assert(total == secs.length)
    }
  }

  test("minhash permutations stay in [0, p) and are distinct families") {
    val hGen = Gen.choose(0L, (1L << 32) - 1)
    samples(hGen, 20).foreach { h =>
      val perms = (0 until 8).map(i =>
        Seq(Tuple1(h)).toDF("h").select(TextFunctions.minhashPerm($"h", i)).as[Long].head())
      assert(perms.forall(p => p >= 0 && p < TextFunctions.MinhashP))
      assert(perms.distinct.size == 8, s"h=$h perms=$perms")
    }
  }
}
