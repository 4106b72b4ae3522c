package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosine_sim($"a", $"b")).as[Double].head()

  test("cosine of identical vectors is 1.0") {
    assert(math.abs(cos(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0.0") {
    assert(cos(Seq(1.0, 0.0), Seq(0.0, 1.0)) === 0.0)
  }

  test("cosine of opposite vectors is -1.0") {
    assert(math.abs(cos(Seq(1.0, 1.0), Seq(-1.0, -1.0)) + 1.0) < 1e-12)
  }

  test("zero vector yields 0.0 (reference anomaly_detection.py:41-43 semantics)") {
    assert(cos(Seq(0.0, 0.0), Seq(1.0, 2.0)) === 0.0)
    assert(cos(Seq(1.0, 2.0), Seq(0.0, 0.0)) === 0.0)
  }

  test("float arrays work without an explicit cast and match double results") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val f = df.select(cosine_sim($"a", $"b")).as[Double].head()
    val d = cos(Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0))
    assert(f === d)
  }

  test("cosine is symmetric on random vectors") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(16)(rnd.nextGaussian())
      val b = Seq.fill(16)(rnd.nextGaussian())
      val x = cos(a, b); val y = cos(b, a)
      assert(x === y)
      assert(x >= -1.0 - 1e-12 && x <= 1.0 + 1e-12)
    }
  }

  test("dot_product and l2_norm agree with manual math") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 1.0))).toDF("a", "b")
    val Row(dot: Double, na: Double) =
      df.select(dot_product($"a", $"b"), l2_norm($"a")).head()
    assert(dot === 4.0)
    assert(na === 3.0)
  }

  test("l2_normalize produces unit vectors; zero vector passes through") {
    val df = Seq(Tuple1(Seq(3.0, 4.0)), Tuple1(Seq(0.0, 0.0))).toDF("a")
    val out = df.select(l2_normalize($"a").as("n"), l2_norm(l2_normalize($"a")).as("len"))
      .collect()
    assert(out(0).getSeq[Double](0) == Seq(0.6, 0.8))
    assert(out(1).getSeq[Double](0) == Seq(0.0, 0.0))
    assert(out(0).getDouble(1) === 1.0)
  }

  test("hamming_dist counts differing bits") {
    val df = Seq((0xFFL, 0x0FL), (5L, 5L)).toDF("a", "b")
    assert(df.select(hamming_dist($"a", $"b")).as[Int].collect().toSeq == Seq(4, 0))
  }

  test("SQL registration exposes the functions to spark.sql") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_sim(a, b) c, l2_norm(a) n FROM vecs").head()
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 1.0)
  }

  test("md5_hash32 is callable from SQL (extensions + register) and matches the column form") {
    GraftFunctions.register(spark)
    Seq("x", "y", "z").toDF("s").createOrReplaceTempView("hs")
    val viaSql = spark.sql("SELECT md5_hash32(s, 9) FROM hs").as[Long].collect().toSeq
    val viaCol = Seq("x", "y", "z").toDF("s")
      .select(graft.functions.TextFunctions.hash32($"s", 9)).as[Long].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.forall(h => h >= 0L && h < (1L << 32)))
  }

  test("md5_hash32 3-arg slot form agrees between register() and the Md5Hash32 column") {
    GraftFunctions.register(spark)
    Seq("x", "y", "z").toDF("s").createOrReplaceTempView("hs3")
    // the temp-function registration must honor the slot argument exactly
    // like the GraftExtensions injection (the two paths once diverged)
    (0 to 3).foreach { slot =>
      val viaSql = spark.sql(s"SELECT md5_hash32(s, 9, $slot) FROM hs3")
        .as[Long].collect().toSeq
      val viaCol = Seq("x", "y", "z").toDF("s")
        .select(graft.internal.Bridge.column(
          graft.functions.Md5Hash32(
            graft.internal.Bridge.expression($"s"), 9, slot)))
        .as[Long].collect().toSeq
      assert(viaSql == viaCol, s"slot $slot diverged")
    }
    // distinct slots give independent words of the digest
    val s0 = spark.sql("SELECT md5_hash32(s, 9, 0) FROM hs3").as[Long].collect().toSeq
    val s1 = spark.sql("SELECT md5_hash32(s, 9, 1) FROM hs3").as[Long].collect().toSeq
    assert(s0 != s1)
  }
}
