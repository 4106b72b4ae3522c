package graft.functions

import graft.SparkSpec

/** Gates the pure-int64 fixed-point log2 that makes DSIR's
  * log-likelihood-ratio weights engine-exact. */
class FixedPointSpec extends SparkSpec {
  import spark.implicits._

  private val values: Seq[Long] =
    Seq(1L, 2L, 3L, 5L, 7L, 10L, 100L, 999L, 4096L, 65535L, 65536L,
      1048575L, 1048576L, 123456789L, 999999937L, (1L << 30) - 1,
      1L << 30, (1L << 31) - 1) ++ // full documented domain up to 2^31-1
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) % ((1L << 31) - 2) + 1)

  test("native graft_log2fp/graft_exp2fp == legacy aggregate-fold spelling, in Spark") {
    // the round-12 swap (ArrayAggregate is CodegenFallback -> the fold
    // lambda ran interpreted, whose megamorphic dispatch degraded ~3x in
    // long-lived many-query JVMs): the native expression must reproduce
    // the retired fold BIT-FOR-BIT, both evaluated by Spark itself
    val out = values.toDF("x")
      .selectExpr("x",
        s"${FixedPoint.log2FpSparkSql("x")} AS nat",
        s"${FixedPoint.log2FpLegacySparkSql("x")} AS leg")
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, nat, leg) => assert(nat == leg, s"log2 x=$x") }
    val exps = ((0L to 65535L by 97L) ++ (0 to 32).map(_ * 65536L) ++
      Seq(1L, 65535L, 65537L, 20L * 65536, 32L * 65536)).distinct
    val eo = exps.toDF("x")
      .selectExpr("x",
        s"${FixedPoint.exp2FpSparkSql("x")} AS nat",
        s"${FixedPoint.exp2FpLegacySparkSql("x")} AS leg")
      .as[(Long, Long, Long)].collect()
    eo.foreach { case (x, nat, leg) => assert(nat == leg, s"exp2 x=$x") }
    // and the JVM eval twins agree with Spark's evaluation of the native
    out.foreach { case (x, nat, _) => assert(FixedPoint.log2FpEval(x) == nat) }
    eo.foreach { case (x, nat, _) => assert(FixedPoint.exp2FpEval(x) == nat) }
  }

  test("log2FpSparkSql tracks math.log2 within 2e-5 across the domain") {
    val out = values.toDF("x")
      .selectExpr("x", s"${FixedPoint.log2FpSparkSql("x")} AS fp")
      .as[(Long, Long)].collect()
    out.foreach { case (x, fp) =>
      val err = math.abs(fp.toDouble / 65536.0 - math.log(x.toDouble) / math.log(2.0))
      assert(err < 2e-5, s"x=$x fp=$fp err=$err")
    }
    // exact at powers of two (the bit-length anchor)
    val exact = out.toMap
    Seq(1L, 2L, 65536L, 1048576L).foreach { p =>
      assert(exact(p) % 65536 == 0 && exact(p) / 65536 ==
        (63 - java.lang.Long.numberOfLeadingZeros(p)), s"power of two $p")
    }
  }

  test("log2FpSparkSql is monotone non-decreasing") {
    val sorted = values.distinct.sorted
    val fp = sorted.toDF("x")
      .selectExpr("x", s"${FixedPoint.log2FpSparkSql("x")} AS fp")
      .orderBy($"x").as[(Long, Long)].collect().map(_._2)
    assert(fp.zip(fp.tail).forall { case (a, b) => a <= b })
  }

  test("log2FpRef matches the SQL algorithm bit-for-bit") {
    val out = values.toDF("x")
      .selectExpr("x", s"${FixedPoint.log2FpSparkSql("x")} AS fp")
      .as[(Long, Long)].collect()
    out.foreach { case (x, fp) => assert(fp == FixedPoint.log2FpRef(x), s"x=$x") }
  }

  // Wide domain: the ppb-ceiling lift for DSIR/KL/surprisal depends on
  // these values staying exact over the FULL positive int64 range.
  private val wideValues: Seq[Long] =
    Seq(1L, 2L, (1L << 31) - 1, 1L << 31, (1L << 31) + 1, 999999937L,
      1000000007L * 3, 1L << 45, (1L << 62) - 1, 1L << 62, Long.MaxValue,
      10000000000L, 1000000000000L, 10000000000000L) ++ // 1e10, 1e12, 1e13
      (1 to 50).map { i =>
        val r = new scala.util.Random(1000 + i)
        (math.abs(r.nextLong()) % (Long.MaxValue - 1)) + 1
      }

  test("wide staging tracks math.log2 within 2e-5 over ALL positive int64") {
    import FixedPoint._
    val out = wideValues.toDF("x")
      .selectExpr("x", s"${wideShiftSparkSql("x")} AS s",
        s"${wideMantissaSparkSql("x")} AS m")
      .selectExpr("x", s"${wideFromStagedSparkSql("s", "m")} AS fp")
      .as[(Long, Long)].collect()
    out.foreach { case (x, fp) =>
      val err = math.abs(fp.toDouble / 65536.0 - math.log(x.toDouble) / math.log(2.0))
      assert(err < 2e-5, s"x=$x fp=$fp err=$err")
      assert(fp == FixedPoint.log2FpRefWide(x), s"ref mismatch x=$x")
    }
  }

  test("wide form equals narrow form verbatim below 2^31") {
    import FixedPoint._
    val out = values.toDF("x")
      .selectExpr("x", s"${wideShiftSparkSql("x")} AS s",
        s"${wideMantissaSparkSql("x")} AS m",
        s"${log2FpSparkSql("x")} AS narrow")
      .selectExpr("x", "narrow", s"${wideFromStagedSparkSql("s", "m")} AS wide")
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, n, w) => assert(n == w, s"x=$x narrow=$n wide=$w") }
  }

  // exp2: the inverse primitive (exponentiated-gradient domain weights)

  test("exp2FpRef tracks math.pow(2, x/2^16) within 3e-7 relative — exhaustive fractions") {
    // every fraction at integer part 0 (the constant-product path), plus
    // every integer part at a few fractions (the shift path)
    // error budget: < 3e-7 relative from the Q28 product chain, plus one
    // Q16 ulp of output quantization (the final floor to 2^16 scale —
    // dominant near 1.0, vanishing relatively as the value grows)
    def ok(x: Long): Unit = {
      val got = FixedPoint.exp2FpRef(x).toDouble / 65536.0
      val want = math.pow(2.0, x / 65536.0)
      assert(math.abs(got - want) < 1.5 / 65536.0 + 3e-7 * want,
        s"x=$x got=$got want=$want")
    }
    (0 until 65536).foreach(f => ok(f.toLong))
    for (ip <- 0 to 31; f <- Seq(0L, 1L, 21845L, 65535L)) ok(ip * 65536L + f)
    ok(32L * 65536) // the domain ceiling
  }

  test("exp2FpSparkSql matches the JVM reference bit-for-bit") {
    val xs = (Seq(0L, 1L, 2L, 65535L, 65536L, 65537L, 131072L,
      32 * 65536L, 21 * 65536L + 12345L) ++
      (1 to 60).map(i => math.abs(new scala.util.Random(7 * i).nextLong()) % (32L * 65536 + 1)))
      .distinct
    val out = xs.toDF("x")
      .selectExpr("x", s"${FixedPoint.exp2FpSparkSql("x")} AS e")
      .as[(Long, Long)].collect()
    out.foreach { case (x, e) =>
      assert(e == FixedPoint.exp2FpRef(x), s"x=$x sql=$e ref=${FixedPoint.exp2FpRef(x)}")
    }
  }

  test("exp2 is monotone and round-trips log2 within the combined error") {
    val fp = (0L to 32L * 65536 by 4099).map(FixedPoint.exp2FpRef)
    assert(fp.zip(fp.tail).forall { case (a, b) => a <= b })
    // exp2(log2(x)) ≈ x: log2 side carries 2e-5 log-units of error
    Seq(1L, 3L, 10L, 999L, 65536L, 123456789L, (1L << 31) - 1).foreach { x =>
      val rt = FixedPoint.exp2FpRef(FixedPoint.log2FpRef(x)).toDouble / 65536.0
      assert(math.abs(rt / x.toDouble - 1.0) < 3e-5, s"x=$x roundtrip=$rt")
    }
  }
}
