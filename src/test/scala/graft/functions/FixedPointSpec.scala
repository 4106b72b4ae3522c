package graft.functions

import graft.SparkSpec

/** Gates the pure-int64 fixed-point log2 that makes DSIR's
  * log-likelihood-ratio weights engine-exact. */
class FixedPointSpec extends SparkSpec {
  import spark.implicits._

  private val values: Seq[Long] =
    Seq(1L, 2L, 3L, 5L, 7L, 10L, 100L, 999L, 4096L, 65535L, 65536L,
      1048575L, 1048576L, 123456789L, 999999937L, (1L << 30) - 1) ++
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) % ((1L << 30) - 2) + 1)

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
}
