package graft.operators

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PrefixSum must equal the single-partition global window row-for-row —
  * including descending orders, duplicate order keys with tie-breaks,
  * decimal values, and more partitions than rows. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("running totals equal the global-window cumulative sum (asc and desc)") {
    val rnd = new Random(3)
    val rows = (1 to 5000).map(i => (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "k", "v")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq($"k".desc, $"id") else Seq($"k", $"id")
      val got = PrefixSum.withRunningTotals(df, ord,
          Seq(($"v", "cum"), (lit(1L), "rk")), nParts = 7)
        .select($"id", $"cum", $"rk")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val w = Window.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, 0)
      val want = df
        .withColumn("cum", sum($"v").over(w))
        .withColumn("rk", sum(lit(1L)).over(w))
        .select($"id", $"cum", $"rk")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === want, s"desc=$desc")
    }
  }

  test("the explicit ntile formula on PrefixSum ranks equals Spark's ntile") {
    val rnd = new Random(9)
    for (n <- Seq(7, 100, 1003)) {
      val df = (1 to n).map(i => (i.toLong, rnd.nextInt(500).toLong)).toDF("id", "v")
      val w = Window.orderBy($"v".desc, $"id")
      val want = df.withColumn("d", ntile(10).over(w).cast("bigint"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("d")).toMap
      val got = PrefixSum.withRunningTotals(df, Seq($"v".desc, $"id"),
          Seq((lit(1L), "rk")), nParts = 5)
        .crossJoin(df.agg(count(lit(1)).as("n")))
        .withColumn("d",
          when($"rk" <= ($"n" % 10) * (expr("n div 10") + 1),
            expr("(rk - 1) div (n div 10 + 1) + 1"))
            .otherwise(expr(
              "n % 10 + (rk - n % 10 * (n div 10 + 1) - 1) div (n div 10) + 1"))
            .cast("bigint"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("d")).toMap
      assert(got === want, s"n=$n")
    }
  }

  test("decimal values and more partitions than rows") {
    val df = Seq((1L, BigDecimal("10.25")), (2L, BigDecimal("0.75")),
      (3L, BigDecimal("5.00"))).toDF("id", "v")
    val got = PrefixSum.withRunningTotals(df, Seq($"id"), Seq(($"v", "cum")),
        nParts = 16)
      .orderBy($"id").select($"cum".cast("string")).as[String].collect()
    assert(got.map(BigDecimal(_)) ===
      Array(BigDecimal("10.25"), BigDecimal("11.00"), BigDecimal("16.00")))
  }
}
