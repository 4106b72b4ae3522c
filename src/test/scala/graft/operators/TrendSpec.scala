package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("corrPairs: perfect, inverse, and constant columns") {
    val df = Seq(
      (1.0, 2.0, 9.0, 5.0),
      (2.0, 4.0, 8.0, 5.0),
      (3.0, 6.0, 7.0, 5.0),
      (4.0, 8.0, 6.0, 5.0)).toDF("x", "y", "z", "k")
    val out = Trend.corrPairs(df, Seq("x", "y", "z", "k"))
      .orderBy($"col_a", $"col_b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    assert(out(("x", "y")) == Some(1.0))   // y = 2x
    assert(out(("x", "z")) == Some(-1.0))  // z = 10 - x
    assert(out(("x", "k")) == None)        // constant column: null, not NaN
    assert(out(("y", "z")) == Some(-1.0))
    assert(out.size == 6)
  }

  test("corrPairs matches Spark's built-in corr within rounding") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val ours = Trend.corrPairs(li, Seq("l_quantity", "l_extendedprice"))
      .collect()(0).getDouble(2)
    val ref = li.agg(corr($"l_quantity", $"l_extendedprice")).collect()(0).getDouble(0)
    assert(math.abs(ours - ref) < 1e-4, s"$ours vs $ref")
  }

  test("corrPairs is partitioning-invariant (exact decimal moments)") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val a = Trend.corrPairs(li.repartition(1), cols).orderBy($"col_a", $"col_b").collect()
    val b = Trend.corrPairs(li.repartition(7), cols).orderBy($"col_a", $"col_b").collect()
    assert(a.toSeq == b.toSeq)
  }
}
