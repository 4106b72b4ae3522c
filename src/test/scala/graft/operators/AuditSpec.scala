package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("row checks: one scan, nulls count as violations") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, -1.0), (3L, null), (null, 2.0))
      .toDF("id", "v")
    val out = Audit.rowChecks(df, Seq(
        "v_nonneg" -> (col("v") >= 0),      // -1 violates; null v violates
        "id_not_null" -> col("id").isNotNull))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("id_not_null", 4L, 1L), ("v_nonneg", 4L, 2L)))
  }

  test("unique key: violations are rows beyond the first per dup key") {
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L), (2L, 1L))
      .toDF("a", "b")
    val out = Audit.uniqueKey(df, "pk", Seq("a", "b"))
      .as[(String, Long, Long)].head()
    // 6 rows, 3 distinct keys -> 3 violations
    assert(out == (("pk", 6L, 3L)))
  }

  test("foreign key: orphans and null child keys both violate") {
    val child = Seq[java.lang.Long](10L, 10L, 20L, 99L, null).toDF("k")
    val parent = Seq(10L, 20L, 30L).toDF("p")
    val out = Audit.foreignKey(child, "k", parent, "p", "fk")
      .as[(String, Long, Long)].head()
    assert(out == (("fk", 5L, 2L))) // 99 orphan + null key
  }

  test("report unions families into one constraint-sized table") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val r = Audit.report(
      Audit.rowChecks(df, Seq("a_pos" -> (col("a") > 0))),
      Audit.uniqueKey(df, "u", Seq("a")))
    assert(r.columns.toSeq == Seq("check_name", "n_checked", "n_violations"))
    assert(r.count() == 2)
  }
}
