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

  test("column profile: nulls, exact distincts, NATIVE-ordered min/max") {
    val df = Seq[(java.lang.Long, String)]((2L, "b"), (10L, "a"), (null, "a"))
      .toDF("v", "s")
    val out = Audit.columnProfile(df, Seq(
        "v" -> (c => c.cast("string")), "s" -> (c => c)))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    // native ordering: min 2 (string ordering would give "10")
    assert(out == Seq(
      ("s", 3L, 0L, 2L, Some("a"), Some("b")),
      ("v", 3L, 1L, 2L, Some("2"), Some("10"))))
  }

  test("table checksum: order-invariant, difference-sensitive") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "v") // permuted
    val c = Seq((1L, "x"), (2L, "y"), (3L, "w")).toDF("id", "v") // changed
    def ck(df: org.apache.spark.sql.DataFrame) =
      Audit.tableChecksum(df.repartition(3), Seq("id", "v"))
        .select(col("n_rows"), col("checksum").cast("long"))
        .as[(Long, Long)].head()
    assert(ck(a) == ck(b))
    assert(ck(a) != ck(c) && ck(a)._1 == ck(c)._1)
  }

  test("running audit counters on a stream drain to the batch rowChecks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val checks = Seq(
      "v_nonneg" -> (col("v") >= 0.0), "id_odd" -> (col("id") % 2 === 1))
    val rows = Seq((1L, 5.0), (2L, -1.0), (3L, 2.0), (4L, -3.0))
    val mem = MemoryStream[(Long, Double)](spark)
    val q = Audit.rowCheckCounters(mem.toDF().toDF("id", "v"), checks)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("audit_run").start()
    mem.addData(rows.take(2): _*); q.processAllAvailable()
    mem.addData(rows.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("audit_run")
      .as[(String, Long, Long)].collect().toSet
    spark.sql("DROP TABLE audit_run")
    val batch = Audit.rowChecks(rows.toDF("id", "v"), checks)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch && batch ==
      Set(("v_nonneg", 4L, 2L), ("id_odd", 4L, 2L)))
  }

  test("report unions families into one constraint-sized table") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val r = Audit.report(
      Audit.rowChecks(df, Seq("a_pos" -> (col("a") > 0))),
      Audit.uniqueKey(df, "u", Seq("a")))
    assert(r.columns.toSeq == Seq("check_name", "n_checked", "n_violations"))
    assert(r.count() == 2)
  }

  test("empty input: every family reports (0, 0), never null") {
    val e = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = Audit.report(
        Audit.rowChecks(e, Seq("a_pos" -> (col("a") > 0))),
        Audit.uniqueKey(e, "u", Seq("a")),
        Audit.foreignKey(e, "a", Seq((1L, 1L)).toDF("k", "x"), "k", "fk"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a_pos", 0L, 0L), ("fk", 0L, 0L), ("u", 0L, 0L)))
  }

  test("kAnonymity: group sizes vs threshold, nulls form their own group") {
    // groups: (1,x)×3, (1,null)×2, (2,x)×1 → k=3: two small groups, 3 risky rows
    val df = Seq((1, Some("x")), (1, Some("x")), (1, Some("x")),
      (1, None), (1, None), (2, Some("x"))).toDF("qi1", "qi2")
    val out = Audit.kAnonymity(df, Seq("qi1", "qi2"), k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((3L, 6L, 3L, 2L, 3L, 1L)))
    // empty input: zero groups, zero risk, min size 0
    val e = Seq.empty[(Int, String)].toDF("qi1", "qi2")
    val z = Audit.kAnonymity(e, Seq("qi1"), k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(z == ((2L, 0L, 0L, 0L, 0L, 0L)))
  }
}
