package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftExtensions

class GroupedTopKRewriteSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[4]")
      .appName("topk-rewrite").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.graft.groupedTopK", "always")
      .withExtensions(new GraftExtensions).getOrCreate()
    try f(spark) finally {
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }

  test("window top-k pattern is rewritten to the bounded aggregate and matches results") {
    withExtSession { spark =>
      import spark.implicits._
      val df = spark.range(0, 10000)
        .select(($"id" % 7).as("g"), $"id",
          (($"id" * 2654435761L) % 1000).cast("double").as("score"))
      val w = Window.partitionBy($"g").orderBy($"score".desc)
      val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)

      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("top_k_rows"), "rewrite should fire:\n" + plan)
      assert(!plan.contains("Window"), "window should be gone:\n" + plan)

      val got = q.select($"g", $"rk", $"id", $"score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3))).toSet
      // expected via plain Scala (ties broken arbitrarily -> compare scores)
      val rows = df.select($"g", $"id", $"score")
        .as[(Long, Long, Double)].collect()
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(_._3).sorted(Ordering[Double].reverse).take(3)
          .zipWithIndex.map { case (s, i) => (g, i + 1, s) }.toSeq
      }.toSet
      assert(got == exp)
    }
  }

  test("ascending order and rk < k variants rewrite too") {
    withExtSession { spark =>
      import spark.implicits._
      val df = spark.range(0, 1000)
        .select(($"id" % 5).as("g"), (($"id" * 131) % 97).cast("double").as("score"))
      val w = Window.partitionBy($"g").orderBy($"score".asc)
      val q = df.withColumn("rk", row_number().over(w)).filter($"rk" < 4)
      assert(q.queryExecution.optimizedPlan.toString.contains("top_k_rows"))
      val got = q.groupBy($"g").agg(max($"score")).as[(Long, Double)].collect().toMap
      val exp = df.as[(Long, Double)].collect().groupBy(_._1)
        .map { case (g, rs) => g -> rs.map(_._2).sorted.take(3).max }
      assert(got == exp)
    }
  }

  test("auto mode: narrow primitive payload keeps the window; wide payload rewrites") {
    withExtSession { spark =>
      import spark.implicits._
      spark.conf.set("spark.graft.groupedTopK", "auto")
      try {
        val narrow = spark.range(0, 100)
          .select(($"id" % 5).as("g"), ($"id" % 13).cast("double").as("score"))
        val w = Window.partitionBy($"g").orderBy($"score".desc)
        val qn = narrow.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        assert(qn.queryExecution.optimizedPlan.toString.contains("Window"),
          "narrow rows: sort wins, no rewrite")
        val wide = narrow.withColumn("vec",
          expr("transform(sequence(1, 8), i -> cast(g as double))"))
        val qw = wide.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        assert(qw.queryExecution.optimizedPlan.toString.contains("top_k_rows"),
          "array payload: shuffle-bound, rewrite")
      } finally spark.conf.set("spark.graft.groupedTopK", "always")
    }
  }

  test("null and NaN scores rank exactly like the window they replace") {
    withExtSession { spark =>
      import spark.implicits._
      // scores: nulls, NaNs, and plain doubles mixed per group
      val df = spark.range(0, 300)
        .select(($"id" % 3).as("g"), $"id",
          when($"id" % 7 === 0, lit(null).cast("double"))
            .when($"id" % 11 === 0, lit(Double.NaN))
            .otherwise(($"id" % 13).cast("double")).as("score"))
      for (ord <- Seq($"score".desc, $"score".asc,
          $"score".desc_nulls_first, $"score".asc_nulls_last)) {
        val w = Window.partitionBy($"g").orderBy(ord)
        val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        assert(q.queryExecution.optimizedPlan.toString.contains("top_k_rows"),
          "rewrite should fire on nullable keys")
        // compare the multiset of (g, score) — tie order within equal
        // scores is arbitrary in both implementations
        val got = q.select($"g", $"score").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) "null"
            else { val d = r.getDouble(1); if (d.isNaN) "nan" else d.toString }))
          .groupBy(identity).view.mapValues(_.length).toMap
        spark.conf.set("spark.graft.groupedTopK", "never")
        val exp = try {
          val p = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
          assert(!p.queryExecution.optimizedPlan.toString.contains("top_k_rows"))
          p.select($"g", $"score").collect()
            .map(r => (r.getLong(0), if (r.isNullAt(1)) "null"
            else { val d = r.getDouble(1); if (d.isNaN) "nan" else d.toString }))
            .groupBy(identity).view.mapValues(_.length).toMap
        } finally spark.conf.set("spark.graft.groupedTopK", "always")
        assert(got == exp, s"order $ord")
      }
    }
  }

  test("multi-key windows rewrite with exact tie-break preservation") {
    withExtSession { spark =>
      import spark.implicits._
      // score has heavy ties; id tie-break makes the ranking total, so the
      // rewrite must reproduce the window's output EXACTLY, row for row
      val df = spark.range(0, 5000)
        .select(($"id" % 7).as("g"), $"id", ($"id" % 5).cast("double").as("score"))
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
      val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
      assert(q.queryExecution.optimizedPlan.toString.contains("top_k_rows"),
        "multi-key row_number must rewrite:\n" + q.queryExecution.optimizedPlan)
      val got = q.select($"g", $"rk", $"id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSet
      spark.conf.set("spark.graft.groupedTopK", "never")
      val exp = try {
        df.withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
          .select($"g", $"rk", $"id", $"score")
          .as[(Long, Int, Long, Double)].collect().toSet
      } finally spark.conf.set("spark.graft.groupedTopK", "always")
      assert(got == exp)
    }
  }

  test("integral sort keys (the TF-IDF shape) rewrite with exact results") {
    withExtSession { spark =>
      import spark.implicits._
      // bigint score desc + string term asc: the q49/q40 window shape
      val df = spark.range(0, 3000)
        .select(($"id" % 11).as("g"),
          (($"id" * 2654435761L) % 50).as("score"),
          concat(lit("t"), ($"id" % 17).cast("string")).as("term"))
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"term".asc)
      val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      assert(q.queryExecution.optimizedPlan.toString.contains("top_k_rows"),
        "long+string keys must rewrite:\n" + q.queryExecution.optimizedPlan)
      val got = q.select($"g", $"rk", $"score", $"term")
        .as[(Long, Int, Long, String)].collect().sorted
      spark.conf.set("spark.graft.groupedTopK", "never")
      val exp = try {
        df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
          .select($"g", $"rk", $"score", $"term")
          .as[(Long, Int, Long, String)].collect().sorted
      } finally spark.conf.set("spark.graft.groupedTopK", "always")
      // multiset equality is NOT enough here: (score, term) is a total
      // order only per (g, score, term) — compare sorted sequences
      assert(got.toSeq == exp.toSeq)
    }
  }

  test("non-matching windows (rank) are left alone") {
    withExtSession { spark =>
      import spark.implicits._
      val df = spark.range(0, 100)
        .select(($"id" % 5).as("g"), $"id", ($"id" % 13).cast("double").as("score"))
      val q2 = df.withColumn("rk", rank().over(Window.partitionBy($"g").orderBy($"score".desc)))
        .filter($"rk" <= 3)
      assert(q2.queryExecution.optimizedPlan.toString.contains("Window"),
        "rank() has different tie semantics; must not rewrite")
    }
  }
}
