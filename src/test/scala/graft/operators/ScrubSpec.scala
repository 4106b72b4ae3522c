package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "reach me at jo.doe+spam@mail.example.org or 555-867-5309 thanks"),
    (2L, "servers 10.0.0.1 and 192.168.255.3 are fine"),
    (3L, "no pii here at all"),
    (4L, "two mails a@b.co c@d.io one ip 8.8.8.8"),
    (5L, "")).toDF("doc_id", "text")

  test("counts and redacts each category") {
    val out = Scrub.redactPii(fixture, "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_email", $"n_phone", $"n_ipv4", $"text_redacted")
      .collect()

    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1 && out(0).getInt(3) == 0)
    assert(out(0).getString(4) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(1).getInt(3) == 2)
    assert(out(1).getString(4) == "servers <IP> and <IP> are fine")
    assert(out(2).getString(4) == "no pii here at all")
    assert(out(3).getInt(1) == 2 && out(3).getInt(3) == 1)
    assert(out(3).getString(4) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    assert(out(4).getInt(1) == 0 && out(4).getString(4) == "")
  }

  test("redaction is idempotent (a scrubbed corpus re-scrubs to itself)") {
    val once = Scrub.redactPii(fixture, "text")
      .select($"doc_id", $"text_redacted".as("text"))
    val twice = Scrub.redactPii(once, "text")
      .select($"doc_id", $"text_redacted".as("text"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("piiStats totals match per-doc counts") {
    val row = Scrub.piiStats(fixture, "text").collect()(0)
    assert(row.getLong(row.fieldIndex("total_email")) == 3L)
    assert(row.getLong(row.fieldIndex("docs_email")) == 2L)
    assert(row.getLong(row.fieldIndex("total_phone")) == 1L)
    assert(row.getLong(row.fieldIndex("total_ipv4")) == 3L)
    assert(row.getLong(row.fieldIndex("docs_ipv4")) == 2L)
  }

  test("seeded corpus: every synthetic insertion is found and redacted") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val scrubbed = Scrub.redactPii(Scrub.seedSyntheticPii(docs), "text")
    val bad = scrubbed.filter(
      ($"doc_id" % 7 === 0 && $"n_email" =!= 1) ||
      ($"doc_id" % 5 === 0 && $"n_phone" =!= 1) ||
      ($"doc_id" % 11 === 0 && $"n_ipv4" =!= 1) ||
      $"text_redacted".rlike("@|\\d{3}-\\d{3}-\\d{4}|\\d+\\.\\d+\\.\\d+\\.\\d+"))
    assert(bad.isEmpty)
  }

  test("scrub plan is a zero-shuffle scan-transform") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val plan = Scrub.redactPii(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("geometric noise: inverse CDF at the cut points, symmetry, mass") {
    import org.apache.spark.sql.functions.col
    // exact boundary behavior at the first/middle/last thresholds
    val cuts = Seq(0L -> -8L, 11184809L -> -8L, 11184810L -> -7L,
      1431655764L -> -1L, 1431655765L -> 0L, 2863311529L -> 0L,
      2863311530L -> 1L, 4283782484L -> 7L, 4283782485L -> 8L,
      4294967295L -> 8L)
    val got = cuts.map(_._1).toDF("u")
      .select(Scrub.geometricNoise(col("u")).as("z")).as[Long].collect().toSeq
    assert(got === cuts.map(_._2))
    // over the uniform hash family: mean ~0, ~1/3 of draws exactly 0
    val n = 30000
    val zs = (1 to n).map(_.toString).toDF("k")
      .select(Scrub.geometricNoise(
        graft.functions.TextFunctions.hash32(col("k"), 55)).as("z"))
      .as[Long].collect()
    assert(zs.forall(z => z >= -8 && z <= 8))
    assert(math.abs(zs.sum.toDouble / n) < 0.05)
    val zeroShare = zs.count(_ == 0).toDouble / n
    assert(math.abs(zeroShare - 1.0 / 3) < 0.02, s"P(Z=0) $zeroShare")
  }

  test("dpNoisedCounts: deterministic, clamped at zero, count plus noise") {
    val df = (1 to 100).map(i => (i.toLong, if (i <= 98) "big" else "tiny"))
      .toDF("id", "g")
    val a = Scrub.dpNoisedCounts(df, "g", seed = 55).orderBy("g").collect()
    val b = Scrub.dpNoisedCounts(df, "g", seed = 55).orderBy("g").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val n = if (r.getString(0) == "big") 98L else 2L
      val z = r.getAs[Long]("noised_count")
      assert(z >= math.max(0L, n - 8) && z <= n + 8)
    }
  }
}
