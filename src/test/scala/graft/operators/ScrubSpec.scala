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
}
