package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing pass every
  * production training-data pipeline runs before anything else touches the
  * corpus (C4 and its descendants scrub emails/phones/IPs; the reference
  * pipeline has no text corpus so this is a pure §2.12 extension).
  *
  * Scale shape: a per-row regex map — `RegExpExtractAll` + `RegExpReplace`
  * are codegen'd Catalyst expressions, so the whole pass is one narrow
  * scan-transform with ZERO shuffle; at 100 TB it parallelizes trivially
  * and pushes column pruning straight to the parquet scan (only the text
  * and id columns are read).
  *
  * Cross-engine determinism: every pattern is written in the common subset
  * of Java regex (Spark) and RE2 (DuckDB) — character classes, `\d`, `\b`,
  * bounded repetition — so the DuckDB oracle reproduces match sets and
  * replacements bit-for-bit. Counts are taken on the ORIGINAL text (order
  * independent); replacements apply in declared pattern order (email →
  * phone → IPv4 by default), identically on both engines.
  */
object Scrub {

  /** One scrub rule: `name` keys the per-doc count column `n_<name>`. */
  final case class PiiPattern(name: String, regex: String, replacement: String)

  /** RFC-ish email, ASCII subset (the practical scrubbing target). */
  val email: PiiPattern = PiiPattern(
    "email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** NANP-style dashed phone number (555-867-5309). */
  val phone: PiiPattern = PiiPattern(
    "phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")

  /** Dotted-quad IPv4 (syntactic — octet range is not validated, matching
    * the common fast-scrub behavior). Declared AFTER phone so a phone
    * number is never half-eaten by the IP rule on either engine. */
  val ipv4: PiiPattern = PiiPattern(
    "ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  val defaultPatterns: Seq[PiiPattern] = Seq(email, phone, ipv4)

  /** Adds one `n_<name>` count column per pattern (matches in the original
    * text) plus `<textCol>_redacted` with all patterns replaced in order.
    * Pure projection — appendable to any scan without a shuffle. */
  def redactPii(df: DataFrame, textCol: String,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    val counts = patterns.map { p =>
      size(regexp_extract_all(col(textCol), lit(p.regex), lit(0)))
        .as(s"n_${p.name}")
    }
    val redacted = patterns.foldLeft(col(textCol)) { (c, p) =>
      regexp_replace(c, lit(p.regex), lit(p.replacement))
    }
    df.select(col("*") +: counts :+ redacted.as(s"${textCol}_redacted"): _*)
  }

  /** Corpus-level scrub report: docs touched and total matches per
    * pattern — one partial-aggregating pass over [[redactPii]]'s counts. */
  def piiStats(df: DataFrame, textCol: String,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    val scrubbed = redactPii(df, textCol, patterns)
    val aggs = patterns.flatMap { p =>
      Seq(sum(col(s"n_${p.name}")).as(s"total_${p.name}"),
        sum(when(col(s"n_${p.name}") > 0, 1L).otherwise(0L))
          .as(s"docs_${p.name}"))
    }
    scrubbed.agg(aggs.head, aggs.tail: _*)
  }

  /** Seeds deterministic synthetic PII into a doc_id-keyed subset of the
    * corpus (the test corpus is PII-free word salad, so the scrub pass
    * needs material to find). Email on doc_id % 7, dashed phone on % 5,
    * dotted-quad IP on % 11 — all derived from doc_id alone, so the DuckDB
    * oracle regenerates the identical corpus ([[seedSql]]). */
  def seedSyntheticPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(id,
      concat(col("text"),
        when(id % 7 === 0,
          concat(lit(" contact u"), id.cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(id % 5 === 0,
          concat(lit(" call 555-"),
            lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((id % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(id % 11 === 0,
          concat(lit(" from 10."), (id % 256).cast("string"), lit(".0."),
            ((id % 200) + 1).cast("string")))
          .otherwise(lit(""))).as("text"))
  }

  /** DuckDB spelling of [[seedSyntheticPii]]'s text expression. */
  val seedSql: String =
    """text ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |       '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
      |       CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END""".stripMargin

  /** DuckDB spelling of one pattern's count over `textExpr`. RE2 accepts
    * the same pattern source, and DuckDB '…' literals are raw (no backslash
    * processing), so the pattern embeds verbatim; group 0 = whole match on
    * both engines. */
  def countSql(textExpr: String, p: PiiPattern): String =
    s"len(regexp_extract_all($textExpr, '${p.regex}', 0))"

  /** DuckDB spelling of the ordered redaction chain ('g' = replace-all,
    * matching Spark's default). */
  def redactSql(textExpr: String,
      patterns: Seq[PiiPattern] = defaultPatterns): String =
    patterns.foldLeft(textExpr) { (e, p) =>
      s"regexp_replace($e, '${p.regex}', '${p.replacement}', 'g')"
    }
}
