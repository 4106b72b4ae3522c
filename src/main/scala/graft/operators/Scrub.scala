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

  /** Inverse-CDF cut points of the two-sided geometric distribution at
    * α = 1/2 (ε = ln 2) on the 32-bit hash domain, tails clamped to ±8.
    * α = 1/2 makes every CDF value an exact dyadic·(1/3) rational, so the
    * thresholds are exact integers and any engine draws the identical
    * noise from the identical hash. Entry k = floor(P(Z <= z_k)·2^32) for
    * z = −8..7 (u past the last → +8). */
  private val GeomThresholds: Seq[(Int, Long)] = Seq(
    -8 -> 11184810L, -7 -> 22369621L, -6 -> 44739242L, -5 -> 89478485L,
    -4 -> 178956970L, -3 -> 357913941L, -2 -> 715827882L,
    -1 -> 1431655765L, 0 -> 2863311530L, 1 -> 3579139413L,
    2 -> 3937053354L, 3 -> 4116010325L, 4 -> 4205488810L,
    5 -> 4250228053L, 6 -> 4272597674L, 7 -> 4283782485L)

  /** Two-sided geometric noise (ε = ln 2, clamped to ±8) drawn from a
    * 32-bit hash column. */
  def geometricNoise(u: Column): Column =
    GeomThresholds.foldRight(lit(8): Column) { case ((z, t), els) =>
      when(u < t, lit(z)).otherwise(els)
    }.cast("long")

  /** DuckDB spelling of [[geometricNoise]] over a hash SQL expression. */
  def geometricNoiseSql(u: String): String =
    GeomThresholds.map { case (z, t) => s"WHEN $u < $t THEN ($z)" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Differentially private count release: per-group counts with
    * two-sided geometric noise at ε = ln 2 — the geometric mechanism,
    * the discrete counterpart of Laplace and exactly ε-DP for
    * sensitivity-1 counting queries (only COUNTS are released; sums have
    * unbounded per-row sensitivity and need clamping first). The noise
    * draw is keyed on the GROUP value (one draw per released cell) via
    * the portable hash, so a release is reproducible run-to-run and
    * engine-to-engine for a fixed seed — rotate the seed per release, or
    * the reproducibility that makes it testable becomes a privacy leak
    * across releases. Negative noised counts clamp to 0 (post-processing
    * keeps DP). Scale shape: one map-combined groupBy; noise is a narrow
    * expression over the |groups|-row aggregate. */
  def dpNoisedCounts(df: DataFrame, groupCol: String, seed: Int): DataFrame = {
    import graft.functions.TextFunctions.hash32
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .select(col(groupCol),
        greatest(col("_n") +
          geometricNoise(hash32(col(groupCol).cast("string"), seed)),
          lit(0L)).as("noised_count"))
  }
}
