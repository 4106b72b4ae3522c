package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ-style expectation gate a
  * pipeline runs before promoting a batch): every check emits one row
  * `(check, n_checked, n_violations)`, so the audit result is a tiny
  * constraint-sized table whatever the input size.
  *
  * Scale shape per check family:
  *  - row predicates: ALL checks share ONE scan — a single aggregate of
  *    conditional counts, unpivoted to rows driver-free (`inline`);
  *  - key uniqueness: one map-side-combined groupBy on the key; the
  *    violation count is `n_rows − n_distinct_keys`, read off two sums;
  *  - referential integrity: one equi-join against the DISTINCT parent
  *    key set (broadcast when small, shuffle otherwise — Catalyst/AQE
  *    decides), counting orphans.
  *
  * Reference analog: the reference validates readings field-by-field on
  * ingest (`pipeline/kafka_consumer.py:150-171` discards malformed
  * messages); this is that gate as a set-level batch operator.
  */
object Audit {

  /** All `checks` (name → boolean predicate that GOOD rows satisfy) in
    * one scan. Null predicate results count as violations — an audit
    * must never let a null comparison pass silently. */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one row check")
    val entries = checks.map { case (name, _) =>
      struct(lit(name).as("check_name"), col("_n").as("n_checked"),
        col(s"_v_$name").as("n_violations"))
    }
    df.agg(
        count(lit(1)).as("_n"),
        checks.map { case (name, pred) =>
          coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
            .as(s"_v_$name")
        }: _*)
      .select(inline(array(entries: _*)))
  }

  /** Uniqueness of `keyCols`: violations = rows beyond the first per
    * duplicated key (= n_rows − n_distinct_keys). */
  def uniqueKey(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum(col("_c")), lit(0L)).as("n_checked"),
        (coalesce(sum(col("_c")), lit(0L)) - count(lit(1))).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))

  /** Referential integrity: child rows whose (non-null) key has no match
    * in the parent's key set. Null child keys are orphans too — an FK
    * audit that skips nulls belongs in a separate nullability check. */
  def foreignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val p = parent.select(col(parentKey).as("_pk")).distinct()
      .withColumn("_present", lit(true))
    child.select(col(childKey).as("_ck"))
      .join(p, col("_ck") === col("_pk"), "left_outer")
      .agg(count(lit(1)).as("n_checked"),
        coalesce(sum(when(col("_present").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_violations"))
      .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
  }

  /** Union of check families into the one audit table. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)

  /** [[rowChecks]] as a running aggregation: per-row unpivot to
    * (check_name, violation) then a keyed count/sum — a shape that is
    * ALSO streaming-legal (no window, no distinct), so the same call on
    * a readStream is the continuous data-quality monitor: per-trigger
    * updated totals per check, commutative sums ⇒ drained stream ≡
    * batch [[rowChecks]] exactly (AuditSpec proves it). Prefer
    * [[rowChecks]] for batch (single 1-row aggregate, no unpivoted
    * row expansion before the partial agg — cheaper at corpus scale). */
  def rowCheckCounters(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one row check")
    val entries = checks.map { case (name, pred) =>
      struct(lit(name).as("check_name"),
        when(coalesce(pred, lit(false)), 0L).otherwise(1L).as("_v"))
    }
    df.select(inline(array(entries: _*)))
      .groupBy(col("check_name"))
      .agg(count(lit(1)).as("n_checked"), sum(col("_v")).as("n_violations"))
  }

  /** ANALYZE-style column profile: per column the row/null/exact-distinct
    * counts and min/max (rendered through `render`, which must be an
    * engine-portable string form — e.g. plain cast for numerics/strings,
    * an explicit date_format for timestamps). One narrow single-column
    * aggregate per column, unioned: each branch reads ONLY its column
    * from parquet (total bytes ≡ one all-column scan) and plans the
    * single distinct as a plain two-level aggregate — never the
    * multi-distinct Expand, which replicates every row |cols|+1 times
    * and turns profiling CPU-bound (measured 14× slower on a 4-column
    * 600 k-row profile). Branches are independent stages, so they also
    * fill the cluster concurrently. Output is |cols| rows. */
  def columnProfile(df: DataFrame, cols: Seq[(String, Column => Column)]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    cols.map { case (c, render) =>
      df.select(col(c).as("_v"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("_v").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("_v")).as("n_distinct"),
          // min/max over the NATIVE ordering, rendered afterwards
          render(min(col("_v"))).as("min_value"),
          render(max(col("_v"))).as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity audit over a quasi-identifier column set: how many QI
    * groups (and rows) fall below the anonymity threshold `k` — the
    * re-identification-risk gate a corpus passes before release (a group
    * of size < k means those rows are attributable to < k candidates).
    * One groupBy on the QI columns, then a constraint-sized 1-row report:
    * group/row totals, violating groups, rows at risk, and the smallest
    * group observed. Null QI values form their own group (they are a
    * quasi-identifier value like any other). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, "k-anonymity needs k >= 2")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(
        coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("_c") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_small_groups"),
        coalesce(sum(when(col("_c") < k, col("_c")).otherwise(0L)), lit(0L))
          .as("n_risky_rows"),
        coalesce(min(col("_c")), lit(0L)).as("min_group_size"))
      .select(lit(k.toLong).as("k"), col("n_rows"), col("n_groups"),
        col("n_small_groups"), col("n_risky_rows"), col("min_group_size"))
  }

  /** Order-independent table checksum: Σ over rows of the portable
    * 32-bit hash of the unit-separator-joined column renderings, summed
    * in decimal(38) (no overflow at any row count). Equal tables always
    * match, whatever partitioning or order produced them; a mismatch
    * proves a difference (matches can collide like any hash). The
    * dataset-versioning primitive: one row out, one map-side-combinable
    * aggregate in. */
  def tableChecksum(df: DataFrame, cols: Seq[String], seed: Int = 7): DataFrame = {
    import graft.functions.TextFunctions.hash32
    // 0x1F unit separator: unambiguous unless a value embeds it
    val joined = concat_ws("\u001f", cols.map(c => col(c).cast("string")): _*)
    df.select(hash32(joined, seed).as("_h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_h").cast("decimal(38,0)")).as("checksum"))
      .select(col("n_rows"), col("checksum").cast("decimal(38,0)").as("checksum"))
  }

  /** Functional-dependency audit: for each candidate FD `lhs → rhs`, how
    * many lhs groups map to more than one distinct rhs value, and how
    * many rows sit in those ambiguous groups. The schema-discovery /
    * denormalization-safety check: an FD that holds licenses collapsing
    * rhs into a dimension keyed by lhs; a "should-hold" FD that fails is
    * a data-integrity incident.
    *
    * Scale shape per FD: one map-side-combinable groupBy on lhs with a
    * distinct-count of rhs (Spark plans it as two partial aggregates —
    * no row ever leaves its lhs hash partition twice), folded to a
    * single summary row. FDs are audited independently; the union is
    * fd-count sized. */
  def fdAudit(df: DataFrame, table: String,
      fds: Seq[(String, Seq[String], String)]): DataFrame = {
    require(fds.nonEmpty, "at least one candidate FD")
    fds.map { case (name, lhs, rhs) =>
      df.groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("n_rows"), countDistinct(col(rhs)).as("nd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating_groups"),
          sum(when(col("nd") > 1, col("n_rows")).otherwise(0L))
            .as("n_ambiguous_rows"))
        // empty input: the sums are NULL — coalesce to 0 so the degenerate
        // answer is a deterministic (0 groups, 0 violations, holds=true)
        // rather than NULLs (matches the q196 oracle's coalesce)
        .select(lit(s"$table.$name").as("fd"), col("n_groups"),
          coalesce(col("n_violating_groups"), lit(0L)).as("n_violating_groups"),
          coalesce(col("n_ambiguous_rows"), lit(0L)).as("n_ambiguous_rows"),
          (coalesce(col("n_violating_groups"), lit(0L)) === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** First-significant-digit profile vs Benford's law over a positive
    * integer column (pass money as exact cents): per digit, the observed
    * share and its deviation from log10(1+1/d), both in ppm. The
    * fabricated-data / corruption screen auditors run on financial
    * columns — naturally-grown magnitudes follow Benford, injected or
    * truncated ones don't.
    *
    * The expected shares are fixed integer constants (no runtime libm —
    * engines disagree in the last ulp of log10), and the observed side is
    * one conditional-count aggregate over a digit extracted from the
    * integer's decimal string: portable, scan-shaped, 9 rows out. */
  def benford(df: DataFrame, intCol: Column): DataFrame = {
    val expected = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L)
    val digit = substring(intCol.cast("string"), 1, 1).cast("bigint")
    val aggs = count(lit(1)).as("n") +: (1 to 9).map(d =>
      sum(when(digit === d, 1L).otherwise(0L)).as(s"n_$d"))
    val counts = df.filter(intCol > 0).agg(aggs.head, aggs.tail: _*)
    val rows = (1 to 9).map { d =>
      // n = 0 (no positive values at all): emit share 0 and deviation =
      // the full expected share, not a NULL div-by-zero readout
      val share = when(col("n") > 0, expr(s"n_$d * 1000000 div n"))
        .otherwise(0L)
      struct(lit(d.toLong).as("digit"), col(s"n_$d").as("n"),
        share.as("share_ppm"),
        lit(expected(d)).as("expected_ppm"),
        abs(share - expected(d)).as("dev_ppm"))
    }
    counts.select(inline(array(rows: _*))).orderBy(col("digit"))
  }
}
