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
          sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_v_$name")
        }: _*)
      .select(inline(array(entries: _*)))
  }

  /** Uniqueness of `keyCols`: violations = rows beyond the first per
    * duplicated key (= n_rows − n_distinct_keys). */
  def uniqueKey(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .agg(sum(col("_c")).as("n_checked"),
        (sum(col("_c")) - count(lit(1))).as("n_violations"))
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
        sum(when(col("_present").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
  }

  /** Union of check families into the one audit table. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
}
