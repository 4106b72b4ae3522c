package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) queries — the multi-criteria shortlist
  * operator relational engines lack natively: return the rows no other
  * row beats on ALL criteria (Börzsönyi et al., ICDE 2001). The
  * cheapest-yet-biggest shortlist a "which offers are even worth
  * ranking" stage computes before any weighted scoring.
  *
  * The 2-D case needs no pairwise comparison at all: group to distinct
  * (x, y) value pairs (domain-bounded, never row-bounded), keep only the
  * best y per x, and sweep x in increasing order keeping rows whose y
  * strictly improves on every earlier one — a single cumulative-max
  * window over DISTINCT x values. All integer comparisons; the output is
  * the exact dominance-free set with its member count per point.
  */
object Skyline {

  /** 2-D skyline minimizing `xCol` and maximizing `yCol` (integers).
    * Output: (x, y, n_rows) — the non-dominated value points and how many
    * input rows sit on each, ordered by x ascending (equivalently y
    * ascending: the skyline is a staircase).
    *
    * Dominance is strict in at least one coordinate: ties on BOTH
    * coordinates are one skyline point counted together. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val vc = df
      .groupBy(col(xCol).cast("bigint").as("x"), col(yCol).cast("bigint").as("y"))
      .agg(count(lit(1)).as("n_rows"))
    // same-x domination: only the max-y point per x can survive
    val pm = vc.groupBy(col("x")).agg(max(col("y")).as("y"))
      .join(vc, Seq("x", "y"))
    // cross-x domination: strictly-better y than every cheaper x
    val sweep = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pm.withColumn("_best", max(col("y")).over(sweep))
      .filter(col("_best").isNull || col("y") > col("_best"))
      .select(col("x"), col("y"), col("n_rows"))
      .orderBy(col("x"))
  }
}
