package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Mergeable frequency sketching (LLM-pipeline / OLAP extension).
  *
  * A count-min sketch is the bounded-state answer to "how often does each
  * of billions of keys occur" at 100 TB: the sketch is a (depth × width)
  * integer grid — fixed bytes regardless of key cardinality — built in
  * ONE partial-aggregating pass, and grids from different partitions /
  * days / engines merge by cell-wise addition. Estimates overcount only
  * (min over depth rows bounds the collision error), never undercount.
  *
  * Unlike `df.stat.countMinSketch` (JVM-seeded, opaque), this sketch
  * hashes with the repo's portable md5-derived [[hash32]], so the ENTIRE
  * grid — and every estimate read from it — is reproducible bit-for-bit
  * by an independent engine: q93's DuckDB oracle rebuilds the sketch and
  * hash-matches the estimates, making even the approximate path subject
  * to the correctness gate (SketchesSpec only error-bounds the opaque
  * built-ins).
  */
object Sketch {

  /** The sketch grid: (d, b, c) — row d ∈ [0, depth), bucket b ∈
    * [0, width), count c. One shuffle of (depth × items) 8-byte keys. */
  def countMin(items: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val rows = array((0 until depth).map { d =>
      struct(lit(d).as("d"), pmod(hash32(col(keyCol), d), lit(width)).as("b"))
    }: _*)
    items.select(explode(rows).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `keys` (a frame with `keyCol`) against a sketch
    * grid: min over depth rows of the hashed cell — ≥ the true count,
    * with the classic (e/width)·N overestimate bound. The grid is
    * depth×width rows (driver-tiny), so the join broadcasts. */
  def estimate(grid: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = array((0 until depth).map { d =>
      struct(lit(d).as("d"), pmod(hash32(col(keyCol), d), lit(width)).as("b"))
    }: _*)
    keys.select(col(keyCol), explode(probes).as("db"))
      .select(col(keyCol), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(grid), Seq("d", "b"))
      .groupBy(col(keyCol))
      .agg(min(col("c")).as("cm_est"))
  }
}
