package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash128, hash32}

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
    * [0, width), count c. The depth hash rows come from independent
    * 32-bit SLOTS of shared md5 digests (a 128-bit digest carries four),
    * so a depth-4 sketch pays ONE md5 per item — 4× less hash work than
    * independent families, with fully independent bits. Map-side partial
    * state is the grid itself, so the shuffle carries depth×width cells
    * per task regardless of item count. */
  def countMin(items: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    items.select(hashRows(col(keyCol), depth, width).as("db"))
      .select(explode(col("db")).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** array of (d, bucket) structs for one key — ⌈depth/4⌉ md5 digests,
    * each serving four independent 32-bit slots. */
  private def hashRows(key: org.apache.spark.sql.Column, depth: Int,
      width: Int): org.apache.spark.sql.Column = {
    val digests = (0 to (depth - 1) / 4).map(seed => hash128(key, seed))
    array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        pmod(element_at(digests(d / 4), d % 4 + 1), lit(width)).as("b"))
    }: _*)
  }

  /** Point estimates for `keys` (a frame with `keyCol`) against a sketch
    * grid: min over depth rows of the hashed cell — ≥ the true count,
    * with the classic (e/width)·N overestimate bound. The grid is
    * depth×width rows (driver-tiny), so the join broadcasts. */
  def estimate(grid: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    keys.select(col(keyCol), explode(hashRows(col(keyCol), depth, width)).as("db"))
      .select(col(keyCol), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(grid), Seq("d", "b"))
      .groupBy(col(keyCol))
      .agg(min(col("c")).as("cm_est"))
  }

  /** KMV (k-minimum-values) distinct-count estimate per group — the
    * portable alternative to `approx_count_distinct`'s opaque HLL. State
    * per group is the k smallest md5-derived 32-bit key hashes; the
    * estimate is the order-statistic identity (k−1)·2³²/h₍ₖ₎, all
    * integer ops — bit-identical across engines (q94's oracle rebuilds
    * it). Groups with fewer than k distinct hashes report exactly.
    *
    * Sketches merge by unioning min-sets and re-taking the k smallest —
    * same mergeability class as the count-min grid. The k-smallest pass
    * is a rank-k window the GroupedTopKRewrite rule turns into a bounded
    * map-side aggregate: per-task state is k hashes per group, the full
    * distinct-hash set never sorts. */
  def kmvDistinct(items: DataFrame, keyCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 1, "k must exceed 1")
    import org.apache.spark.sql.expressions.Window
    val h = items.select(col(groupCol).as("g"), hash32(col(keyCol), 0).as("h"))
      .distinct()
    val rn = Window.partitionBy(col("g")).orderBy(col("h"))
    h.withColumn("rn", row_number().over(rn)).filter(col("rn") <= k)
      .groupBy(col("g"))
      .agg(max(when(col("rn") === k, col("h"))).as("hk"),
        count(lit(1)).as("nk"))
      .select(col("g").as(groupCol),
        when(col("nk") < k, col("nk"))
          .otherwise(expr(s"(${k - 1}L * 4294967296L) div hk"))
          .as("est_distinct"))
  }
}
