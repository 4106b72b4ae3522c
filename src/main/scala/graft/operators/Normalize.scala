package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature normalization for training pipelines: min-max scaling, z-score
  * standardization, and EXACT quantile rank (the quantile/rank transform)
  * in one operator (§2.12 extension; declared as q112).
  *
  * The interesting part at 100 TB is the quantile rank — naively a global
  * `rank() OVER (ORDER BY value)`, i.e. a single-partition sort of the
  * whole table. Instead: fixed-width value buckets (from the same one-row
  * stats aggregate that feeds min-max/z-score) give a partition key that
  * FOLLOWS value order, so global min-rank = rows in earlier buckets
  * (a broadcast-sized cumulative count) + per-bucket rank (a parallel
  * window). Equal values always share a bucket, so tie semantics are
  * exactly `rank()`'s. One data shuffle on the bucket key, never a global
  * sort — the q58/q88 discipline applied to order statistics.
  *
  * Portability: moments accumulate as exact decimals; the readouts are
  * fixed-order double ops; the quantile is integer arithmetic
  * (`(rank−1)·10⁶ div (n−1)`). Degenerate inputs yield null (constant
  * column → no min-max/z-score; single row → no quantile), never NaN.
  */
object Normalize {

  def featureScale(df: DataFrame, idCol: String, valueCol: String,
      numBuckets: Int = 256, scale: Int = 6): DataFrame = {
    require(numBuckets >= 1)
    val v = col(valueCol)
    // decimal(16,6): 16+16+1 = 33 ≤ 38 keeps the square's scale-12 digits
    // exact in Spark (19 would overflow precision and truncate the scale).
    val dec = "decimal(16,6)"
    val stats = df.agg(
      count(lit(1)).as("_n"), min(v).as("_mn"), max(v).as("_mx"),
      sum(v.cast(dec)).as("_sx"), sum(v.cast(dec) * v.cast(dec)).as("_sxx"))
    val withB = df.crossJoin(broadcast(stats))
      .withColumn("_bkt",
        when(col("_mx") === col("_mn"), lit(0))
          .otherwise(least(lit(numBuckets - 1),
            floor((v - col("_mn")) /
              ((col("_mx") - col("_mn")) / numBuckets)).cast("int"))))
    // Bucket offsets: numBuckets rows — the single-partition window here is
    // over a broadcast-sized table by construction.
    val offsets = withB.groupBy(col("_bkt")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    val ranked = withB
      .withColumn("_r", rank().over(Window.partitionBy(col("_bkt")).orderBy(v)))
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_grank", col("_off") + col("_r"))
    val n = col("_n").cast("double")
    val meanD = col("_sx").cast("double") / n
    val stdD = sqrt((col("_sxx").cast("double") -
      col("_sx").cast("double") * col("_sx").cast("double") / n) / n)
    ranked.select(col(idCol), v.as(valueCol),
      when(col("_mx") === col("_mn"), lit(null).cast("double"))
        .otherwise(round((v - col("_mn")) / (col("_mx") - col("_mn")), scale))
        .as("minmax"),
      when(stdD === lit(0d), lit(null).cast("double"))
        .otherwise(round((v - meanD) / stdD, scale)).as("zscore"),
      when(col("_n") > 1,
        expr("CAST((_grank - 1) * 1000000 AS BIGINT) div (_n - 1)"))
        .otherwise(lit(null).cast("long")).as("quantile_ppm"))
  }

  /** Cross-group quantile normalization: remap each row's value so every
    * group's value distribution matches the POOLED global distribution —
    * the score-calibration step that makes per-source quality thresholds
    * comparable when sources score on different scales (one crawl's
    * "0.9" is another's "0.5"). Classic quantile normalization: a row at
    * within-group quantile q is assigned the global value at quantile q.
    *
    * Deterministic integer rule: within-group position r of n_g (ordered
    * by (value, id)) maps to global position
    * `1 + (r−1)·(N−1) div (n_g−1)` (singleton groups map to the global
    * median position `(N+1) div 2`); the value at a global position
    * comes from a (position → value) table built WITHOUT a global sort —
    * the same value-ordered-bucket + broadcast-offset machinery as
    * [[featureScale]]'s rank (global row_number = bucket offset +
    * within-bucket row_number; bucketing is value-monotone so the
    * positions are exactly the global sort's). The WITHIN-group rank is
    * built the same way on (group, bucket) cells — never a per-group
    * window over the data, so a dominant source (half the corpus from
    * one crawl) still ranks across all its buckets in parallel; window
    * state is bounded by cell occupancy on both paths. The position
    * join shuffles on an integer key.
    * Output: (id, group, value, norm_value). */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, numBuckets: Int = 256): DataFrame = {
    require(numBuckets >= 1)
    // Round 13 (guide §5, the dsirScores scoped-cache discipline): the
    // input frame fans out to FIVE consumers below (stats, bucket
    // offsets, global positions, per-(group,bucket) cells, the ranked
    // rows themselves). Un-materialized, each consumer re-runs the
    // caller's upstream plan — for the quality-score callers (q151/q161)
    // that is a corpus re-scan + re-tokenize per consumer (measured: the
    // quantileNormalize leg of Corpus.curate alone read 3.5 s at sf0.1,
    // ~5 tokenize passes for one). The frame is (id, group, value) —
    // three narrow columns per row, the cheap-to-materialize shape (the
    // round-12 "recompute beats materialize" lesson applies to exploded
    // string rows, not to this) — so checkpoint it once, eagerly; the
    // block is row-count-sized and the harness reclaims it between
    // queries.
    val dfc = df.select(col(idCol), col(groupCol), col(valueCol))
      .localCheckpoint(eager = true)
    val v = col(valueCol)
    val stats = dfc.agg(count(lit(1)).as("_n"), min(v).as("_mn"), max(v).as("_mx"))
    val withB = dfc.crossJoin(broadcast(stats))
      .withColumn("_bkt",
        when(col("_mx") === col("_mn"), lit(0))
          .otherwise(least(lit(numBuckets - 1),
            floor((v - col("_mn")) /
              ((col("_mx") - col("_mn")) / numBuckets)).cast("int"))))
    val offsets = withB.groupBy(col("_bkt")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.orderBy(col("_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    val pos = withB
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_bkt")).orderBy(v, col(idCol))))
      .join(broadcast(offsets), Seq("_bkt"))
      .select((col("_off") + col("_rn")).as("_gpos"), v.as("_gv"))
    // within-group ranks from (group, bucket) cells: cell counts roll up
    // to per-group bucket offsets and group sizes (a groups×buckets-sized
    // broadcast), per-cell row_numbers lift to within-group ranks
    val cellCounts = withB.groupBy(col(groupCol), col("_bkt"))
      .agg(count(lit(1)).as("_c"))
    val gOffsets = cellCounts
      .withColumn("_goff", coalesce(
        sum(col("_c")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(groupCol), col("_bkt"), col("_goff"))
    val sizes = cellCounts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("_ng"))
    val g = withB
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(groupCol), col("_bkt")).orderBy(v, col(idCol))))
      .join(broadcast(gOffsets), Seq(groupCol, "_bkt"))
      .join(broadcast(sizes), Seq(groupCol))
      .withColumn("_r", col("_goff") + col("_rn"))
      .withColumn("_idx",
        when(col("_ng") > 1,
          lit(1L) + expr("(_r - 1) * (_n - 1) div (_ng - 1)"))
          .otherwise(expr("(_n + 1) div 2")))
    g.join(pos, col("_idx") === col("_gpos"))
      .select(col(idCol), col(groupCol), v,
        col("_gv").as(s"norm_$valueCol"))
  }

  /** DuckDB spelling of [[featureScale]] over table `tbl` — the oracle
    * computes the rank with the global window the operator avoids, and the
    * same exact-decimal moments (width 19 forces DuckDB's INT128 multiply;
    * Spark uses 16 for the same exact scale-12 digits — see
    * [[Trend.corrPairsSql]] for the width asymmetry). */
  def featureScaleSql(tbl: String, idCol: String, valueCol: String,
      scale: Int = 6): String =
    s"""WITH s AS (SELECT count(*) AS n, min($valueCol) AS mn, max($valueCol) AS mx,
       |    SUM(CAST($valueCol AS DECIMAL(19,6))) AS sx,
       |    SUM(CAST($valueCol AS DECIMAL(19,6)) * CAST($valueCol AS DECIMAL(19,6))) AS sxx
       |  FROM $tbl),
       |r AS (SELECT $idCol, $valueCol, rank() OVER (ORDER BY $valueCol) AS rk FROM $tbl)
       |SELECT $idCol, $valueCol,
       |  CASE WHEN mx = mn THEN NULL
       |       ELSE round(($valueCol - mn) / (mx - mn), $scale) END AS minmax,
       |  CASE WHEN sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n) = 0 THEN NULL
       |       ELSE round(($valueCol - CAST(sx AS DOUBLE) / n)
       |            / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n), $scale) END AS zscore,
       |  CASE WHEN n > 1 THEN (rk - 1) * 1000000 // (n - 1) ELSE NULL END AS quantile_ppm
       |FROM r, s""".stripMargin

  /** Leakage-free K-fold target encoding — the out-of-fold mean that
    * replaces a high-cardinality categorical with its target statistic
    * WITHOUT letting a row see its own label: rows land in `folds`
    * deterministic hash folds, and fold f's encoding for category c is
    * the mean over c's rows in every OTHER fold,
    * `(s_c − s_{c,f}) div (n_c − n_{c,f})` in exact integer cents. A
    * category living entirely in one fold has no out-of-fold evidence
    * and falls back to the GLOBAL out-of-fold mean (same
    * leave-own-fold-out discipline at corpus level).
    *
    * Scale shape: one map-combined groupBy(category, fold) over the
    * corpus; category totals ride a window over the (|categories|·folds)
    * aggregate, never the fact. Returns
    * (category, fold, n_rows, enc_cents). */
  def targetEncode(df: DataFrame, idCol: String, catCol: String,
      targetCol: String, folds: Int = 5, seed: Int = 17): DataFrame = {
    import graft.functions.TextFunctions.hash32
    require(folds >= 2)
    val base = df.select(col(catCol).as("c"),
      (hash32(col(idCol).cast("string"), seed) % folds).as("f"),
      round(col(targetCol) * 100).cast("bigint").as("cents"))
    val cf = base.groupBy(col("c"), col("f"))
      .agg(count(lit(1)).as("n_cf"), sum(col("cents")).as("s_cf"))
    val byCat = Window.partitionBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cf.withColumn("n_c", sum(col("n_cf")).over(byCat))
      .withColumn("s_c", sum(col("s_cf")).over(byCat))
      .withColumn("n_g", sum(col("n_cf")).over(whole))
      .withColumn("s_g", sum(col("s_cf")).over(whole))
      .select(col("c").as(catCol), col("f").as("fold"),
        col("n_cf").as("n_rows"),
        when(col("n_c") > col("n_cf"),
          expr("(s_c - s_cf) div (n_c - n_cf)"))
          .otherwise(expr("(s_g - s_cf) div (n_g - n_cf)")).as("enc_cents"))
  }
}
