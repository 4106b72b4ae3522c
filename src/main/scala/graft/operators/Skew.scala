package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling covers sort-merge joins it can observe; salting
  * is the explicit tool when a hot key would otherwise pin one task at 100 TB
  * (e.g. one device producing most telemetry, one document template
  * dominating a corpus). The classic trade: the small side is replicated
  * `saltFactor`× so the hot key's rows spread over `saltFactor` reducers.
  */
object Skew {

  /** Join types for which replicating the small side is sound: unmatched
    * SMALL-side rows are never emitted, so the `saltFactor` copies of a
    * small-side row either all match (producing the same pairs a plain join
    * would, spread over salts) or are all dropped. Right/full outer would
    * emit each unmatched small-side row `saltFactor` times. */
  private val saltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  /** Equi-join `large ⋈ small` on `key`, with the large side salted and the
    * small side replicated. Result rows are identical to the plain join;
    * only the shuffle distribution changes. Restricted to join types where
    * small-side replication cannot surface (right/full outer are not
    * expressible under salting without a dedup pass — use AQE skew handling
    * for those). */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support joinType=$joinType: replicating the small side " +
        "would duplicate its unmatched rows under right/full outer semantics")
    val salted = large.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Skew guard for within-group SELF-joins (per-device kNN, per-label
    * similarity): an equi-join on `key` where one hot group would otherwise
    * own an O(n_g²) task. Groups with more than `saltAbove` rows on the
    * `right` side are split: each hot LEFT row gets ONE deterministic salt
    * from `leftSaltOn`, the hot RIGHT side is replicated across all
    * `salts`, and the join key becomes (key, salt) — per-task work drops to
    * n_g²/salts while every (left, right) pair still appears exactly once.
    * Cold groups take the plain equi-join. Result rows are identical to
    * `left.join(right, Seq(key))`; only the shuffle distribution changes.
    * The hot-group set is tiny by construction (groups above a row
    * threshold), so it broadcasts. */
  def saltedSelfJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftSaltOn: org.apache.spark.sql.Column,
      saltAbove: Int, salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val hot = right.groupBy(col(key)).agg(count(lit(1)).as("_gn"))
      .filter(col("_gn") > saltAbove).select(col(key))
    val lh = left.join(broadcast(hot), Seq(key), "left_semi")
      .withColumn("_salt", pmod(hash(leftSaltOn), lit(salts)))
    val lc = left.join(broadcast(hot), Seq(key), "left_anti")
    val rh = right.join(broadcast(hot), Seq(key), "left_semi")
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    val rc = right.join(broadcast(hot), Seq(key), "left_anti")
    lc.join(rc, Seq(key))
      .unionByName(lh.join(rh, Seq(key, "_salt")).drop("_salt"))
  }

  /** Hot-key audit for a join/aggregation key — the diagnostic run BEFORE
    * choosing a salt factor: the `topK` heaviest key values with their row
    * count, corpus share (ppm), and heat relative to a uniform key
    * distribution (`hot_x100` = count ÷ (total/n_keys), ×100 — a key at
    * 100 is average; at 3200 it owns 32 reducers' fair share and wants
    * `saltFactor ≈ hot_x100/100`).
    *
    * Scale shape: one map-side-combined groupBy on the key; the global
    * totals reduce the (already aggregated) count table, not the input;
    * top-k is TakeOrdered (no full sort), and the final window ranks only
    * the `topK` surviving rows. Null keys are audited as the '<null>'
    * bucket — at 100 TB the null hot key is the classic skew culprit. */
  def skewAudit(df: DataFrame, key: String, topK: Int): DataFrame = {
    require(topK >= 1)
    val counts = df
      .groupBy(coalesce(col(key).cast("string"), lit("<null>")).as("key_value"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("_total"),
      count(lit(1)).as("_n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key_value").asc)
    counts.orderBy(col("cnt").desc, col("key_value").asc).limit(topK)
      .crossJoin(broadcast(tot))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .select(col("rk"), col("key_value"), col("cnt"),
        expr("(cnt * 1000000) div _total").as("share_ppm"),
        expr("(cnt * _n_keys * 100) div _total").as("hot_x100"))
  }

  /** Shuffle-spread report for a join/aggregation key: rows per hash
    * partition at `numPartitions`, with and without `saltFactor` salting —
    * the observability half of the tool (decide whether to salt). */
  def keySpread(df: DataFrame, key: String, numPartitions: Int, saltFactor: Int): DataFrame = {
    val plain = df.repartition(numPartitions, col(key))
      .groupBy(spark_partition_id().as("partition")).count()
      .agg(max(col("count")).as("max_rows"), count(lit(1)).as("used_partitions"))
      .withColumn("mode", lit("plain"))
    val salted = df.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
      .repartition(numPartitions, col(key), col("_salt"))
      .groupBy(spark_partition_id().as("partition")).count()
      .agg(max(col("count")).as("max_rows"), count(lit(1)).as("used_partitions"))
      .withColumn("mode", lit(s"salted_x$saltFactor"))
    plain.unionByName(salted)
  }
}
