package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: group documents into packs
  * whose total token count stays within a budget (what a dataloader does
  * before concatenating samples into fixed-length training sequences).
  *
  * Distributed shape: documents are range-partitioned by id, then packed
  * greedily *within* each partition (first-fit in id order) — deterministic
  * for a fixed partition count, no global coordination, and pack quality is
  * within one partial pack per partition of the sequential greedy result.
  * Oversized documents (> budget) become singleton packs.
  */
object Packing {

  case class Pack(pack_id: Long, doc_ids: Seq[Long], total_tokens: Long)

  def packGreedy(
      docs: DataFrame, idCol: String, tokensCol: String,
      tokenBudget: Long, numPartitions: Int = 32): Dataset[Pack] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val narrow = docs
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("nt"))
    // Deterministic partitioning: repartitionByRange samples bounds with an
    // RDD-id-dependent seed, so pack boundaries could differ across runs of
    // the same input. Instead bucket ids into fixed-width ranges computed
    // from the exact min/max (one cheap agg) — same buckets every run.
    val bounds = narrow.agg(min(col("id")), max(col("id"))).head()
    if (bounds.isNullAt(0)) return spark.emptyDataset[Pack]
    val minId = bounds.getLong(0)
    val span = bounds.getLong(1) - minId + 1
    val width = math.max(1L, (span + numPartitions - 1) / numPartitions)
    narrow
      // integer div, not `/`: Spark's Divide is double division, which
      // loses exactness for ids beyond 2^53
      .withColumn("bucket", expr(s"(id - ${minId}L) div ${width}L"))
      .repartition(numPartitions, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // Greedy first-fit PER BUCKET: pack state resets at each bucket
        // boundary, so the result is a pure function of (ids, token
        // counts, bucket width) — independent of which hash partition a
        // bucket lands in. That makes the operator rerun-stable across
        // cluster layouts AND exactly reproducible by the driver's
        // recursive-CTE oracle (q52).
        val packs = scala.collection.mutable.ArrayBuffer.empty[Pack]
        var ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        var tot = 0L
        var first = -1L
        var bucket = Long.MinValue
        def flush(): Unit = if (ids.nonEmpty) {
          packs += Pack(first, ids.toSeq, tot)
          ids = scala.collection.mutable.ArrayBuffer.empty[Long]; tot = 0L; first = -1L
        }
        it.foreach { case (id, nt, b) =>
          if (b != bucket) { flush(); bucket = b }
          else if (ids.nonEmpty && tot + nt > tokenBudget) flush()
          if (ids.isEmpty) first = id // pack_id = first member's id (deterministic)
          ids += id; tot += nt
        }
        flush()
        packs.iterator
      }
  }

  /** Padding-waste audit for fixed-batch dataloading: how many pad tokens
    * a batching strategy burns. Documents are batched `batchSize` at a
    * time in deterministic id order; each batch pads every member to the
    * batch max length, so its waste is Σ(max_len − len). Strategies are
    * expressed as a bucketing column: `lit(0)` reproduces naive
    * arrival-order batching; `ceil(len / W)` buckets similar lengths
    * together (what length-grouped samplers do), shrinking the per-batch
    * max−len gap. Emits one row per (strategy, bucket): batch count,
    * real tokens, padded slots, and waste in integer ppm — the number
    * that decides whether packing (q52) is worth its shuffle.
    *
    * Scale shape: per strategy one shuffle on the bucket key and a
    * window sort WITHIN each bucket (never global — bucket width bounds
    * the sort span); waste math is exact integer arithmetic, so results
    * are engine- and partition-order-independent.
    */
  def paddingWaste(docs: DataFrame, idCol: String, lenCol: String,
      batchSize: Int, bucketWidth: Int): DataFrame = {
    require(batchSize >= 1 && bucketWidth >= 1)
    def strategy(name: String, bucket: org.apache.spark.sql.Column) = {
      docs
        .select(col(idCol).cast("long").as("id"),
          col(lenCol).cast("long").as("len"))
        .withColumn("bucket", bucket.cast("long"))
        .withColumn("batch", expr(s"(row_number() OVER (PARTITION BY bucket ORDER BY id) - 1) div $batchSize"))
        .groupBy(col("bucket"), col("batch"))
        .agg(sum(col("len")).as("real_tokens"),
          (max(col("len")) * count(lit(1)) - sum(col("len"))).as("pad_tokens"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("real_tokens")).as("real_tokens"),
          sum(col("pad_tokens")).as("pad_tokens"))
        .select(lit(name).as("strategy"), col("bucket"), col("n_batches"),
          col("real_tokens"), col("pad_tokens"),
          expr("pad_tokens * 1000000 div (real_tokens + pad_tokens)")
            .as("waste_ppm"))
    }
    strategy("naive", lit(0L))
      .unionByName(strategy("length_bucketed",
        expr(s"(len + ${bucketWidth - 1}) div $bucketWidth")))
  }
}
