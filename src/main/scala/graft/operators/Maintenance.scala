package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance — the Spark-native equivalents of the reference's TTLs
  * and reset scripts (S7: `/root/reference/pipeline/clear_all_data.py:71-151`,
  * `clear_anomalies.py:31-74`; TTLs in `create_iot_schema.py:85,110,133,202`).
  *
  * ScyllaDB expires rows with per-table TTLs and deletes with per-partition
  * tombstones. With date-partitioned parquet the equivalents are partition
  * operations: retention = drop partitions older than the cutoff (no data
  * rewrite — O(partitions) metadata work, which is what survives at 100 TB),
  * selective clearing = overwrite only the affected partitions
  * (`partitionOverwriteMode=dynamic`).
  */
object Maintenance {

  /** Write a snapshot-like table date-partitioned — the layout every
    * maintenance op here relies on (and the analog of the reference's
    * `(device_id, date)` partition keys). `sortCols` gives the reference's
    * clustering order on disk (W4, create_iot_schema.py:81,129):
    * sort-within-partition costs nothing extra at write time and turns
    * parquet row-group min/max stats into an index for range scans. */
  def writePartitioned(
      df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      sortCols: Seq[String] = Seq("device_id", "snapshot_time")): Unit = {
    val sorted =
      if (sortCols.nonEmpty && sortCols.forall(df.columns.contains))
        df.sortWithinPartitions(sortCols.map(col): _*)
      else df
    sorted.write.mode(mode).partitionBy("date").parquet(path)
  }

  /** Write a table bucketed (and sorted) by join key into the session
    * catalog. Two tables bucketed the same way equi-join with ZERO
    * exchanges — each bucket pair joins locally — which is how repeated
    * big-to-big joins (snapshots ⋈ events by device, corpus ⋈ signatures
    * by doc) amortize their shuffle at 100 TB: pay it once at write time,
    * never again per query. See BucketJoinSpec for the plan-level proof. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite) {
      // a fresh session's catalog doesn't know tables a previous JVM wrote,
      // but their warehouse directories survive — saveAsTable refuses to
      // reuse the location (LOCATION_ALREADY_EXISTS). Overwrite must mean
      // overwrite: drop the catalog entry AND clear a stale location.
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
        table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Z-order (Morton) clustering on write — multi-dimensional data
    * skipping without a table format (SURVEY §2.2 P8's "Z-order if using
    * Delta", rebuilt on plain parquet). A single-column sort makes
    * row-group min/max stats an index for THAT column and destroys
    * locality for every other; interleaving the bits of each column's
    * grid coordinate gives a sort key whose contiguous ranges are compact
    * hyper-rectangles, so per-file min/max stats stay narrow on ALL the
    * clustered columns at once and point/range predicates on any of them
    * skip most files (ZOrderSpec measures both effects on real parquet
    * footers).
    *
    * Grid mapping is linear between the column's min and max (one tiny
    * driver agg). Heavily skewed columns would crowd the grid; the
    * standard fix — rank-based boundaries from `approxQuantile` feeding
    * `width_bucket` — slots into `gridOf` without touching the key
    * construction. The key must stay below the sign bit (negative keys
    * would range-partition before positive ones and break z-range
    * contiguity), so cols × bits ≤ 63: 16 bits/column covers 3 columns;
    * use bits = 15 for 4. */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): org.apache.spark.sql.Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits must fit a signed long")
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"_mn_$c"),
      max(col(c).cast("double")).as(s"_mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val top = (1L << bits) - 1
    def gridOf(c: String, j: Int): org.apache.spark.sql.Column =
      // empty input or an all-null / non-castable column: no stats → no
      // discrimination possible on this column; constant 0 degrades it to
      // "unclustered" instead of NPEing a maintenance job
      if (stats.isNullAt(2 * j) || stats.isNullAt(2 * j + 1)) lit(0L)
      else {
        val mn = stats.getDouble(2 * j); val mx = stats.getDouble(2 * j + 1)
        if (mx <= mn) lit(0L)
        else least(lit(top), greatest(lit(0L),
          floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(top.toDouble))
            .cast("long")))
      }
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      g = gridOf(c, j)
      i <- 0 until bits
    } yield shiftleft(shiftright(g, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster + write: range-partition on the z-key (so each output file
    * owns a contiguous z-range = a compact rectangle in value space),
    * sort within, drop the key. `nFiles` sizes output files — at 100 TB
    * pick it from bytes/file, not row counts. */
  def writeZOrdered(
      df: DataFrame, path: String, cols: Seq[String],
      nFiles: Int, bits: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("_zkey", zOrderKey(df, cols, bits))
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode(mode).parquet(path)

  /** Retention (TTL analog): keep only partitions with date >= cutoff.
    * Implemented as partition-directory removal, not a rewrite. */
  def retainSince(spark: SparkSession, path: String, cutoffDate: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(base)) return Nil
    val dropped = fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("date=") && n.stripPrefix("date=") < cutoffDate
      }
    dropped.foreach(p => fs.delete(p, true))
    dropped.map(_.getName)
  }

  /** Selective clear (the reference's windowed delete): rewrite only the
    * partitions that still contain surviving rows; untouched partitions are
    * never read or written. */
  def deleteWhere(spark: SparkSession, path: String, condition: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val df = spark.read.parquet(path)
      val affected = df.filter(condition).select(col("date")).distinct()
      val surviving = df.join(broadcast(affected), Seq("date"), "left_semi")
        .filter(s"NOT ($condition)")
      surviving.write.mode(SaveMode.Overwrite).partitionBy("date").parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Small-file compaction: rewrite one date partition of a partitioned
    * table into `nFiles` sorted files. Streaming sinks and incremental
    * appends accrete many tiny files; at 100 TB scan efficiency dies on
    * file-open overhead and lost row-group statistics, so periodic
    * per-partition compaction is a core maintenance op. Only the target
    * partition is read and rewritten (partition-pruned scan, dynamic
    * partition overwrite). */
  def compactPartition(
      spark: SparkSession, path: String, date: String, nFiles: Int,
      sortCols: Seq[String] = Seq("device_id", "snapshot_time")): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val partDir = new org.apache.hadoop.fs.Path(s"$path/date=$date")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.compact_tmp_date=$date")
    val oldDir = new org.apache.hadoop.fs.Path(s"$path/.compact_old_date=$date")
    // crash recovery from a previously interrupted swap: the live data is
    // always in exactly one of partDir / oldDir (never only in tmp), so a
    // retry first restores the aside copy, then recompacts from scratch
    if (!fs.exists(partDir) && fs.exists(oldDir)) fs.rename(oldDir, partDir)
    require(fs.exists(partDir), s"no partition directory $partDir")
    // Spark refuses to overwrite a path it is reading, so compact into a
    // dot-prefixed sibling (invisible to concurrent readers), then swap
    // with rename-ASIDE-first: the uncompacted copy survives at oldDir
    // until the compacted one is live, so a crash at any point leaves a
    // recoverable copy. Readers see the partition missing only between the
    // two renames (plain-file storage has no atomic directory swap; run
    // compaction in the maintenance window).
    fs.delete(tmp, true)
    fs.delete(oldDir, true)
    val part = spark.read.parquet(partDir.toString)
    val present = sortCols.filter(part.columns.contains)
    part.repartition(nFiles)
      .sortWithinPartitions(present.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(partDir, oldDir), s"could not move $partDir aside")
    if (!fs.rename(tmp, partDir)) {
      fs.rename(oldDir, partDir) // roll back: uncompacted copy goes live again
      throw new IllegalStateException(s"compaction swap failed for $partDir; original restored")
    }
    fs.delete(oldDir, true)
  }

  /** Fixed-size shard writing (training-data layout: bounded files so
    * dataloader workers stream uniformly). `maxRecordsPerFile` bounds every
    * output file; range partitioning by `orderCol` keeps shards
    * range-disjoint and the layout deterministic. */
  def writeSharded(
      df: DataFrame, path: String, orderCol: String,
      recordsPerShard: Int, numShards: Int): Unit =
    df.repartitionByRange(numShards, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", recordsPerShard)
      .parquet(path)

  /** NDJSON sink (reference S6: simulator --sink stdout prints one JSON per
    * reading, iot_simulator.py:740-743). */
  def writeNdjson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** The reference's `recent_device_states` materialized view
    * (create_iot_schema.py:219-229): latest snapshots fleet-wide, newest
    * first — as a query (Spark recomputes; a real deployment would make
    * this an incremental sink). */
  def recentDeviceStates(snapshots: DataFrame, n: Int): DataFrame =
    snapshots.orderBy(col("snapshot_time").desc, col("device_id").asc).limit(n)

  /** Hard reset (clear_all_data.py): drop the whole table path. */
  def truncate(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }
}
