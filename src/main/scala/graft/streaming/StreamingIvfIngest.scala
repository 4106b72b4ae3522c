package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Ivf
import graft.operators.Ivf.IvfIndex

/** Streaming maintenance of a stored IVF index — the missing half of the
  * index lifecycle: [[Ivf.buildPortable]]/[[Ivf.writeIndex]] create the
  * layout once; this keeps it CURRENT as new vectors arrive, without
  * rebuilding.
  *
  * Works because cell assignment ([[Ivf.assignVectors]]) is a pure
  * shuffle-free map over broadcast-literal centroids — legal in a
  * streaming plan, no state, no watermark. Each micro-batch appends its
  * rows under the stored index's `assigned/cell_id=…` partition
  * directories, so a concurrent [[Ivf.searchPruned]] probe sees the grown
  * corpus and its partition pruning still holds: bytes read stay
  * ~ nprobe/nCells of the (now larger) corpus.
  *
  * At scale this is the standard ANN serving pattern (FAISS/ScaNN-style
  * IVF with streaming upserts, the reference's continuously-ingesting
  * HNSW analog — `/root/reference/scylladb_setup/create_iot_schema.py:
  * 136-155`): centroids stay fixed between periodic retrains; only
  * assignment runs per batch. Cell drift is a retrain policy decision,
  * not an ingest-path concern.
  */
object StreamingIvfIngest {

  /** Assign arriving vectors to the trained cells (streaming-safe map). */
  def assigned(index: IvfIndex, stream: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    Ivf.assignVectors(index, stream, vecCol)

  /** Append arriving vectors into the stored index's partition layout.
    *
    * `foreachBatch` + a plain partitioned append, NOT the streaming
    * parquet sink: the file sink's `_spark_metadata` log would make later
    * reads of `assigned/` ignore every file it didn't write — including
    * the original batch-built corpus.
    *
    * Delivery: a per-batch marker under `_ingest_commits/` makes replays
    * of an already-appended batch no-ops, narrowing the duplicate window
    * to a crash BETWEEN the append and the marker write. A replay landing
    * in that window duplicates its rows, and search over plain parquet
    * WILL see them (kNN can rank a duplicated neighbor at two of its k
    * slots) — run [[compactDedup]] to restore uniqueness, or use a
    * transactional table format to close the window entirely. */
  def ingest(index: IvfIndex, stream: DataFrame, indexPath: String,
      checkpointDir: String, vecCol: String = "embedding"): StreamingQuery = {
    // batch ids restart at 0 under a NEW checkpoint — scope markers to
    // the checkpoint lineage or a restarted pipeline would skip its
    // first batches as "already committed". Full md5 of the dir: a
    // 32-bit collision between two lineages sharing one index path
    // would wrongly skip a batch as already committed.
    val lineage = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val legacyHex = java.lang.Integer.toHexString(checkpointDir.hashCode)
    // Markers written before the md5 upgrade used hashCode-hex; a
    // restart replaying an already-committed pre-upgrade batch must
    // still see its marker or it would append the rows twice. The
    // legacy check is gated ONCE at stream start on whether any
    // legacy-format marker for this lineage exists at all: a NEW
    // checkpoint (no legacy markers) never consults them, so it cannot
    // inherit the 32-bit cross-lineage collision-skip hazard the md5
    // upgrade closed — and the common path saves one FS existence RPC
    // per batch (round-11 ADVICE: an unconditional per-batch legacy
    // probe retained the hazard permanently).
    val startConf = stream.sparkSession.sparkContext.hadoopConfiguration
    val commitsDir = new org.apache.hadoop.fs.Path(s"$indexPath/_ingest_commits")
    val hasLegacyMarkers =
      try {
        val fs0 = commitsDir.getFileSystem(startConf)
        fs0.exists(commitsDir) && fs0.listStatus(commitsDir)
          .exists(_.getPath.getName.startsWith(legacyHex + "_"))
      } catch { case _: Throwable => false }
    assigned(index, stream, vecCol)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        val marker = new org.apache.hadoop.fs.Path(
          s"$indexPath/_ingest_commits/${lineage}_$batchId")
        val legacyMarker = new org.apache.hadoop.fs.Path(
          s"$indexPath/_ingest_commits/${legacyHex}_$batchId")
        val fs = marker.getFileSystem(conf)
        val committed = fs.exists(marker) ||
          (hasLegacyMarkers && fs.exists(legacyMarker))
        if (!committed) {
          batch.write.mode("append").partitionBy("cell_id")
            .parquet(s"$indexPath/assigned")
          fs.mkdirs(marker.getParent)
          fs.create(marker, true).close()
        }
      }
      .start()
  }

  /** Rewrite `assigned/` keeping one row per id — the maintenance pass
    * that bounds the lifetime of crash-window duplicates (replayed rows
    * are bit-identical, so any survivor is correct; id-reusing UPSERTS
    * would additionally need a version column and `max_by` — not this
    * op). Write-to-sibling + rename, because a parquet path can't be read
    * and overwritten in the same job. */
  def compactDedup(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      idCol: String = "vec_id"): Unit = {
    val src = s"$indexPath/assigned"
    val tmp = s"$indexPath/assigned__compacting"
    spark.read.parquet(src)
      .dropDuplicates(idCol)
      .write.mode("overwrite").partitionBy("cell_id").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }
}
