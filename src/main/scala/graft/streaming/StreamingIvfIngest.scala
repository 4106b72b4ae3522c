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
    * the original batch-built corpus. The checkpoint makes each
    * micro-batch processed once in normal operation; a crash between the
    * append and the commit replays one batch (at-least-once), which the
    * engine's first-arrival dedup semantics absorb downstream — a
    * transactional table format is the production upgrade, not a
    * different dataflow. */
  def ingest(index: IvfIndex, stream: DataFrame, indexPath: String,
      checkpointDir: String, vecCol: String = "embedding"): StreamingQuery =
    assigned(index, stream, vecCol)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("cell_id")
          .parquet(s"$indexPath/assigned")
      }
      .start()
}
