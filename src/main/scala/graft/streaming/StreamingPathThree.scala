package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.core.DetectionConfig

/** Path-3 ANN novelty ON THE STREAM — the reference consumer's inline
  * vector search (`/root/reference/pipeline/path3_vector_search.py:98-175`
  * driven from the Kafka loop) as typed Structured Streaming state.
  *
  * Per device, the state holds exactly the lookback window of
  * (epoch, embedding, anomalous) snapshots — bounded by
  * `lookbackHours × tick rate`, evicted as the window slides, surviving
  * restarts via the checkpoint. Each arriving snapshot is judged against
  * the state BEFORE being added to it: corpus = prior same-device
  * snapshots in `[t − lookback, t)`, matches = the normal ones with
  * cosine ≥ threshold, warmup yields a NULL verdict — bit-for-bit the
  * batch [[graft.operators.Detection.pathThree]] semantics
  * (StreamingPathThreeSpec proves batch ≡ stream on the simulator
  * fixture, cross-batch state included).
  *
  * Ordering contract (the reference's watermark-file discipline,
  * py:255-312): rows are processed in event-time order within each
  * (device, trigger) group, and a row at or below the device's
  * high-water mark — a late or duplicate delivery — is DROPPED, exactly
  * like the reference resuming strictly after its persisted watermark.
  * Feed from the watermarked snapshotter so triggers deliver windows in
  * order.
  */
object StreamingPathThree {

  case class SnapIn(
      device_id: String, epoch_us: Long,
      embedding: Seq[Float], is_anomalous: Boolean)

  case class Verdict(
      device_id: String, epoch_us: Long,
      corpus_n: Long, match_n: Long, path3_triggered: Option[Boolean])

  case class DevState(rows: Seq[(Long, Seq[Float], Boolean)])

  /** Same loop order as CosineSimilarity.nullSafeEval — bit-identical to
    * the batch expression. */
  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = a(i).toDouble; val yi = b(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Works on a stream (cross-trigger state, checkpoint-recoverable) and
    * on a batch Dataset (one pass) alike. */
  def verdicts(
      snaps: Dataset[SnapIn],
      cfg: DetectionConfig = DetectionConfig.VectorSearch): Dataset[Verdict] = {
    import snaps.sparkSession.implicits._
    val lookbackUs = cfg.lookbackHours * 3600L * 1000000L
    snaps.groupByKey(_.device_id)
      .flatMapGroupsWithState[DevState, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev, it, state) =>
          var hist = state.getOption.map(_.rows.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[Verdict]
          it.toVector.sortBy(_.epoch_us).foreach { s =>
            if (hist.nonEmpty && s.epoch_us <= hist.last._1) {
              // at/below the device HWM: late or duplicate delivery — drop
              // (the reference's strictly-after watermark contract)
            } else {
              hist = hist.dropWhile(_._1 < s.epoch_us - lookbackUs)
              val corpusN = hist.size.toLong
              val matchN = hist.count(c =>
                !c._3 && cos(s.embedding, c._2) >= cfg.knnSimThreshold).toLong
              val trig =
                if (corpusN < cfg.warmupCount) None
                else Some(matchN < cfg.knnMinMatches)
              out += Verdict(dev, s.epoch_us, corpusN, matchN, trig)
              hist = hist :+ ((s.epoch_us, s.embedding, s.is_anomalous))
            }
          }
          state.update(DevState(hist))
          out.result().iterator
      }
  }
}
