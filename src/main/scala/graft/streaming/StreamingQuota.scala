package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-group admission quota ON THE STREAM — the ingest-time form of the
  * batch source cap (`Sampling.capPerGroup`, q71): admit the first
  * `maxPerGroup` rows per group in (event-time, id) order, drop the rest.
  * Batch balancing selects by deterministic hash rank over a complete
  * corpus; an ingest quota cannot see the future, so its contract is
  * arrival-order admission — the shape a 100 TB crawl frontier uses to
  * stop one domain from flooding a day's intake.
  *
  * State per group is O(1) — admitted count + event-time high-water mark
  * (not the rows) — so state size is |groups|, independent of stream
  * length, and survives restarts via the checkpoint. Rows at or below the
  * group HWM (late/duplicate deliveries) are dropped, same discipline as
  * [[StreamingPathThree]].
  */
object StreamingQuota {

  case class DocIn(doc_id: Long, group: String, epoch_us: Long)

  case class QuotaState(seen: Long, hwmUs: Long, hwmId: Long)

  /** Works identically on a stream (cross-trigger state, checkpointed)
    * and on a batch Dataset (one pass). */
  def capPerGroup(docs: Dataset[DocIn], maxPerGroup: Int): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    require(maxPerGroup >= 1)
    docs.groupByKey(_.group)
      .flatMapGroupsWithState[QuotaState, DocIn](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          var st = state.getOption.getOrElse(QuotaState(0L, Long.MinValue, Long.MinValue))
          val out = Vector.newBuilder[DocIn]
          it.toVector.sortBy(d => (d.epoch_us, d.doc_id)).foreach { d =>
            val afterHwm = d.epoch_us > st.hwmUs ||
              (d.epoch_us == st.hwmUs && d.doc_id > st.hwmId)
            if (afterHwm) {
              if (st.seen < maxPerGroup) out += d
              st = QuotaState(st.seen + 1, d.epoch_us, d.doc_id)
            } // else: late or duplicate delivery — drop
          }
          state.update(st)
          out.result().iterator
      }
  }
}
