package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming changelog of [[graft.operators.Timeseries.snapshotDiff]]'s
  * materialized view: each key's latest value (by the exact q16 rule —
  * max (ts, tie)) is maintained in per-key state, and every accepted
  * transition is emitted AS IT HAPPENS:
  *
  *  - first value for a key → `added`;
  *  - a newer (ts, tie) with a different value → `changed`
  *    (with the previous value);
  *  - a newer (ts, tie) with the SAME value → state advances silently
  *    (no row — the view didn't change);
  *  - an event at or below the state's (ts, tie) → ignored (it is not
  *    the latest; the view is unaffected, matching the batch max_by).
  *
  * Disorder: within a trigger, events replay in (ts, tie) order, so the
  * FULL transition history surfaces (a changelog's contract); across
  * triggers, an event older than the state's (ts, tie) is stale and
  * ignored. Either way the drained changelog folds to the batch view —
  * the last emitted `new_value` per key equals the batch latest-per-key
  * for ANY trigger slicing (StreamingCdcSpec proves both cases).
  *
  * State per key is O(1): (ts, tie, value) — the upsert-view row itself.
  * No watermark is required (nothing waits on time); deployments that
  * must bound the key space add a TTL via event-time timeout upstream.
  */
object StreamingCdc {

  case class Upd(key: Long, ts: Timestamp, tie: Long, value: Double)

  case class ViewState(tsMs: Long, tie: Long, value: Double)

  case class Change(key: Long, status: String,
      old_value: Option[Double], new_value: Double,
      ts: Timestamp)

  def changelog(updates: Dataset[Upd]): Dataset[Change] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.key)
      .flatMapGroupsWithState[ViewState, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var st = state.getOption
          val out = Vector.newBuilder[Change]
          it.toVector.sortBy(e => (e.ts.getTime, e.tie)).foreach { e =>
            val newer = st.forall(s =>
              e.ts.getTime > s.tsMs ||
                (e.ts.getTime == s.tsMs && e.tie > s.tie))
            if (newer) {
              st match {
                case None =>
                  out += Change(key, "added", None, e.value, e.ts)
                case Some(s) if s.value != e.value =>
                  out += Change(key, "changed", Some(s.value), e.value, e.ts)
                case _ => () // same value: the view didn't change
              }
              st = Some(ViewState(e.ts.getTime, e.tie, e.value))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
