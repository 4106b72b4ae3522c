package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-user conversion-funnel tracking ON THE STREAM — the ingest-time
  * form of the batch funnel (q99): for each user, the earliest qualifying
  * timestamp of every stage, where stage `i+1` only counts at or after
  * the user's current stage-`i` timestamp.
  *
  * State per user is O(#stages) longs — the current stage frontier — so
  * state size is |users| × stages regardless of stream length, and the
  * monotone update rule (a stage timestamp only ever DECREASES while
  * respecting the previous stage's floor) makes the final state equal to
  * the batch computation for any arrival order at trigger granularity:
  * each batch re-processes its group's events in (time, stage) order, so
  * in-batch disorder cannot starve a stage. Cross-trigger, an earlier
  * stage-1 event arriving after a stage-2 event was already admitted may
  * tighten (never loosen) downstream floors — the standard eventual-
  * consistency trade of online funnels; StreamingFunnelSpec pins batch ≡
  * stream for in-order triggers and quantifies the one disorder case.
  *
  * Emits the user's full stage vector on every change (Update mode
  * sink); unreached stages are Long.MaxValue.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, stage: Int, epoch_us: Long)

  /** stageUs(i) = earliest admitted micros of stage i (MaxValue if not
    * reached yet). */
  case class FunnelState(stageUs: Seq[Long])

  case class FunnelRow(user_id: Long, stageUs: Seq[Long])

  /** Works identically on a stream (cross-trigger state, checkpointed)
    * and on a batch Dataset (one pass). `nStages` is the funnel length;
    * events with stage outside [0, nStages) are ignored. */
  def track(events: Dataset[FunnelEvent], nStages: Int): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    require(nStages >= 1)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user, it, state) =>
          val init = state.getOption
            .getOrElse(FunnelState(Seq.fill(nStages)(Long.MaxValue)))
          val st = init.stageUs.toArray
          // (time, stage) order makes in-batch disorder harmless: a
          // stage-0 event is admitted before the stage-1 event that
          // depends on it, even if they arrived reversed
          it.toVector.filter(e => e.stage >= 0 && e.stage < nStages)
            .sortBy(e => (e.epoch_us, e.stage))
            .foreach { e =>
              val floor = if (e.stage == 0) Long.MinValue else st(e.stage - 1)
              if (floor != Long.MaxValue && e.epoch_us >= floor &&
                  e.epoch_us < st(e.stage)) {
                st(e.stage) = e.epoch_us
                // downstream stages admitted against a now-stale floor
                // stay — they still satisfy the (tighter) new floor
              }
            }
          val changed = st.toSeq != init.stageUs
          state.update(FunnelState(st.toSeq))
          if (changed) Iterator(FunnelRow(user, st.toSeq)) else Iterator.empty
      }
  }
}
