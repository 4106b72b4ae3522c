package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-key event-type transition extraction ON THE STREAM — the
  * ingest-time form of the batch transition matrix
  * ([[graft.operators.Timeseries.transitionMatrix]], q155): one
  * `(prev_type → next_type)` row per consecutive step in each key's
  * `(epoch_us, seq)`-ordered stream, feeding any downstream aggregation
  * (the matrix itself, per-origin monitors, journey alarms).
  *
  * State per key is O(1) — the last admitted event — so state size is
  * |keys| regardless of stream length. Each trigger replays its group's
  * arrivals in `(epoch_us, seq)` order, so in-batch disorder cannot
  * invert a step; cross-trigger, an arrival older than the stored last
  * event is DROPPED (the standard online late-data trade — a transition
  * already emitted is never retracted). For event-time-ordered triggers
  * the drained stream's rows equal the batch lag-window pairs exactly;
  * run on a batch Dataset the whole group replays in one call, so batch
  * output ≡ the q155 window form for ANY input — which is how q157 puts
  * this state machine under the driver's oracle gate (the q107/q147
  * discipline).
  */
object StreamingTransitions {

  case class Step(key: Long, epoch_us: Long, seq: Long, etype: String)

  case class LastSeen(epoch_us: Long, seq: Long, etype: String)

  case class Transition(key: Long, prev_type: String, next_type: String)

  /** Works identically on a stream (cross-trigger state, checkpointed)
    * and on a batch Dataset (one pass per group). */
  def steps(events: Dataset[Step]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val out = Vector.newBuilder[Transition]
          var last = state.getOption
          it.toVector.sortBy(e => (e.epoch_us, e.seq)).foreach { e =>
            last match {
              case None =>
                last = Some(LastSeen(e.epoch_us, e.seq, e.etype))
              case Some(l) =>
                // strictly-newer admission: a cross-trigger straggler
                // older than the stored last event is dropped, never
                // spliced (its transition slot is already emitted)
                if (e.epoch_us > l.epoch_us ||
                    (e.epoch_us == l.epoch_us && e.seq > l.seq)) {
                  out += Transition(key, l.etype, e.etype)
                  last = Some(LastSeen(e.epoch_us, e.seq, e.etype))
                }
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
