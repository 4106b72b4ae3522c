package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-key consecutive-failure streak tracking ON THE STREAM — the
  * ingest-time form of the batch gaps-and-islands streak query (q176):
  * every trigger updates each key's running (error count, current
  * streak, longest streak) and emits the refreshed summary row.
  *
  * State per key is O(1) — four longs — so state size is |keys|
  * regardless of stream length (a gaps-and-islands window would need
  * the key's full history). Each trigger replays its group's arrivals
  * in `(epoch_us, seq)` order, so in-batch disorder cannot split a
  * streak; cross-trigger, an arrival older than the stored last event
  * is DROPPED (the [[StreamingTransitions]] admission rule — a streak
  * boundary already folded is never retracted). Run on a batch Dataset
  * the whole group replays in one call, so batch output ≡ the
  * gaps-and-islands window form for ANY input — which is how q179 puts
  * this state machine under the driver's oracle gate (the
  * q107/q147/q157 discipline).
  */
object StreamingStreaks {

  case class Ev(key: Long, epoch_us: Long, seq: Long, is_err: Boolean)

  case class StreakState(
      epoch_us: Long, seq: Long, cur: Long, longest: Long, n_err: Long)

  case class Streak(key: Long, n_errors: Long, max_streak: Long)

  /** Works identically on a stream (cross-trigger state, checkpointed)
    * and on a batch Dataset (one pass per group). Emits one refreshed
    * summary row per key per trigger; keys with no errors yet emit
    * zeros (filter downstream if only failing keys matter). */
  def streaks(events: Dataset[Ev]): Dataset[Streak] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[StreakState, Streak](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var st = state.getOption
            .getOrElse(StreakState(Long.MinValue, Long.MinValue, 0L, 0L, 0L))
          it.toVector.sortBy(e => (e.epoch_us, e.seq)).foreach { e =>
            // strictly-newer admission (cross-trigger stragglers drop)
            if (e.epoch_us > st.epoch_us ||
                (e.epoch_us == st.epoch_us && e.seq > st.seq)) {
              val cur = if (e.is_err) st.cur + 1 else 0L
              st = StreakState(e.epoch_us, e.seq, cur,
                math.max(st.longest, cur),
                st.n_err + (if (e.is_err) 1L else 0L))
            }
          }
          state.update(st)
          Iterator.single(Streak(key, st.n_err, st.longest))
      }
  }
}
