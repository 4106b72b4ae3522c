package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.operators.Timeseries.gapFillHourlyLocf]]:
  * per-key dense hourly rows with LOCF gap fill, emitted AS THE STREAM
  * CLOSES HOURS instead of in one batch pass.
  *
  * Emission rule (append-final semantics):
  *  - an observed hour's row (n_events, its own cents sum) is emitted
  *    when a strictly later event for the key arrives, or when the
  *    watermark passes the end of the hour (event-time timeout) —
  *    whichever happens first;
  *  - the gap rows between two observed hours (n_events = 0, LOCF cents,
  *    is_gap = true) are emitted with the later observation — a gap is
  *    only defined once a later observation exists, exactly the batch
  *    grid's [min, max] bound, so a drained stream's output row-set
  *    equals the batch operator's (proven in StreamingGapFillSpec);
  *  - events at or before the last finalized hour are watermark-late and
  *    dropped (the batch/stream difference under disorder is the
  *    standard late-data trade, same as every watermarked aggregation).
  *
  * State per key is O(1): the open hour's partial sum plus the last
  * finalized (hour, cents) — independent of stream length and span.
  * In-batch disorder is neutralized by per-trigger (time)-ordered
  * replay; cents arrive pre-scaled (exact decimal → long upstream), so
  * state arithmetic is pure integer.
  */
object StreamingGapFill {

  case class Obs(key: Long, ts: Timestamp, cents: Long)

  case class GapState(
      pending: Option[(Long, Long, Long)], // (hr, n, cents) open hour
      last: Option[(Long, Long)])          // (hr, cents) last finalized

  case class HourRow(key: Long, hr: Long, n_events: Long,
      cents_filled: Long, is_gap: Boolean)

  private val HourMicros = 3600000000L

  /** Requires a watermark on `ts` when run on a stream — event-time
    * timeouts close open hours; the still-open hour at end-of-stream
    * stays unemitted until the watermark passes it (advance it with a
    * sentinel, or drain). The one-pass batch equivalent is
    * [[graft.operators.Timeseries.gapFillHourlyLocf]]. */
  def fill(events: Dataset[Obs]): Dataset[HourRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[GapState, HourRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          var st = state.getOption.getOrElse(GapState(None, None))
          val out = Vector.newBuilder[HourRow]

          def finalizePending(): Unit = st.pending.foreach {
            case (hr, n, cents) =>
              out += HourRow(key, hr, n, cents, is_gap = false)
              st = GapState(None, Some((hr, cents)))
          }

          val evs = it.toVector
          if (evs.isEmpty && state.hasTimedOut) {
            // watermark passed the end of the open hour: close it
            finalizePending()
          } else {
            evs.sortBy(_.ts.getTime).foreach { e =>
              val hr = e.ts.getTime * 1000L / HourMicros
              st.pending match {
                case Some((phr, n, cents)) =>
                  if (hr == phr) st = st.copy(pending = Some((phr, n + 1, cents + e.cents)))
                  else if (hr > phr) {
                    finalizePending()
                    (phr + 1) until hr foreach { g =>
                      out += HourRow(key, g, 0L, cents, is_gap = true)
                    }
                    st = st.copy(pending = Some((hr, 1L, e.cents)))
                  } // hr < phr: watermark-late, dropped
                case None =>
                  st.last match {
                    case Some((lhr, lcents)) if hr <= lhr => () // late, dropped
                    case Some((lhr, lcents)) =>
                      (lhr + 1) until hr foreach { g =>
                        out += HourRow(key, g, 0L, lcents, is_gap = true)
                      }
                      st = st.copy(pending = Some((hr, 1L, e.cents)))
                    case None =>
                      st = st.copy(pending = Some((hr, 1L, e.cents)))
                  }
              }
            }
          }
          state.update(st)
          // arm the close-of-hour timer for whatever hour is now open;
          // clamp above the current watermark (a late-but-kept event can
          // open an hour the watermark already passed)
          st.pending.foreach { case (hr, _, _) =>
            state.setTimeoutTimestamp(
              math.max((hr + 1) * 3600000L, state.getCurrentWatermarkMs + 1))
          }
          out.result().iterator
      }
  }
}
