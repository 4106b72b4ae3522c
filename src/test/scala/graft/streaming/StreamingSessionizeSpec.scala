package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StreamingSessionize.EventIn

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val MIN_US = 60L * 1000000L

  private def run(batches: Seq[Seq[EventIn]], gapMinutes: Int = 30)
      : Seq[(Long, Long, Long, Long)] = {
    val mem = MemoryStream[EventIn](spark)
    val q = StreamingSessionize.sessions(mem.toDS(), gapMinutes)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val out = spark.table("sess")
      .as[(Long, Long, Long, Long)].collect().toSeq
    spark.sql("DROP VIEW IF EXISTS sess")
    out
  }

  // watermark-advancer: a lone far-future event that finalizes everything
  // earlier (its own session stays open and unemitted)
  private def flush(user: Long = 999L) =
    EventIn(9999, user, 1000L * MIN_US)

  test("gap splits, proximity merges: sessions form per user") {
    val u1 = Seq(
      EventIn(1, 1, 0), EventIn(2, 1, 10 * MIN_US),          // session A
      EventIn(3, 1, 50 * MIN_US))                            // session B (40min gap)
    val out = run(Seq(u1 :+ flush()))
    assert(out.toSet == Set(
      (1L, 0L, 10 * MIN_US, 2L),
      (1L, 50 * MIN_US, 50 * MIN_US, 1L)))
  }

  test("a late event inside the watermark BRIDGES two open sessions") {
    // batch 1: two would-be sessions at t=0 and t=50min (gap 50 > 30)
    val b1 = Seq(EventIn(1, 1, 0), EventIn(2, 1, 50 * MIN_US))
    // batch 2: out-of-order t=25min arrives — 0→25 and 25→50 are both
    // within gap, so ONE merged session must come out
    val b2 = Seq(EventIn(3, 1, 25 * MIN_US))
    val out = run(Seq(b1, b2, Seq(flush())))
    assert(out.toSet == Set((1L, 0L, 50 * MIN_US, 3L)))
  }

  test("exactly-gap-wide pause still merges (inclusive boundary, = q46 rule)") {
    val evs = Seq(EventIn(1, 1, 0), EventIn(2, 1, 30 * MIN_US),
      EventIn(3, 1, 60 * MIN_US + 1))  // 30min + 1us: splits
    val out = run(Seq(evs :+ flush()))
    assert(out.toSet == Set(
      (1L, 0L, 30 * MIN_US, 2L),
      (1L, 60 * MIN_US + 1, 60 * MIN_US + 1, 1L)))
  }

  test("batch and stream produce identical sessions (time-ordered batch cuts)") {
    // deterministic pseudo-random event times across 5 users, arriving in
    // event-time order (cross-batch disorder beyond the watermark is
    // legitimately dropped by a stream — covered by the late-drop test)
    val evs = (1L to 120L).map { i =>
      val user = i % 5
      val t = ((i * 2654435761L) % 97L) * 7L * MIN_US + user * MIN_US
      EventIn(i, user, t)
    }.sortBy(e => (e.epoch_us, e.event_id))
    val streamed = run(Seq(
        evs.take(40), evs.slice(40, 80), evs.drop(80), Seq(flush())))
      .filterNot(_._1 == 999L).toSet
    val batch = StreamingSessionize.sessions(evs.toDS())
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    // cross-check against an independent lag-based reference (inclusive
    // boundary — the q46 rule)
    val ref = evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.epoch_us, e.event_id))
      val sessions = sorted.foldLeft(Vector.empty[Vector[EventIn]]) { (acc, e) =>
        if (acc.nonEmpty && e.epoch_us - acc.last.last.epoch_us <= 30 * MIN_US)
          acc.init :+ (acc.last :+ e)
        else acc :+ Vector(e)
      }
      sessions.map(ss =>
        (u, ss.head.epoch_us, ss.last.epoch_us, ss.size.toLong))
    }.toSet
    assert(batch == ref)
  }

  test("events older than the watermark are dropped, state stays bounded") {
    val b1 = Seq(EventIn(1, 1, 500 * MIN_US), flush(999L))
    // watermark is now ~(1000min - 60min); this ancient event must not
    // resurrect a session
    val b2 = Seq(EventIn(2, 1, 10 * MIN_US))
    val out = run(Seq(b1, b2, Seq(flush(998L))))
    assert(out.toSet == Set((1L, 500 * MIN_US, 500 * MIN_US, 1L)))
  }
}
