package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamingStreaks._

class StreamingStreaksSpec extends SparkSpec {
  import spark.implicits._

  //  key 1: E E . E E E .  -> n=5, max=3
  //  key 2: . .            -> n=0, max=0
  //  key 3: E              -> n=1, max=1
  private val events = Seq(
    Ev(1L, 100L, 0L, true), Ev(1L, 200L, 1L, true), Ev(1L, 300L, 2L, false),
    Ev(1L, 400L, 3L, true), Ev(1L, 500L, 4L, true), Ev(1L, 600L, 5L, true),
    Ev(1L, 700L, 6L, false),
    Ev(2L, 100L, 7L, false), Ev(2L, 200L, 8L, false),
    Ev(3L, 100L, 9L, true)
  )

  private def byKey(s: Seq[Streak]): Map[Long, (Long, Long)] =
    s.map(x => x.key -> (x.n_errors, x.max_streak)).toMap

  test("batch run equals gaps-and-islands, disorder replayed in order") {
    val shuffled = new scala.util.Random(3).shuffle(events)
    val got = byKey(streaks(shuffled.toDS()).collect().toSeq)
    assert(got == Map(1L -> (5L, 3L), 2L -> (0L, 0L), 3L -> (1L, 1L)))
  }

  test("streak spanning a trigger boundary keeps counting; stale arrival drops") {
    val mem = MemoryStream[Ev](spark)
    val q = streaks(mem.toDS()).writeStream
      .outputMode(OutputMode.Update()).format("memory")
      .queryName("streaks").start()
    mem.addData(Ev(9L, 100L, 0L, true), Ev(9L, 200L, 1L, true))
    q.processAllAvailable()
    mem.addData(Ev(9L, 300L, 2L, true)) // continues the cross-trigger streak
    q.processAllAvailable()
    mem.addData(Ev(9L, 250L, 3L, false)) // STALE: must not split the streak
    q.processAllAvailable()
    mem.addData(Ev(9L, 400L, 4L, false), Ev(9L, 500L, 5L, true))
    q.processAllAvailable()
    q.stop()
    // last emitted row per key is the current summary
    val last = spark.table("streaks").as[Streak].collect().toSeq.last
    assert((last.n_errors, last.max_streak) == (4L, 3L))
  }

  test("drained in-order stream's final rows ≡ batch, any trigger slicing") {
    val mem = MemoryStream[Ev](spark)
    val q = streaks(mem.toDS()).writeStream
      .outputMode(OutputMode.Update()).format("memory")
      .queryName("streaks2").start()
    events.sortBy(e => (e.epoch_us, e.seq)).grouped(4).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    // final emission per key (MemoryStream sink preserves arrival order)
    val finalRows = spark.table("streaks2").as[Streak].collect().toSeq
      .zipWithIndex.groupBy(_._1.key).map { case (k, rows) =>
        k -> { val r = rows.maxBy(_._2)._1; (r.n_errors, r.max_streak) }
      }
    val batch = byKey(streaks(events.toDS()).collect().toSeq)
    assert(finalRows == batch)
  }
}
