package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shared per-execution resource counters for the measurement mains
  * (Bench, ScaleProbe): shuffle bytes written and peak single-task
  * execution memory, accumulated over task-end events. ONE
  * implementation on purpose — the bench record and the scale tiers
  * must census the same numbers.
  *
  * Usage: reset() before the representative execution, drain() after
  * it (the listener bus is async), then read the getters. drain() is
  * DETERMINISTIC: it blocks on the listener bus's own empty condition
  * (via [[org.apache.spark.graftbridge.ListenerBridge]]), so every
  * task-end event of the window is counted in THIS window — a
  * straggler can no longer slip its shuffle bytes into the next
  * query's record (the pre-round-10 sleep-poll could misattribute if
  * the bus lagged more than one 50 ms stride). The 10 s timeout is a
  * liveness backstop only; on timeout the old bounded poll runs as a
  * last resort. */
final class TaskMetricsProbe(sc: SparkContext) {
  private val tasksEnded = new AtomicLong(0)
  private val shufBytes = new AtomicLong(0)
  private val peakTaskMem = new AtomicLong(0)
  sc.addSparkListener(new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peakTaskMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
      }
      tasksEnded.incrementAndGet()
    }
  })

  def reset(): Unit = { shufBytes.set(0); peakTaskMem.set(0) }

  /** Deterministic drain: wait until the async listener bus has
    * dispatched every queued event (so all task-end events belong to
    * the window being closed). Falls back to the pre-round-10 bounded
    * stability poll only if the bus fails to drain within 10 s. */
  def drain(): Unit = {
    val drained = org.apache.spark.graftbridge.ListenerBridge
      .waitUntilListenerBusEmpty(sc, 10000L)
    if (!drained) {
      var last = tasksEnded.get()
      Thread.sleep(20)
      var waited = 20
      while (waited < 1000 && tasksEnded.get() != last) {
        last = tasksEnded.get()
        Thread.sleep(50); waited += 50
      }
    }
  }

  def shuffleMb: Double = shufBytes.get() / 1e6
  def peakTaskMemMb: Double = peakTaskMem.get() / 1e6
}
