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
  * it (the listener bus is async), then read the getters. A straggler
  * event past the bounded drain only pads the NEXT window — never a
  * timed region, which these counters are kept out of by design. */
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

  /** Wait until the task-end count is stable: a short first poll (the
    * common already-quiet case costs ~20 ms, not a 100 ms floor), then
    * 50 ms strides while events are still arriving, bounded at 1 s. */
  def drain(): Unit = {
    var last = tasksEnded.get()
    Thread.sleep(20)
    var waited = 20
    while (waited < 1000 && tasksEnded.get() != last) {
      last = tasksEnded.get()
      Thread.sleep(50); waited += 50
    }
  }

  def shuffleMb: Double = shufBytes.get() / 1e6
  def peakTaskMemMb: Double = peakTaskMem.get() / 1e6
}
