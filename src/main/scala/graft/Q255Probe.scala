package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the round-11 q255 in-sweep regression: q255 reads
  * ~1.8 s solo on an idle box but ~3.1-3.9 s late in a 260-query
  * single-JVM sweep, with flat load calibration and a stable code
  * cache. This probe reproduces the late-sweep JVM state on demand —
  * `args(0)` filler queries run once each (the sweep's plan diversity),
  * then the suspects are timed with per-run GC-time deltas:
  * q255 itself, q248 (the same lmSurprisal scan without q255's
  * readout), and a no-checkpoint q255 variant (isolates the
  * localCheckpoint write/read from the histogram+broadcast readout).
  */
object Q255Probe {
  def main(args: Array[String]): Unit = {
    // args: fromIdx nFillers — the filler slice [from, from+n) of the
    // registry order, for bisecting which queries poison the session
    val fromIdx = args.headOption.map(_.toInt).getOrElse(0)
    val nFillers = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapMb(): Long = {
      val r = Runtime.getRuntime
      (r.totalMemory - r.freeMemory) >> 20
    }
    def poolMb(prefix: String): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith(prefix))
        .map(_.getUsage.getUsed >> 20).sum
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val fillers = SparkEntry.queries.keys.toSeq
      .filterNot(n => n.startsWith("q255") || n.startsWith("q248"))
      .slice(fromIdx, fromIdx + nFillers)
    fillers.foreach { nm =>
      clean()
      try SparkEntry.queries(nm)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    println(s"PROBE fillers=${fillers.size} heapMb=${heapMb()} gcTotalMs=${gcMs()} " +
      s"metaspaceMb=${poolMb("Metaspace")} classSpaceMb=${poolMb("Compressed Class Space")} " +
      s"codeCacheMb=${poolMb("CodeHeap")}")
    // surface the codegen-fallback warnings the ERROR level hides
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.TextAnalysis
    def docs() = graft.sources.Tables(spark, sfDir, "documents")
    // q255 without the localCheckpoint: same math, three re-computations
    def q255NoCkpt() = {
      val d = docs()
      val scored = TextAnalysis.lmSurprisal(
        d, d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      val nDocs = scored.agg(count(lit(1)).as("nd"))
      val bins = scored
        .groupBy(expr("bits_fp div 256").as("_bin"))
        .agg(count(lit(1)).as("_n"))
        .withColumn("_cum", sum(col("_n")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("_bin"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .crossJoin(broadcast(nDocs))
        .select(col("_bin"),
          when(col("_cum") <= expr("nd div 3"), lit("head"))
            .when(col("_cum") <= expr("(2 * nd) div 3"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
      scored.join(broadcast(bins), expr("bits_fp div 256") === col("_bin"))
        .select(col("doc_id"), col("bucket")).orderBy(col("doc_id"))
    }
    val blocks: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q255" -> (() => SparkEntry.queries("q255_perplexity_buckets")(spark, sfDir)),
      "q248" -> (() => SparkEntry.queries("q248_lm_surprisal")(spark, sfDir)),
      "q255nc" -> (() => q255NoCkpt()),
    )
    blocks.foreach { case (name, fn) =>
      clean()
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      try fn().count() catch { case e: Throwable => println(s"ERR $name $e") }
      println(s"PROBE rule time after $name warmup:\n" +
        org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
          .linesIterator.take(14).mkString("\n"))
      // sampling profiler for run 1: every 50 ms, count RUNNABLE-thread
      // stack frames; the aggregate names where the wall time goes
      val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      val exemplars = new java.util.concurrent.ConcurrentHashMap[String, String]()
      @volatile var sampling = false
      val sampler = new Thread(() => {
        while (true) {
          if (sampling) {
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (th, frames) =>
              if (th.getState == Thread.State.RUNNABLE && frames.nonEmpty) {
                frames.take(3).foreach { f =>
                  frameCounts.merge(f.getClassName + "." + f.getMethodName, 1,
                    (a, b) => a + b)
                }
                // keep one full stack per thread-name whose hot frame is
                // the interpreted div — the why, not just the what
                if (frames.exists(_.getClassName.endsWith("IntegralDivide")) ||
                    frames.exists(_.getClassName.contains("DivModLike")))
                  exemplars.putIfAbsent(th.getName,
                    frames.take(25).mkString(" <- "))
              }
            }
          }
          Thread.sleep(50)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      (1 to 3).foreach { i =>
        clean()
        sampling = i == 1
        val (g0, t0) = (gcMs(), System.nanoTime())
        val df = fn()
        // force analysis + optimization + physical planning (NOT AQE
        // re-planning, which happens during execution)
        df.queryExecution.executedPlan
        val tPlan = System.nanoTime()
        val n = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val planSec = (tPlan - t0) / 1e9
        println(f"PROBE $name run$i $sec%.2f s (plan $planSec%.2f) gcMs=${gcMs() - g0} rows=$n heapMb=${heapMb()}")
        if (i == 1) {
          sampling = false
          import scala.jdk.CollectionConverters._
          val top = frameCounts.asScala.toSeq.sortBy(-_._2.intValue).take(15)
          top.foreach { case (f, c) => println(s"PROBE frame $name $c $f") }
          exemplars.asScala.take(2).foreach { case (tn, st) =>
            println(s"PROBE stack $name [$tn] $st")
          }
        }
      }
    }
    spark.stop()
  }
}
