package graft
import org.apache.spark.sql.SparkSession

/** Sampling profiler for any declared query (the Q255Probe technique,
  * generalized): run the query repeatedly, sample every RUNNABLE thread's
  * top stack frames at 25 ms, and histogram them — names where the wall
  * time actually goes (interpreted expression eval, shuffle, codegen,
  * planning), without the UI. Also splits plan-construction time from
  * execution and reports GC.
  * Usage: runMain graft.HotFrames <queryName> [repeat] */
object HotFrames {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache(); System.gc()
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warm
    val fn = SparkEntry.queries(name)
    clean(); fn(spark, sfDir).count() // codegen warmup
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val exemplars = new java.util.concurrent.ConcurrentHashMap[String, String]()
    @volatile var sampling = false
    val self = Thread.currentThread().getName
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (th, frames) =>
            if (th.getState == Thread.State.RUNNABLE && frames.nonEmpty &&
                th.getName != self && !th.getName.contains("sampler")) {
              frames.take(3).foreach { f =>
                frameCounts.merge(f.getClassName + "." + f.getMethodName, 1, (a, b) => a + b)
              }
              // one full exemplar stack per distinct hot-frame owner class
              val hot = frames.head.getClassName
              if (hot.startsWith("org.apache.spark.sql.catalyst.expressions"))
                exemplars.putIfAbsent(hot, frames.take(22).mkString(" <- "))
            }
          }
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true); sampler.setName("hotframes-sampler"); sampler.start()
    (1 to repeat).foreach { i =>
      clean()
      sampling = true
      val (g0, t0) = (gcMs(), System.nanoTime())
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime() // construction incl. eager jobs inside the operator
      df.queryExecution.executedPlan // analysis+optimize+physical (pre-AQE)
      val tPlan = System.nanoTime()
      val n = df.count()
      sampling = false
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $name run$i total $sec%.2f s (build ${(tBuild - t0) / 1e9}%.2f catalyst ${(tPlan - tBuild) / 1e9}%.2f) gcMs=${gcMs() - g0} rows=$n")
    }
    import scala.jdk.CollectionConverters._
    frameCounts.asScala.toSeq.sortBy(-_._2.intValue).take(30)
      .foreach { case (f, c) => println(s"FRAME $c $f") }
    exemplars.asScala.take(6).foreach { case (k, st) => println(s"STACK [$k] $st") }
    spark.stop()
  }
}
