package graft
import org.apache.spark.sql.SparkSession

/** Where does DataFrame CONSTRUCTION time go? Builds the declared query's
  * frame (no action), then dumps the top Catalyst rules by cumulative time
  * — separating eager-analysis cost (paid per transformation while the
  * operator composes) from execution. Usage: runMain graft.PlanCost <q> */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warm
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm the whole path once
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache(); System.gc()
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    // sample the DRIVER thread (this one) during construction
    val self = Thread.currentThread()
    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val exemplar = new java.util.concurrent.atomic.AtomicReference[String]("")
    val sampler = new Thread(() => {
      while (sampling) {
        val st = self.getStackTrace
        if (st.nonEmpty) {
          st.take(8).foreach(f => frames.merge(
            f.getClassName + "." + f.getMethodName, 1, (a, b) => a + b))
          if (st.exists(_.getClassName.contains("AdaptiveSparkPlanExec")) &&
              exemplar.get.isEmpty)
            exemplar.set(st.take(40).mkString("\n  "))
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    sampling = false
    val tBuild = System.nanoTime()
    df.queryExecution.executedPlan
    val tPlan = System.nanoTime()
    println(f"BUILD ${(tBuild - t0) / 1e9}%.2f s  OPT+PHYS ${(tPlan - tBuild) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    frames.asScala.toSeq.sortBy(-_._2.intValue).take(25)
      .foreach { case (f, c) => println(s"BFRAME $c $f") }
    println("EXEMPLAR:\n  " + exemplar.get)
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      .linesIterator.take(30).mkString("\n"))
    spark.stop()
  }
}
