package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall breakdown for one declared query: prints each Spark job's
  * duration and call site, so the sequential-job structure a loaded box
  * multiplies (the q38/q161 round-7 lesson) is visible without the UI.
  * Usage: runMain graft.JobProfile <queryName> [repeat] */
object JobProfile {
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
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // callSite.short is often absent on SQL-launched jobs; fall back
        // to the result stage's name (e.g. "count at Dedup.scala:532"),
        // plus the job's stage/task census so fan-out is visible.
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(j.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        val census = s"[${j.stageInfos.size}st/${j.stageInfos.map(_.numTasks).sum}tk]"
        starts += j.jobId -> (j.time, s"$census $site")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          lines.synchronized { lines += ((j.jobId, (j.time - t0) / 1e3, site)) }
        }
    })
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // JVM warm
    (1 to repeat).foreach { i =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      lines.synchronized(lines.clear())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading: wait until the
      // event count is stable (the bus API is private), so a straggler
      // job-end can't race the report or land in the next run's list
      var last = -1
      var waited = 0
      while (waited < 2000 && lines.synchronized(lines.size) != last) {
        last = lines.synchronized(lines.size)
        Thread.sleep(100); waited += 100
      }
      val snap = lines.synchronized(lines.sortBy(_._1).toVector)
      println(f"== $name run$i total $sec%.2f s rows=$n jobs=${snap.size}")
      snap.foreach { case (id, s, site) =>
        println(f"  job $id%3d  $s%7.2f s  $site")
      }
    }
    spark.stop()
  }
}
