package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q161 shuffle-exponent decomposition: SCALE.md's tier table shows
  * `Corpus.curate`'s shuffle growing 1.76× per data× across the 30×
  * decade — super-linear. This probe attributes that growth stage by
  * stage to decide whether it is (a) the replica protocol inflating
  * near-dup density (ScaleProbe copies document TEXTS verbatim across
  * replicas, so every doc gains a k-clique of exact copies — pair-stage
  * work rises with replication by construction, a property of the
  * probe's corpus, not of the plan) or (b) a genuine fan-out in the
  * banded join stages (which would need a band-occupancy cap).
  *
  * Per tier it counts each stage's output and stamps the stage's
  * shuffle bytes (TaskMetricsProbe around a count() of ONLY that
  * stage's new work, upstream persisted — the same scoping curate
  * itself uses):
  *   shingle sets → minhash band rows → near-dup pairs → components →
  *   containment pairs → quantile-normalized scores → final verdict.
  *
  * Usage: SPARK_GRAFT_SCALE_TIERS=1,30 sbt "runMain graft.CurateProbe"
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tiers = sys.env.getOrElse("SPARK_GRAFT_SCALE_TIERS", "1,30")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new TaskMetricsProbe(spark.sparkContext)
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache(); System.gc()
    }
    tiers.foreach { k =>
      val dir =
        if (k == 1) srcDir
        else {
          val d = s"/tmp/scaleprobe/x$k"
          if (!new java.io.File(s"$d/lineitem.parquet").exists())
            ScaleProbe.synthesize(spark, srcDir, d, k)
          d
        }
      clean()
      val docs = graft.sources.Tables(spark, dir, "documents")
      def stage(name: String)(body: => Long): Unit = {
        metrics.drain(); metrics.reset()
        val t0 = System.nanoTime()
        val n = body
        metrics.drain()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""CURATE {"tier":$k,"stage":"$name","rows":$n,"sh_mb":${metrics.shuffleMb}%.1f,"sec":$sec%.2f}""")
        System.out.flush()
      }
      val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stage("shingle_sets") { sets.count() }
      val pairs = graft.operators.Dedup
        .nearDupPairsFromSets(sets, minJaccard = 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stage("neardup_pairs") { pairs.count() }
      stage("components") {
        graft.operators.Dedup.nearDupGroups(pairs).count()
      }
      val cont = graft.operators.Dedup
        .containmentPairsFromSets(sets, 9, 10)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stage("containment_pairs") { cont.count() }
      stage("quality_norm") {
        val scored = docs.select(col("doc_id"), col("source"))
          .join(graft.operators.TextAnalysis
            .qualityScores(docs, "doc_id", "text")
            .select(col("doc_id"), col("quality_ppm")), Seq("doc_id"))
        graft.operators.Normalize
          .quantileNormalize(scored, "doc_id", "source", "quality_ppm")
          .count()
      }
      stage("full_curate") {
        clean()
        graft.operators.Corpus.curate(docs).count()
      }
      clean()
    }
    spark.stop()
  }
}
