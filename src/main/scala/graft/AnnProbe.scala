package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine_sim
import graft.operators.{Ivf, Knn, Pq}

/** ANN operating-point probe: sweeps the stored-IVF (and IVF-PQ) search
  * over nprobe/rerank on the sf0.1 embeddings and reports, per point,
  * recall@10 against the exact kNN ground truth and the fraction of
  * corpus BYTES READ (probed cell partition sizes over the total stored
  * index size — the quantity partition pruning actually bounds).
  *
  * This pins where the Spark-native index meets the reference's HNSW
  * default (usearch m=16, ef_search=100 — an operating point usually
  * quoted at recall@10 ≳ 0.95, `/root/reference/config.yaml:49-56`) and
  * what that recall costs in bytes at 100 TB. Results table lives in
  * SCALE.md §ANN.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "16").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = e.filter(col("vec_id") < 100)
    val k = 10
    val gt = Knn.exact(e, queries, k = k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gt.count()

    // production-path index (ML k-means fit), persisted partitioned by cell
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_c$nCells"
    Ivf.writeIndex(Ivf.build(e, nCells = nCells), path)
    val stored = Ivf.readIndex(spark, path)
    stored.assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()

    // on-disk bytes per cell directory — what a probe of that cell reads
    val cellBytes: Map[Int, Long] = {
      val base = new java.io.File(s"$path/assigned")
      base.listFiles().filter(_.getName.startsWith("cell_id=")).map { d =>
        val id = d.getName.stripPrefix("cell_id=").toInt
        id -> d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      }.toMap
    }
    val totalBytes = cellBytes.values.sum

    /** Distinct cells the query batch probes at `nprobe` (same ranking as
      * Ivf's probe: cosine of query vs centroid, ties to lower cell). */
    def probedCells(nprobe: Int): Set[Int] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("_s").desc, col("cell_id"))
      queries.select(col("vec_id").as("query_id"), col("embedding"))
        .crossJoin(broadcast(stored.cells))
        .withColumn("_s", cosine_sim(col("embedding"),
          col("centroid").cast("array<float>")))
        .withColumn("_r", row_number().over(w))
        .filter(col("_r") <= nprobe)
        .select(col("cell_id")).distinct()
        .collect().map(_.getInt(0)).toSet
    }

    def meanRecallPpm(res: DataFrame): Long = {
      val r = Knn.recallAtK(gt, res)
        .agg(avg(col("recall_ppm"))).head().getDouble(0)
      math.round(r)
    }
    def timeIt(f: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }.min

    Seq(1, 2, 3, 4, 6, 8).filter(_ <= nCells).foreach { nprobe =>
      val res = Ivf.searchPruned(stored, queries, k = k, nprobe = nprobe)
      val recall = meanRecallPpm(res)
      val sec = timeIt(Ivf.searchPruned(stored, queries, k = k, nprobe = nprobe))
      val frac = probedCells(nprobe).map(cellBytes.getOrElse(_, 0L)).sum * 1000000L / totalBytes
      println(s"""ANN {"variant":"ivf","ncells":$nCells,"nprobe":$nprobe,"recall_at10_ppm":$recall,"bytes_frac_ppm":$frac,"sec":${f"$sec%.2f"}}""")
    }

    // IVF-PQ with exact refine: ADC on 8-byte codes inside probed cells,
    // true-cosine rerank of the shortlist only
    val cb = Pq.labelCodebook(e, "label", "embedding", m = 8, dim = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codes = Pq.encode(e, cb, "vec_id", "embedding", m = 8, dim = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cb.count(); codes.count()
    for (nprobe <- Seq(2, 4); rerank <- Seq(10, 20, 50)) {
      val res = Ivf.searchPqPruned(stored, cb, codes, queries, k = k,
        nprobe = nprobe, m = 8, dim = 64, rerank = rerank)
      val recall = meanRecallPpm(res)
      val sec = timeIt(Ivf.searchPqPruned(stored, cb, codes, queries, k = k,
        nprobe = nprobe, m = 8, dim = 64, rerank = rerank))
      val frac = probedCells(nprobe).map(cellBytes.getOrElse(_, 0L)).sum * 1000000L / totalBytes
      println(s"""ANN {"variant":"ivf_pq","ncells":$nCells,"nprobe":$nprobe,"rerank":$rerank,"recall_at10_ppm":$recall,"bytes_frac_ppm":$frac,"sec":${f"$sec%.2f"}}""")
    }
    spark.stop()
  }
}
