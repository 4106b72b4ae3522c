package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{cosine_sim, l2_normalize}
import graft.operators.{Ivf, Knn, Pq}

/** ANN operating-point probe: sweeps the stored-IVF (and IVF-PQ) search
  * over nprobe/rerank and reports, per point, recall@10 against the
  * exact kNN ground truth and the MEAN PER-QUERY fraction of corpus
  * bytes read (each query probes `nprobe` cell partitions; the fraction
  * is that query's probed-partition bytes over the total stored size —
  * the quantity partition pruning bounds for a single search).
  *
  * Runs the sweep over TWO corpora:
  *
  *  - `isotropic`: the sf0.1 fixture embeddings as-is. These are
  *    near-uniform random unit vectors (measured within-label mean
  *    cosine ≈ cross-label ≈ 0), the INFORMATION-THEORETIC WORST CASE
  *    for any coarse-quantization index: true neighbors scatter
  *    uniformly across cells, so recall ~ nprobe/nCells and no index —
  *    IVF or HNSW — prunes for free.
  *  - `clustered`: the same ids with a deterministic per-label center
  *    blended in (unit center × 2 + original vector, re-normalized;
  *    within-cluster cosine ≈ 0.8) — the shape real embedding corpora
  *    have, and where an IVF probe earns its keep.
  *
  * The reference's HNSW default (usearch m=16, ef_search=100,
  * `/root/reference/config.yaml:49-56`) is conventionally quoted at
  * recall@10 ≳ 0.95; the clustered sweep pins the nprobe where the
  * Spark-native index reaches that, and what it reads to get there.
  * Results table lives in SCALE.md §ANN.
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
    val base = graft.sources.Tables(spark, sfDir, "embeddings")

    // deterministic per-label unit centers (seeded Gaussian, normalized)
    val dim = 64
    val centers: Seq[(Int, Seq[Double])] = (0 until 10).map { l =>
      val r = new scala.util.Random(1000L + l)
      val c = Seq.fill(dim)(r.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      l -> c.map(_ / n)
    }
    val centerExpr = centers.tail.foldLeft(
      array(centers.head._2.map(lit): _*)) { case (acc, (l, c)) =>
      when(col("label") === l, array(c.map(lit): _*)).otherwise(acc)
    }
    val clustered = base.withColumn("embedding",
      l2_normalize(zip_with(centerExpr,
        col("embedding").cast("array<double>"),
        (c, x) => c * lit(2.0) + x)).cast("array<float>"))

    Seq("isotropic" -> base, "clustered" -> clustered).foreach {
      case (corpusName, e0) =>
        val e = e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count()
        val queries = e.filter(col("vec_id") < 100)
        val k = 10
        val gt = Knn.exact(e, queries, k = k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        gt.count()

        val path = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_${corpusName}_c$nCells"
        Ivf.writeIndex(Ivf.build(e, nCells = nCells), path)
        val stored = Ivf.readIndex(spark, path)
        stored.assigned.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()

        // on-disk bytes per cell directory — what probing that cell reads
        val cellBytes: Map[Int, Long] = {
          val dirBase = new java.io.File(s"$path/assigned")
          dirBase.listFiles().filter(_.getName.startsWith("cell_id=")).map { d =>
            val id = d.getName.stripPrefix("cell_id=").toInt
            id -> d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(_.length()).sum
          }.toMap
        }
        val totalBytes = cellBytes.values.sum

        /** Mean per-query bytes fraction (ppm) at `nprobe`: each query
          * reads its own nprobe nearest cell partitions (same ranking as
          * Ivf's probe — cosine vs centroid, ties to lower cell). */
        def meanBytesFracPpm(nprobe: Int): Long = {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("query_id"))
            .orderBy(col("_s").desc, col("cell_id"))
          val perQuery = queries
            .select(col("vec_id").as("query_id"), col("embedding"))
            .crossJoin(broadcast(stored.cells))
            .withColumn("_s", cosine_sim(col("embedding"),
              col("centroid").cast("array<float>")))
            .withColumn("_r", row_number().over(w))
            .filter(col("_r") <= nprobe)
            .select(col("query_id"), col("cell_id"))
            .collect().groupBy(_.getLong(0))
            .map { case (_, rows) =>
              rows.map(r => cellBytes.getOrElse(r.getInt(1), 0L)).sum.toDouble / totalBytes
            }
          math.round(perQuery.sum / perQuery.size * 1000000L)
        }

        def meanRecallPpm(res: DataFrame): Long =
          math.round(Knn.recallAtK(gt, res)
            .agg(avg(col("recall_ppm"))).head().getDouble(0))
        def timeIt(f: => DataFrame): Double =
          (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f.count()
            (System.nanoTime() - t0) / 1e9
          }.min

        Seq(1, 2, 3, 4, 6, 8, 12, 16).filter(_ <= nCells).foreach { nprobe =>
          val res = Ivf.searchPruned(stored, queries, k = k, nprobe = nprobe)
          val recall = meanRecallPpm(res)
          val sec = timeIt(Ivf.searchPruned(stored, queries, k = k, nprobe = nprobe))
          val frac = meanBytesFracPpm(nprobe)
          println(s"""ANN {"corpus":"$corpusName","variant":"ivf","ncells":$nCells,"nprobe":$nprobe,"recall_at10_ppm":$recall,"query_bytes_ppm":$frac,"sec":${f"$sec%.2f"}}""")
        }

        // IVF-PQ with exact refine: ADC on 8-byte codes in probed cells,
        // true-cosine rerank of the shortlist only
        val cb = Pq.trainCodebook(e, "vec_id", "embedding", m = 8, dim = dim,
            k = 16)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val codes = Pq.encode(e, cb, "vec_id", "embedding", m = 8, dim = dim)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cb.count(); codes.count()
        for (nprobe <- Seq(2, 4); rerank <- Seq(20, 50, 100)) {
          val res = Ivf.searchPqPruned(stored, cb, codes, queries, k = k,
            nprobe = nprobe, m = 8, dim = dim, rerank = rerank)
          val recall = meanRecallPpm(res)
          val sec = timeIt(Ivf.searchPqPruned(stored, cb, codes, queries,
            k = k, nprobe = nprobe, m = 8, dim = dim, rerank = rerank))
          val frac = meanBytesFracPpm(nprobe)
          println(s"""ANN {"corpus":"$corpusName","variant":"ivf_pq","ncells":$nCells,"nprobe":$nprobe,"rerank":$rerank,"recall_at10_ppm":$recall,"query_bytes_ppm":$frac,"sec":${f"$sec%.2f"}}""")
        }
        e.unpersist(); gt.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
