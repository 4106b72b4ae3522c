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
    // SPARK_GRAFT_ANN_DIM=768 switches to a synthesized production-dim
    // corpus (the PQ regime: per-vector bytes dominate) — same clustered
    // construction, 20k vectors, PQ at m = dim/8 subspaces
    val dim = sys.env.getOrElse("SPARK_GRAFT_ANN_DIM", "64").toInt
    val pqM = dim / 8
    // codebook size per subspace: 16 = 4-bit codes, 256 = 8-bit codes
    // (the production operating point — FAISS/ScaNN convention; byte
    // model below charges 1 byte/code either way, conservative for k=16)
    val pqK = sys.env.getOrElse("SPARK_GRAFT_ANN_PQK", "16").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic per-label unit centers (seeded Gaussian, normalized)
    val centers: Seq[(Int, Seq[Double])] = (0 until 10).map { l =>
      val r = new scala.util.Random(1000L + l)
      val c = Seq.fill(dim)(r.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      l -> c.map(_ / n)
    }

    val corpora: Seq[(String, DataFrame)] = if (dim == 64) {
      val base = graft.sources.Tables(spark, sfDir, "embeddings")
      val centerExpr = centers.tail.foldLeft(
        array(centers.head._2.map(lit): _*)) { case (acc, (l, c)) =>
        when(col("label") === l, array(c.map(lit): _*)).otherwise(acc)
      }
      val clustered = base.withColumn("embedding",
        l2_normalize(zip_with(centerExpr,
          col("embedding").cast("array<double>"),
          (c, x) => c * lit(2.0) + x)).cast("array<float>"))
      Seq("isotropic" -> base, "clustered" -> clustered)
    } else {
      // synthesized clustered corpus at production dims: unit noise +
      // 2× unit center, renormalized — the same within-cluster cosine
      // (~0.8) as the 64-dim clustered fixture, so the two sweeps
      // isolate DIMENSION as the only changed variable
      val centerArr = centers.map(_._2.toArray).toArray
      val nVecs = 20000
      val synth = spark.range(nVecs).map { i =>
        val lbl = (i % 10).toInt
        val r = new scala.util.Random(7777L + i)
        val noise = Array.fill(dim)(r.nextGaussian())
        val nn = math.sqrt(noise.map(x => x * x).sum)
        val c = centerArr(lbl)
        val v = Array.tabulate(dim)(j => c(j) * 2.0 + noise(j) / nn)
        val vn = math.sqrt(v.map(x => x * x).sum)
        (i, lbl, v.map(x => (x / vn).toFloat))
      }.toDF("vec_id", "label", "embedding")
      Seq(s"clustered_d$dim" -> synth)
    }

    corpora.foreach {
      case (corpusName, e0) =>
        val e = e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count()
        val queries = e.filter(col("vec_id") < 100)
        val k = 10
        val gt = Knn.exact(e, queries, k = k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        gt.count()

        val path = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_${corpusName}_c${nCells}_d$dim"
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

        /** Per-query probed cell ids at `nprobe` — the RAW stored
          * centroid, no cast, so the ranking replays Ivf.probeCells'
          * exact cell choice (a float cast could flip near-tie cells and
          * publish bytes for a probe set other than the one whose recall
          * was measured). */
        def probedCellsOf(nprobe: Int): Iterable[Seq[Int]] = {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("query_id"))
            .orderBy(col("_s").desc, col("cell_id"))
          queries
            .select(col("vec_id").as("query_id"), col("embedding"))
            .crossJoin(broadcast(stored.cells))
            .withColumn("_s", cosine_sim(col("embedding"), col("centroid")))
            .withColumn("_r", row_number().over(w))
            .filter(col("_r") <= nprobe)
            .select(col("query_id"), col("cell_id"))
            .collect().groupBy(_.getLong(0))
            .map { case (_, rows) => rows.map(_.getInt(1)).toSeq }
        }

        /** Mean per-query bytes fraction (ppm) at `nprobe`: each query
          * reads its own nprobe nearest cell partitions. */
        def meanBytesFracPpm(nprobe: Int): Long = {
          val perQuery = probedCellsOf(nprobe).map(
            _.map(cellBytes.getOrElse(_, 0L)).sum.toDouble / totalBytes)
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

        // IVF-PQ with exact refine: ADC on m-byte codes in probed cells,
        // true-cosine rerank of the shortlist only. m = dim/8 (8 dims per
        // subspace): 8 codes at 64 dims, 96 at 768.
        val cb = Pq.trainCodebook(e, "vec_id", "embedding", m = pqM, dim = dim,
            k = pqK)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val codes = Pq.encode(e, cb, "vec_id", "embedding", m = pqM, dim = dim)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cb.count(); codes.count()
        // per-cell row counts, for the PQ logical-bytes model
        val cellRows: Map[Int, Long] = stored.assigned
          .groupBy(col("cell_id")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val totalRows = cellRows.values.sum

        /** PQ bytes model (ppm of full-corpus float bytes): a probed
          * cell's candidates are read as m-byte codes, then only the
          * rerank shortlist is read as full dim×4-byte vectors —
          * (probed_rows · m + rerank · dim · 4) / (N · dim · 4). The
          * IVF (non-PQ) column reads probed_rows · dim · 4 instead;
          * this model is what makes the two variants comparable at any
          * dim (parquet file sizes alone under-credit PQ because the
          * fixture stores floats column-compressed). */
        def pqBytesFracPpm(nprobe: Int, rerank: Int): Long = {
          val perQuery = probedCellsOf(nprobe).map { cells =>
            val rows = cells.map(cellRows.getOrElse(_, 0L)).sum
            (rows.toDouble * pqM + rerank.toDouble * dim * 4) /
              (totalRows.toDouble * dim * 4)
          }
          math.round(perQuery.sum / perQuery.size * 1000000L)
        }
        for (nprobe <- Seq(2, 4); rerank <- Seq(20, 50, 100)) {
          val res = Ivf.searchPqPruned(stored, cb, codes, queries, k = k,
            nprobe = nprobe, m = pqM, dim = dim, rerank = rerank)
          val recall = meanRecallPpm(res)
          val sec = timeIt(Ivf.searchPqPruned(stored, cb, codes, queries,
            k = k, nprobe = nprobe, m = pqM, dim = dim, rerank = rerank))
          val frac = meanBytesFracPpm(nprobe)
          val pqFrac = pqBytesFracPpm(nprobe, rerank)
          println(s"""ANN {"corpus":"$corpusName","variant":"ivf_pq","ncells":$nCells,"pqk":$pqK,"nprobe":$nprobe,"rerank":$rerank,"recall_at10_ppm":$recall,"query_bytes_ppm":$frac,"pq_model_bytes_ppm":$pqFrac,"sec":${f"$sec%.2f"}}""")
        }

        // RESIDUAL PQ (IVFADC): same sweep with codes that encode each
        // vector's residual to its assigned cell — the layout that keeps
        // PQ discriminative once the probe restricted candidates to a
        // cluster (raw-vector PQ quantizes away within-cell differences)
        val (cbR0, codesR0) = Ivf.trainResidualPq(stored, m = pqM, dim = dim,
          k = pqK)
        val cbR = cbR0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val codesR = codesR0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cbR.count(); codesR.count()
        for (nprobe <- Seq(2, 4); rerank <- Seq(20, 50, 100)) {
          val res = Ivf.searchPqResidual(stored, cbR, codesR, queries, k = k,
            nprobe = nprobe, m = pqM, dim = dim, rerank = rerank)
          val recall = meanRecallPpm(res)
          val sec = timeIt(Ivf.searchPqResidual(stored, cbR, codesR, queries,
            k = k, nprobe = nprobe, m = pqM, dim = dim, rerank = rerank))
          val frac = meanBytesFracPpm(nprobe)
          val pqFrac = pqBytesFracPpm(nprobe, rerank)
          println(s"""ANN {"corpus":"$corpusName","variant":"ivf_pq_residual","ncells":$nCells,"pqk":$pqK,"nprobe":$nprobe,"rerank":$rerank,"recall_at10_ppm":$recall,"query_bytes_ppm":$frac,"pq_model_bytes_ppm":$pqFrac,"sec":${f"$sec%.2f"}}""")
        }
        e.unpersist(); gt.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
