package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** IVF-PQ composed search ([[Ivf.searchPqPruned]]): coarse-cell partition
  * pruning × PQ ADC ranking × exact refine. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings").cache()

  private def fixture() = {
    val idx = Ivf.build(emb, nCells = 8)
    val cb = Pq.trainCodebook(emb, "vec_id", "embedding", m = 8, dim = 64, k = 16)
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", m = 8, dim = 64)
    (idx, cb, codes)
  }

  test("recall: exhaustive probe + full-width rerank recovers exact kNN") {
    val (idx, cb, codes) = fixture()
    val q = emb.filter($"vec_id" < 10)
    val exact = Knn.exact(emb, q, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // nprobe = nCells probes everything and a corpus-wide rerank refines
    // everything, so the composed search degenerates to exact kNN — any
    // miss would be a bug in the dataflow, not PQ loss
    val n = emb.count().toInt
    val full = Ivf.searchPqPruned(idx, cb, codes, q,
        k = 5, nprobe = 8, m = 8, dim = 64, rerank = n)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & full).size.toDouble / exact.size
    assert(recall >= 0.999, s"exhaustive IVF-PQ recall must be exact: $recall")
    // a bounded rerank keeps most of it: the ADC shortlist is doing the
    // work (quantization loss shows up only in the tail)
    val bounded = Ivf.searchPqPruned(idx, cb, codes, q,
        k = 5, nprobe = 8, m = 8, dim = 64, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val boundedRecall = (exact & bounded).size.toDouble / exact.size
    assert(boundedRecall >= 0.7, s"rerank=100 IVF-PQ recall too low: $boundedRecall")
  }

  test("pruned probe keeps useful recall at a fraction of the candidates") {
    val (idx, cb, codes) = fixture()
    val q = emb.filter($"vec_id" < 20)
    val exact = Knn.exact(emb, q, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.searchPqPruned(idx, cb, codes, q,
        k = 10, nprobe = 3, m = 8, dim = 64, rerank = 40)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"nprobe=3 IVF-PQ recall too low: $recall")
  }

  test("refine is exact: reported sims equal brute-force cosine for those pairs") {
    val (idx, cb, codes) = fixture()
    val q = emb.filter($"vec_id" < 5)
    val out = Ivf.searchPqPruned(idx, cb, codes, q,
      k = 5, nprobe = 3, m = 8, dim = 64, rerank = 20)
    val reported = out.select($"query_id", $"neighbor_id", $"sim")
      .as[(Long, Long, Double)].collect()
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (dot, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, x, y), (u, v)) =>
          val (ud, vd) = (u.toDouble, v.toDouble)
          (d + ud * vd, x + ud * ud, y + vd * vd)
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    reported.foreach { case (qid, nid, sim) =>
      assert(math.abs(sim - cos(vecs(qid), vecs(nid))) < 1e-9,
        s"refined sim for ($qid,$nid) is not exact cosine")
    }
  }

  test("stored index: the composed search still prunes cell partitions at the scan") {
    val (idx, cb, codes) = fixture()
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    try {
      Ivf.writeIndex(idx, path)
      val stored = Ivf.readIndex(spark, path)
      val q = emb.filter($"vec_id" < 5)
      val out = Ivf.searchPqPruned(stored, cb, codes, q,
        k = 5, nprobe = 2, m = 8, dim = 64, rerank = 20)
      out.collect()
      val planStr = out.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[cell_id".r.findFirstIn(planStr).isDefined,
        s"probed cells must prune the stored scan:\n$planStr")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("residual PQ (IVFADC): exhaustive probe + full rerank is exact; codes rank within cells") {
    val (idx, _, _) = fixture()
    val (cbR, codesR) = Ivf.trainResidualPq(idx, m = 8, dim = 64)
    val q = emb.filter($"vec_id" < 10)
    val exact = Knn.exact(emb, q, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val n = emb.count().toInt
    // dataflow sanity: probing every cell + corpus-wide rerank must
    // degenerate to exact kNN, same as the raw-vector variant
    val full = Ivf.searchPqResidual(idx, cbR, codesR, q,
        k = 5, nprobe = 8, m = 8, dim = 64, rerank = n)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & full).size.toDouble / exact.size
    assert(recall >= 0.999, s"exhaustive residual IVFADC must be exact: $recall")
    // the point of residual codes: with a BOUNDED shortlist the ADC
    // ranking must still surface true neighbors from within the cells
    val bounded = Ivf.searchPqResidual(idx, cbR, codesR, q,
        k = 5, nprobe = 8, m = 8, dim = 64, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val boundedRecall = (exact & bounded).size.toDouble / exact.size
    assert(boundedRecall >= 0.7, s"rerank=100 residual recall too low: $boundedRecall")
  }

  test("searchPqResidual: probe checkpoint freed at return; residual = result block only") {
    val (idx, _, _) = fixture()
    val (cbR, codesR) = Ivf.trainResidualPq(idx, m = 8, dim = 64)
    val q = emb.filter($"vec_id" < 3)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    val out = Ivf.searchPqResidual(idx, cbR, codesR, q,
      k = 5, nprobe = 3, m = 8, dim = 64, rerank = 20)
    // AnnProbe's (nprobe, rerank) sweep calls this in a loop: only the
    // |Q|·k result checkpoint may remain, never the probe table
    val live = spark.sparkContext.getPersistentRDDs
    assert(live.size == 1,
      s"expected exactly the scoped result checkpoint, got ${live.size} blocks")
    assert(out.count() == 15)
  }

  test("residual PQ determinism across reruns") {
    val (idx, _, _) = fixture()
    val (cbR, codesR) = Ivf.trainResidualPq(idx, m = 8, dim = 64)
    val q = emb.filter($"vec_id" < 3)
    def run() = Ivf.searchPqResidual(idx, cbR, codesR, q,
        k = 5, nprobe = 3, m = 8, dim = 64, rerank = 20)
      .select($"query_id", $"rk", $"neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val a = run()
    assert(a.size == 15, "3 queries x k=5")
    assert(!a.exists { case (qid, _, nid) => qid == nid }, "self excluded")
    assert(a == run(), "rerun-stable")
  }

  test("8-bit residual codes (k=256): trains, codes in range, exact under exhaustive probe") {
    // the production operating point (256 centroids/subspace = 1 byte per
    // code); synthetic corpus big enough for 256 centroids per subspace
    val n = 600
    val dim = 16
    val vecs = spark.range(n).map { i =>
      val r = new scala.util.Random(55L + i)
      (i, Array.fill(dim)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val idx = Ivf.build(vecs, nCells = 4)
    val (cbR, codesR) = Ivf.trainResidualPq(idx, m = 2, dim = dim, k = 256)
    // codebook: m=2 subspaces × 256 codes each; every code id fits a byte
    val cbCount = cbR.groupBy($"s").count().as[(Int, Long)].collect().toMap
    assert(cbCount.keySet == Set(0, 1) && cbCount.values.forall(_ == 256L),
      s"codebook shape: $cbCount")
    val codeRange = codesR.select(explode($"codes").as("c"))
      .agg(min($"c"), max($"c")).as[(Int, Int)].head()
    assert(codeRange._1 >= 0 && codeRange._2 <= 255, s"code range: $codeRange")
    // dataflow sanity at k=256: exhaustive probe + full rerank = exact kNN
    val q = vecs.filter($"vec_id" < 5)
    val exact = Knn.exact(vecs, q, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val full = Ivf.searchPqResidual(idx, cbR, codesR, q,
        k = 3, nprobe = 4, m = 2, dim = dim, rerank = n)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert((exact & full).size == exact.size,
      s"exhaustive 8-bit IVFADC must be exact: ${(exact & full).size}/${exact.size}")
  }

  test("kNN contract and determinism across reruns") {
    val (idx, cb, codes) = fixture()
    val q = emb.filter($"vec_id" < 3)
    def run() = Ivf.searchPqPruned(idx, cb, codes, q,
        k = 5, nprobe = 3, m = 8, dim = 64, rerank = 20)
      .select($"query_id", $"rk", $"neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val a = run()
    assert(a.size == 15, "3 queries x k=5")
    assert(!a.exists { case (qid, _, nid) => qid == nid }, "self excluded")
    assert(a == run(), "rerun-stable")
  }
}
