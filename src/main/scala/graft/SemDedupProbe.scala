package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup scale probe: measures the within-cell pair work of
  * `Dedup.semanticDedupExemplars` across ScaleProbe replica tiers —
  * the SCALE.md evidence that the stage is bounded by DISTINCT vectors,
  * not corpus rows.
  *
  * ScaleProbe copies embedding VALUES unchanged across replicas (only
  * ids shift), so a k× tier is exactly the 100 TB pathology the
  * exact-duplicate collapse targets: every vector appears in a k-clique
  * of byte-identical copies. Without the collapse the within-cell pair
  * stage grows k²; with it the distinct-class census — and therefore
  * the candidate pair count — is CONSTANT across tiers, and only the
  * linear member-edge/labeling work scales.
  *
  * Prints one line per tier:
  *   SEMDEDUP {"tier":k,"rows":n,"pairable":nz,"classes":d,
  *             "cand_pairs":c,"screened_pairs":s,"dup_pairs":p,"sec":t}
  * where cand_pairs = Σ over (cell, band) of c·(c−1)/2 AFTER the
  * collapse (the pairs the equi-join materializes), screened_pairs the
  * survivors of the 64-bit hamming prefilter, dup_pairs the qualified
  * cosine pairs, and sec the steady-state wall of the full operator
  * (Bench protocol: clean cache, one warm-up, best of two).
  *
  * Usage: SPARK_GRAFT_SCALE_TIERS=1,30,100 sbt "runMain graft.SemDedupProbe"
  *
  * SKEWED mode (`runMain graft.SemDedupProbe skewed`) censuses the
  * sub-band guard — mechanism 3 — on the corpus the cell k-means CANNOT
  * shatter: 90% of vectors are a tight cloud of DISTINCT points around
  * the origin (per-component hash noise in ±0.01, so every vector is
  * unique and the exact-duplicate collapse buys nothing), 10% are real
  * embeddings scattered at unit norm. Lloyd pulls exactly one centroid
  * into the cloud (the cloud is one tight mass; only the cell that
  * captures it re-centers toward the origin), so one cell holds ~90%
  * of the corpus at every tier — the single-hot-cell pathology. The
  * origin-centered cloud is ALSO the sign-LSH-splittable shape: each
  * vector's hyperplane projections hover around zero, so its signature
  * bits are iid fair coins and the sub-bands split the cell uniformly.
  * Census per tier: hot-cell distinct size, the sub-band bit count the
  * operator derives, realized bands, candidate pairs WITH the guard vs
  * the unguarded Σ c·(c−1)/2 census, hamming-screen survivors at the
  * production 0.9 threshold, and the full-operator wall. The claim
  * under test: pairs stay ~quadratic-in-cap (≈ classes × cap / 2),
  * never quadratic-in-cell.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("skewed")) { skewedMain(); return }
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tiers = sys.env.getOrElse("SPARK_GRAFT_SCALE_TIERS", "1,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val minCosine = 0.3 // q246's declared operating point
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
          if (!new java.io.File(s"$d/lineitem.parquet").exists()) {
            println(s"SEMDEDUP synthesizing ${k}x inputs at $d")
            ScaleProbe.synthesize(spark, srcDir, d, k)
          }
          d
        }
      val vecs = graft.sources.Tables(spark, dir, "embeddings")
      // mirror the operator's stages to census the pair space (the same
      // public pieces semanticDedupExemplars composes)
      import graft.functions.GraftFunctions.{cosine_sim, rhp_signature, hamming_dist, l2_norm}
      val idx = graft.operators.Ivf.buildPortable(vecs, 8, 2, "vec_id", "embedding")
      val dim = idx.cells.select(size(col("centroid"))).head().getInt(0)
      val m = idx.assigned.select(col("cell_id"), col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("_v"))
      val rows = m.count()
      val pairable = m.filter(l2_norm(col("_v")) > 0)
      val nz = pairable.count()
      val classes = pairable.groupBy(col("cell_id"), col("_v"))
        .agg(min(col("vid")).as("del"))
        .withColumn("_psig", rhp_signature(col("_v"), 64, dim, 2303L, portable = true))
        .persist()
      val d = classes.count()
      // q246's defaults: maxCellSize far above any cell here → band 0
      val cand = classes.groupBy(col("cell_id"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("cp"))
        .head().getLong(0)
      val thr = graft.operators.Dedup.hammingScreenThreshold(minCosine)
      val lhs = classes.select(col("cell_id"), col("del").as("id_a"),
        col("_psig").as("_pa"), col("_v").as("_va"))
      val rhs = classes.select(col("cell_id"), col("del").as("id_b"),
        col("_psig").as("_pb"), col("_v").as("_vb"))
      val joined = lhs.join(rhs, Seq("cell_id")).filter(col("id_a") < col("id_b"))
      val screened = joined.filter(hamming_dist(col("_pa"), col("_pb")) <= thr)
      val s = screened.count()
      val dup = screened.filter(cosine_sim(col("_va"), col("_vb")) >= minCosine).count()
      // prefilter selectivity at a PRODUCTION semantic threshold (0.9):
      // the 5σ screen is deliberately non-selective at loose thresholds
      // (q246's 0.3) and pays off exactly where real SemDeDup operates
      val thrHi = graft.operators.Dedup.hammingScreenThreshold(0.9)
      val sHi = joined.filter(hamming_dist(col("_pa"), col("_pb")) <= thrHi).count()
      classes.unpersist(blocking = false)
      // steady-state wall of the full operator at q246's parameters
      def run(): Long = graft.operators.Dedup.semanticDedupExemplars(
        vecs, nCells = 8, minCosine = minCosine).count()
      clean(); run()
      val sec = (1 to 2).map { _ =>
        clean()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""SEMDEDUP {"tier":$k,"rows":$rows,"pairable":$nz,"classes":$d,"cand_pairs":$cand,"screened_pairs":$s,"screened_at_090":$sHi,"dup_pairs":$dup,"sec":$sec%.2f}""")
    }
    spark.stop()
  }

  /** Single-hot-cell census (see object scaladoc, SKEWED mode). */
  private def skewedMain(): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tiers = sys.env.getOrElse("SPARK_GRAFT_SCALE_TIERS", "1,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val minCosine = 0.9 // production semantic threshold (Abbas et al. use ~0.95+)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache(); System.gc()
    }
    val base = graft.sources.Tables(spark, srcDir, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    val baseN = base.count()
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val maxCellSize = 16384 // the operator default — the cap under test
    tiers.foreach { k =>
      val n = baseN * k
      val nScatter = n / 10
      // scattered 10%: real embeddings (ids 0..nScatter-1, values repeat
      // past baseN — duplicates there are irrelevant to the hot cell);
      // cloud 90%: DISTINCT hash-noise vectors in ±0.01 around the origin
      val scattered = spark.range(nScatter).select(col("id").as("vec_id"),
          pmod(col("id"), lit(baseN)).as("_b"))
        .join(base.select(col("vec_id").as("_b"), col("embedding")), Seq("_b"))
        .select(col("vec_id"), col("embedding"))
      val cloud = spark.range(nScatter, n).select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}, 1), p ->
                 |CAST((pmod(xxhash64(id, p), 20001) - 10000) / 1000000.0
                 |AS FLOAT))""".stripMargin).as("embedding"))
      val corpus = scattered.unionByName(cloud)
        .localCheckpoint(eager = true) // pin the fixture; probe reuses it
      // census: mirror the operator's delegate/sub-band stages at the
      // production auto cell count (nCells = max(8, ceil(n/4096)))
      import graft.functions.GraftFunctions.{rhp_signature, hamming_dist, l2_norm}
      val nCells = math.max(8L, (n + 4095) / 4096).toInt
      val idx = graft.operators.Ivf.buildPortable(corpus, nCells, 2, "vec_id", "embedding")
      val m = idx.assigned.select(col("cell_id"), col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("_v"))
        .filter(l2_norm(col("_v")) > 0)
      val classes = m.groupBy(col("cell_id"), col("_v"))
        .agg(min(col("vid")).as("del"))
        .withColumn("_psig", rhp_signature(col("_v"), 64, dim, 2303L, portable = true))
        .persist()
      val d = classes.count()
      val cellCensus = classes.groupBy(col("cell_id"))
        .agg(count(lit(1)).as("csz"))
        .withColumn("_sbits",
          when(col("csz") <= maxCellSize, lit(0))
            .otherwise(least(lit(16),
              ceil(log(2.0, col("csz").cast("double") / maxCellSize)).cast("int"))))
        .persist()
      val (hotCell, hotSbits) = {
        val r = cellCensus.orderBy(col("csz").desc).head()
        (r.getLong(r.fieldIndex("csz")), r.getInt(r.fieldIndex("_sbits")))
      }
      val unguarded = cellCensus
        .agg(sum(expr("csz * (csz - 1) div 2"))).head().getLong(0)
      val banded = classes
        .join(cellCensus.select(col("cell_id"), col("_sbits")), Seq("cell_id"))
        .withColumn("_band",
          expr("_psig & (shiftleft(CAST(1 AS BIGINT), _sbits) - 1)"))
      val bandCensus = banded.groupBy(col("cell_id"), col("_band"))
        .agg(count(lit(1)).as("c")).persist()
      val nBands = bandCensus.count()
      val guarded = bandCensus.agg(sum(expr("c * (c - 1) div 2")))
        .head().getLong(0)
      val thr = graft.operators.Dedup.hammingScreenThreshold(minCosine)
      val lhs = banded.select(col("cell_id"), col("_band"),
        col("del").as("id_a"), col("_psig").as("_pa"))
      val rhs = banded.select(col("cell_id"), col("_band"),
        col("del").as("id_b"), col("_psig").as("_pb"))
      val screened = lhs.join(rhs, Seq("cell_id", "_band"))
        .filter(col("id_a") < col("id_b"))
        .filter(hamming_dist(col("_pa"), col("_pb")) <= thr)
        .count()
      classes.unpersist(blocking = false)
      cellCensus.unpersist(blocking = false)
      bandCensus.unpersist(blocking = false)
      // full-operator wall at the same parameters (auto-k, 0.9)
      def run(): Long = graft.operators.Dedup.semanticDedupExemplars(
        corpus, minCosine = minCosine).count()
      clean(); run()
      val sec = (1 to 2).map { _ =>
        clean()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""SEMDEDUP_SKEW {"tier":$k,"rows":$n,"classes":$d,"n_cells":$nCells,"hot_cell":$hotCell,"hot_sbits":$hotSbits,"bands":$nBands,"cand_pairs":$guarded,"unguarded_pairs":$unguarded,"screened":$screened,"sec":$sec%.2f}""")
      System.out.flush()
    }
    spark.stop()
  }
}
