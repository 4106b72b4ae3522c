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
  * round-10 skew guard — centered sub-banding + hub spokes — on the
  * corpus the cell k-means cannot shatter: nCells pinned to 1 (the
  * pinned-k misuse the guard backstops; the auto rule k ∝ N is the
  * first line of defense and keeps cells under the cap by
  * construction), 90% of vectors a DISTINCT cloud around one base
  * embedding (per-component hash noise), 10% real embeddings. Two
  * regimes per the cloud's spread ρ:
  *
  *  - DIFFUSE (ρ = 0.5, pairwise cosine ≈ 0.83): the guard's split
  *    quality is what matters. Census stamps the realized band
  *    distribution under the shipped CENTERED signature (uniform —
  *    residual signs are unbiased) against the modal-band mass the
  *    pre-round-10 UNCENTERED signature would have kept (33-100%,
  *    mean-dominated — the measured reason the guard was re-based),
  *    plus guarded vs unguarded pair counts and the full-operator wall.
  *  - TIGHT (ρ = 0.02, pairwise cosine ≈ 0.9997 — a true over-cap
  *    duplicate BLOCK): uniform banding scatters it, so the hub spokes
  *    must re-connect every band; the census stamps the number of
  *    groups the operator reports for the cloud (must be 1).
  *
  * The claim under test: candidate pairs ≈ classes × cap / 2 — linear
  * in the cell's distinct count with the cap as the constant
  * (quadratic-in-cap), never quadratic-in-cell, for ANY cell geometry.
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
    val diffuseTiers = sys.env.getOrElse("SPARK_GRAFT_SCALE_TIERS", "1,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val minCosine = 0.9 // production semantic threshold
    val maxCellSize = 16384 // operator default — the cap under test
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.GraftFunctions.{rhp_signature, micro_units}
    def clean(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache(); System.gc()
    }
    val base = graft.sources.Tables(spark, srcDir, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    val baseN = base.count()
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val c0: Array[Float] = base.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val c0Lit = array(c0.toIndexedSeq.map(x => lit(x.toDouble)): _*)

    def census(mode: String, k: Int, rho: Double, wall: Boolean): Unit = {
      val n = baseN * k
      // the cloud expression needs _c0 in scope: build it directly here
      val nScatter = n / 10
      val amp = rho / math.sqrt(dim / 3.0)
      val scattered = spark.range(nScatter).select(col("id").as("vec_id"),
          pmod(col("id"), lit(baseN)).as("_b"))
        .join(base.select(col("vec_id").as("_b"), col("embedding")), Seq("_b"))
        .select(col("vec_id"), col("embedding"))
      val cloud = spark.range(nScatter, n)
        .withColumn("_c0", c0Lit)
        .select(col("id").as("vec_id"),
          expr(s"""transform(sequence(0, ${dim - 1}, 1), p ->
                   |CAST(element_at(_c0, p + 1)
                   |  + ((pmod(xxhash64(vec_id, p), 20001) - 10000) / 10000.0) * $amp
                   |AS FLOAT))""".stripMargin).as("embedding"))
      // stage the fixture to parquet (NOT localCheckpoint: the wall runs
      // clean() between measurements, which unpersists every RDD — a
      // truncated-lineage checkpoint cannot be recomputed after that)
      val path = s"/tmp/semdedup_skew/${mode}_x$k"
      scattered.unionByName(cloud)
        .write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      // census mirrors the operator's delegate/band stages at nCells = 1
      val idx = graft.operators.Ivf.buildPortable(corpus, 1, 2, "vec_id", "embedding")
      val m = idx.assigned.select(col("cell_id"), col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("_v"))
      val classes = m.groupBy(col("cell_id"), col("_v"))
        .agg(min(col("vid")).as("del"))
        .join(broadcast(idx.cells), Seq("cell_id"))
        .persist()
      val d = classes.count()
      val sbits = if (d <= maxCellSize) 0
        else math.min(16, math.ceil(
          math.log(d.toDouble / maxCellSize) / math.log(2.0)).toInt)
      val banded = classes
        .withColumn("_cband",
          rhp_signature(
            zip_with(micro_units(col("_v")), col("centroid"), (a, b) => a - b),
            64, dim, 2303L, portable = true)
            .bitwiseAND(lit((1L << sbits) - 1)))
        .withColumn("_uband",
          rhp_signature(col("_v"), 64, dim, 2303L, portable = true)
            .bitwiseAND(lit((1L << sbits) - 1)))
        .persist()
      def bandStats(c: String): (Long, Long, Double) = {
        val rows = banded.groupBy(col(c)).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("bands"), max(col("n")).as("mx"),
            sum(expr("n * (n - 1) div 2")).as("pairs"))
          .head()
        (rows.getLong(0), rows.getLong(2), rows.getLong(1).toDouble / d)
      }
      val (bandsC, pairsC, maxFracC) = bandStats("_cband")
      val (_, pairsU, maxFracU) = bandStats("_uband")
      val unguarded = d * (d - 1) / 2
      val spokes = if (sbits > 0) d - 1 else 0L
      banded.unpersist(blocking = false)
      classes.unpersist(blocking = false)
      var cloudGroups = -1L
      var sec = -1.0
      var cloudGroupsSpan = -1L
      var secSpan = -1.0
      if (wall) {
        def run(em: String): org.apache.spark.sql.DataFrame =
          graft.operators.Dedup.semanticDedupExemplars(
            corpus, nCells = 1, minCosine = minCosine, edgesMode = em)
        clean()
        // group readout from the warm run: distinct components among
        // cloud ids (tight mode must report exactly 1)
        cloudGroups = run("all").filter(col("vec_id") >= nScatter)
          .select(col("comp")).distinct().count()
        sec = (1 to 2).map { _ =>
          clean()
          val t0 = System.nanoTime()
          run("all").count()
          (System.nanoTime() - t0) / 1e9
        }.min
        // spanning mode on the OUTPUT-bound tier: the tight cloud is the
        // regime where all-pairs materializes ~cap/2 qualified edges per
        // member that component labeling never needed — the spanning
        // stars must keep cloud_groups identical at a fraction of the
        // wall (SCALE.md §SemDeDup-skew records both columns)
        if (mode == "tight") {
          clean()
          cloudGroupsSpan = run("spanning").filter(col("vec_id") >= nScatter)
            .select(col("comp")).distinct().count()
          secSpan = (1 to 2).map { _ =>
            clean()
            val t0 = System.nanoTime()
            run("spanning").count()
            (System.nanoTime() - t0) / 1e9
          }.min
        }
      }
      println(f"""SEMDEDUP_SKEW {"mode":"$mode","tier":$k,"rows":$n,"classes":$d,"sbits":$sbits,"bands":$bandsC,"max_band_frac_centered":$maxFracC%.4f,"modal_frac_uncentered":$maxFracU%.4f,"cand_pairs":$pairsC,"uncentered_pairs":$pairsU,"unguarded_pairs":$unguarded,"spokes":$spokes,"cloud_groups":$cloudGroups,"sec":$sec%.2f,"cloud_groups_spanning":$cloudGroupsSpan,"sec_spanning":$secSpan%.2f}""")
      System.out.flush()
    }

    diffuseTiers.foreach(k => census("diffuse", k, 0.5, wall = k <= 100))
    census("tight", 10, 0.02, wall = true)
    spark.stop()
  }
}
