package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine_sim

/** Trained IVF (inverted-file) approximate nearest-neighbor index.
  *
  * The production-shaped version of q27's label-cell skeleton and the 100 TB
  * replacement for the reference's HNSW index
  * (`/root/reference/scylladb_setup/create_iot_schema.py:136-155`): k-means
  * coarse cells over the corpus; search probes only the `nprobe` cells
  * whose centroids are nearest the query. On a cluster the assigned corpus
  * is partitioned (or bucketed) by cell_id, so a probe touches `nprobe/k`
  * of the data — the same pruning HNSW gets from its graph, but expressed
  * as partition pruning that Spark already knows how to scale.
  *
  * Vectors are L2-normalized before clustering so Euclidean k-means cells
  * approximate cosine cells (standard spherical-IVF trick).
  */
object Ivf {

  /** cells: (cell_id int, centroid array<double>);
    * assigned: corpus + cell_id (partitionable/bucketable by cell_id). */
  case class IvfIndex(cells: DataFrame, assigned: DataFrame)

  /** `maxFitRows` bounds the k-means TRAINING set (cell assignment still
    * covers the full corpus): at 100 TB you fit coarse centroids on a
    * sample — a few hundred vectors per cell saturates centroid quality
    * (standard IVF practice) — and only the embarrassingly-parallel
    * assignment pass touches every row. The sample is a deterministic
    * hash of the id ([[Sampling]] discipline), so rebuilds are stable;
    * corpora at or below the cap train on everything, exactly as before. */
  def build(
      corpus: DataFrame, nCells: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxFitRows: Int = 100000): IvfIndex = {
    val normed = corpus.withColumn("_nvec",
      graft.functions.GraftFunctions.l2_normalize(col(vecCol)))
    val feats = normed.withColumn("_features", array_to_vector(col("_nvec")))
    val n = feats.count()
    val fitSet =
      if (n <= maxFitRows) feats
      else {
        // deterministic hash thinning to ~maxFitRows (pure function of the
        // id — rerun-stable, no sample() re-draw on task retry)
        val pct = math.max(1, math.min(100, (maxFitRows * 100L / n).toInt))
        Sampling.hashSample(feats, idCol, pct, seed = seed.toInt)
      }
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("_cell")
      .fit(fitSet)
    val assigned = model.transform(feats)
      .withColumnRenamed("_cell", "cell_id")
      .drop("_features", "_nvec")
    val cells = assigned.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.toIndexedSeq
        .map { case (c, i) => (i, c.toArray.toIndexedSeq) })
      .toDF("cell_id", "centroid")
    IvfIndex(cells, assigned)
  }

  /** Persist the index with the corpus PARTITIONED BY cell_id — the layout
    * that turns a probe into partition pruning: a search that probes 3 of
    * 1024 cells reads 3/1024 of the corpus bytes, enforced by the storage
    * layer, not a runtime filter. This is the concrete 100 TB ANN story
    * (IvfSpec asserts the pruned scan in the physical plan). */
  def writeIndex(index: IvfIndex, path: String): Unit = {
    index.cells.write.mode("overwrite").parquet(s"$path/cells")
    index.assigned.write.mode("overwrite")
      .partitionBy("cell_id").parquet(s"$path/assigned")
  }

  /** Reload a persisted index. The assigned corpus comes back with
    * `cell_id` as a partition column, so [[search]]'s cell-membership join
    * prunes partitions at plan time. */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      cells = spark.read.parquet(s"$path/cells"),
      assigned = spark.read.parquet(s"$path/assigned"))

  /** Approximate top-k by cosine: probe the `nprobe` nearest cells per
    * query, exact-rescore only their members. Returns the standard
    * [query_id, rk, neighbor_id, sim] kNN shape. */
  def search(
      index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val probed = probeCells(index, queries, nprobe, idCol, vecCol)
    rescore(probed, index.assigned, k, idCol, vecCol, excludeSelf)
  }

  /** [[search]] against a stored index with STATIC partition pruning: the
    * probed cell set (|queries| × nprobe ints — always driver-sized) is
    * resolved first and pushed into the scan as a partition filter, so at
    * most that many cell directories are read from storage. With 1024
    * cells and nprobe 3, a query batch touching 10 distinct cells reads
    * ~1% of corpus bytes — pruning enforced by layout, not a runtime
    * filter (plan-asserted in IvfSpec). */
  def searchPruned(
      index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame =
    pruneAndRescore(probeCells(index, queries, nprobe, idCol, vecCol),
      index, k, idCol, vecCol, excludeSelf)

  /** Shared post-probe stage: resolve the (driver-sized) probed cell set,
    * push it into the scan as a partition filter, exact-rescore members. */
  private def pruneAndRescore(
      probed: DataFrame, index: IvfIndex, k: Int,
      idCol: String, vecCol: String, excludeSelf: Boolean): DataFrame = {
    val cellIds = probed.select(col("cell_id")).distinct()
      .collect().map(_.get(0))
    val pruned = index.assigned.filter(col("cell_id").isin(scala.collection.immutable.ArraySeq.unsafeWrapArray(cellIds): _*))
    rescore(probed, pruned, k, idCol, vecCol, excludeSelf)
  }

  /** IVF-PQ with exact refine — the full production ANN stack in one
    * dataflow. Three bounds compose:
    *
    *  1. the coarse cells bound BYTES READ: static partition pruning as in
    *     [[searchPruned]] (a probe reads nprobe/k of the corpus);
    *  2. the PQ codes bound BYTES PER CANDIDATE: ADC ranks probed-cell
    *     members from their `m`-byte codes ([[Pq.adcCandidates]]) without
    *     touching the original vectors;
    *  3. the exact pass bounds FLOAT WORK: only the top `rerank` ADC
    *     candidates per query (a broadcast-sized shortlist) are re-scored
    *     with true cosine against the stored vectors.
    *
    * Output is the standard (query_id, rk, neighbor_id, sim) kNN shape.
    * Recall and plan pruning are asserted in IvfPqSpec. */
  def searchPqPruned(
      index: IvfIndex, codebook: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, m: Int, dim: Int,
      rerank: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val probed = probeCells(index, queries, nprobe, idCol, vecCol)
    pqRefine(probed, index, codebook, codes, queries, k, m, dim, rerank,
      idCol, vecCol, excludeSelf)
  }

  /** Shared IVF-PQ post-probe stage: prune cells → ADC-score members →
    * top-`rerank` shortlist → exact cosine refine → top-k. */
  private def pqRefine(
      probed: DataFrame, index: IvfIndex, codebook: DataFrame,
      codes: DataFrame, queries: DataFrame, k: Int, m: Int, dim: Int,
      rerank: Int, idCol: String, vecCol: String,
      excludeSelf: Boolean): DataFrame = {
    val cellIds = probed.select(col("cell_id")).distinct()
      .collect().map(_.get(0))
    val pruned = index.assigned.filter(col("cell_id").isin(scala.collection.immutable.ArraySeq.unsafeWrapArray(cellIds): _*))
    val cand = probed.select(col("query_id"), col("cell_id"))
      .join(pruned.select(col("cell_id"), col(idCol).as("neighbor_id")), Seq("cell_id"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"))
    val adc = Pq.adcCandidates(codebook, codes, queries, cand, m, dim, idCol, vecCol)
    // bounded top-`rerank` shortlist by ascending ADC distance (map-side
    // bounded aggregate, not a global sort)
    val shortlist = Knn.reduceTopK(
        adc.select(col("query_id"), col("neighbor_id"),
          negate(col("adc_dist")).as("_sim")), rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact refine: |Q|·rerank pairs — the shortlist broadcasts, so the
    // probed-cell vectors are scanned once with no shuffle
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"))
    val exact = broadcast(shortlist)
      .join(pruned.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nvec")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec")))
    Knn.reduceTopK(exact, k)
  }

  /** Per-vector residual against its ASSIGNED cell centroid, in the
    * normalized space the cells were fit in: (idCol, _res array<double>).
    * The IVFADC decomposition (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search" §IV): vector = centroid(cell) + residual. */
  private def residuals(index: IvfIndex, idCol: String,
      vecCol: String): DataFrame =
    index.assigned
      .join(broadcast(index.cells), Seq("cell_id"))
      .select(col(idCol),
        zip_with(
          graft.functions.GraftFunctions.l2_normalize(col(vecCol))
            .cast("array<double>"),
          col("centroid"), (x, c) => x - c).as("_res"))

  /** Train + encode RESIDUAL PQ over a built index — the IVFADC layout.
    *
    * Why residuals and not raw vectors: once the IVF probe has already
    * restricted candidates to a cell, every candidate shares that cell's
    * center component, so a codebook trained on raw vectors spends its
    * entire code budget re-encoding the center and quantizes away the
    * within-cell differences that actually rank neighbors. Measured at
    * 768 dims on clustered embeddings (SCALE.md §ANN): raw-vector PQ
    * recall@10 = 0.12 at rerank 100 — barely above random within the
    * probed cells — where residual PQ recovers the ranking. Returns
    * (codebook, codes) shaped exactly like [[Pq.trainCodebook]] /
    * [[Pq.encode]], for [[searchPqResidual]]. */
  def trainResidualPq(index: IvfIndex, m: Int, dim: Int, k: Int = 16,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val res = residuals(index, idCol, vecCol)
    val cb = Pq.trainCodebook(res, idCol, "_res", m, dim, k, seed)
    val codes = Pq.encode(res, cb, idCol, "_res", m, dim)
    (cb, codes)
  }

  /** [[searchPqPruned]] over RESIDUAL codes (IVFADC): candidates come
    * from the same pruned-cell probe, but ADC scores the query's
    * PER-CELL residual (query − probed-cell centroid) against codes that
    * encode each member's residual to its own cell — the decomposition
    * that keeps PQ discriminative inside a cluster. The distance table
    * keys on (query_id, cell_id) instead of query_id, so it scales as
    * |queries| × nprobe × m × k_codebook — an nprobe factor the raw-PQ
    * table doesn't have. At production shape (m=96, k=256, nprobe=4)
    * that's ~100k entries PER QUERY; the broadcast hint is therefore
    * gated on the estimated row count and large query batches fall back
    * to a shuffle join on the (query, cell) struct key instead of
    * OOMing the driver. */
  def searchPqResidual(
      index: IvfIndex, codebook: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, m: Int, dim: Int,
      rerank: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    // the probe table is tiny (|Q|·nprobe rows) but has FOUR consumers
    // (cell-id collect, the broadcast-gate estimate, qres, adc) — pin it
    // once so the cross-join+window probe plan runs one job, not four.
    // Scoped-cache discipline (CacheHygieneSpec family): the probe
    // checkpoint must not outlive the call — the |Q|·k result is
    // checkpointed eagerly at the end and the probe blocks freed, so an
    // (nprobe, rerank) sweep (AnnProbe) can't accumulate pinned blocks.
    val sc = queries.sparkSession.sparkContext
    val preIds = sc.getPersistentRDDs.keySet.toSet
    val probed = probeCells(index, queries, nprobe, idCol, vecCol)
      .localCheckpoint(eager = true)
    val probedIds = sc.getPersistentRDDs.keySet.toSet.diff(preIds)
    val cellIds = probed.select(col("cell_id")).distinct()
      .collect().map(_.get(0))
    val pruned = index.assigned.filter(col("cell_id").isin(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(cellIds): _*))
    // per-(query, probed cell) residual — the query's residual differs in
    // every probed cell, so the ADC table keys on the struct of both
    val qres = probed
      .join(broadcast(index.cells), Seq("cell_id"))
      .select(struct(col("query_id"), col("cell_id")).as("_qc"),
        zip_with(
          graft.functions.GraftFunctions.l2_normalize(col("_qvec"))
            .cast("array<double>"),
          col("centroid"), (x, c) => x - c).as("_res"))
    val dtable = Pq.distanceTable(qres, "_qc", "_res", codebook, m, dim)
    // broadcast only while the table is provably driver-sized:
    // rows = |query,cell pairs| × m × k_codebook. Both counts are
    // near-free (probed is checkpointed above; the codebook is
    // m × k_codebook driver-built rows), so the estimate is exact.
    val dtableRows = probed.count() * codebook.count()
    val dtableHinted =
      if (dtableRows <= 4000000L) broadcast(dtable) else dtable
    // each member sits in exactly one cell, so (query, neighbor) pairs are
    // unique and the fold sums exactly m table entries
    val adc = probed.select(col("query_id"), col("cell_id"))
      .join(pruned.select(col("cell_id"), col(idCol).as("neighbor_id")),
        Seq("cell_id"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .join(codes.select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("s", "code"))), Seq("neighbor_id"))
      .select(struct(col("query_id"), col("cell_id")).as("_qc"),
        col("query_id"), col("neighbor_id"), col("s"), col("code"))
      .join(dtableHinted, Seq("_qc", "s", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(Pq.adcFold.as("adc_dist"))
    // bounded top-`rerank` shortlist by ascending ADC distance, then the
    // exact-cosine refine over |Q|·rerank pairs (same tail as pqRefine)
    val shortlist = Knn.reduceTopK(
        adc.select(col("query_id"), col("neighbor_id"),
          negate(col("adc_dist")).as("_sim")), rerank)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"))
    val exact = broadcast(shortlist)
      .join(pruned.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nvec")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec")))
    // materialize the small |Q|·k result, then free the probe blocks —
    // the one residual scoped block is k-rows-per-query sized
    val out = Knn.reduceTopK(exact, k).localCheckpoint(eager = true)
    val live = sc.getPersistentRDDs
    probedIds.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    out
  }

  /** Shared fixed-point projection — the same definition [[Pq]] encodes
    * with, so cells and codes can never drift apart on the convention. */
  private def microVec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.micro_units(c)

  /** Deterministic PORTABLE k-means IVF — same [[IvfIndex]] contract as
    * [[build]] (the Spark-ML production variant), but every arithmetic
    * step is reproducible bit-for-bit by an independent engine, so a
    * trained index can be value-checked by the DuckDB oracle:
    *
    *  - vectors are micro-projected (floor(x·1e6): exact integer doubles);
    *  - init centroids = the `nCells` lowest-id vectors;
    *  - each Lloyd round assigns by squared-L2 with a fixed left-to-right
    *    fold (ties to the lowest cell_id) and re-centers with an exact
    *    BIGINT sum / count — one correctly-rounded division per component;
    *  - empty cells drop out (both engines recompute them identically).
    *
    * Centroid quality matches [[build]] for IVF purposes (coarse cells
    * only bound candidate sets; recall is governed by nprobe), so this is
    * the variant the declared queries use — the ML k-means path stays the
    * scale option for corpora where sampling + more iterations pay. */
  def buildPortable(
      corpus: DataFrame, nCells: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val mv = corpus.select(col(idCol), col(vecCol), microVec(col(vecCol)).as("_mv"))
    // Lloyd state lives on the DRIVER as the collected (cell_id,
    // centroid) array — nCells × dim, driver-sized by construction. Each
    // round's collect then executes exactly ONE assignment + re-center
    // pass over the corpus (the previous round's centroids ride along as
    // literals), and the returned index's `cells` is a LITERAL frame:
    // downstream consumers (probe broadcasts, ADC tables, the SemDeDup
    // election) reuse the trained numbers instead of re-executing the
    // whole Lloyd chain once per consumer (the pre-round-9 shape re-ran
    // it up to 3 extra corpus passes per query). The values are the same
    // collected doubles, so every result is bit-identical
    // (oracle-verified across the IVF query family).
    var cs = collectCells(
      mv.orderBy(col(idCol)).limit(nCells)
        .select(col(idCol), col("_mv"))
        .withColumn("cell_id",
          (row_number().over(Window.orderBy(col(idCol))) - 1).cast("int"))
        .select(col("cell_id"), col("_mv").as("centroid")))
    for (_ <- 1 to iters) {
      val a = withCellId(mv, cs)
      cs = collectCells(
        a.select(col("cell_id"), posexplode(col("_mv")).as(Seq("pos", "x")))
          .groupBy(col("cell_id"), col("pos"))
          .agg((sum(col("x").cast("long")).cast("double") / count(lit(1))).as("m"))
          .groupBy(col("cell_id"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            e => e.getField("m")).as("centroid")))
    }
    val cells = corpus.sparkSession.createDataFrame(
      cs.toIndexedSeq.map { case (id, c) => (id, c.toIndexedSeq) })
      .toDF("cell_id", "centroid")
    IvfIndex(cells, withCellId(mv, cs).drop("_mv"))
  }

  /** (cell_id, centroid) rows pulled to the driver, cell_id-ordered —
    * nCells × dim doubles, driver-sized for any sane cell count. */
  private def collectCells(cells: DataFrame): Array[(Int, Seq[Double])] =
    cells.select(col("cell_id"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Adds `cell_id` to a frame that already carries `_mv` (micro vector).
    * One codegen'd argmin ([[graft.functions.NearestCell]]) — the retired
    * nested-HOF spelling (aggregate over transform over zip_with folds)
    * was CodegenFallback, i.e. every vector × cell × dim step of Lloyd's
    * assignment ran interpreted, once per iteration per consumer.
    * Bit-identical fold order and tie/null semantics (IvfSpec parity
    * test + the q29/q80/q246 oracle rows). */
  private def withCellId(mv: DataFrame, cs: Array[(Int, Seq[Double])]): DataFrame =
    mv.withColumn("cell_id", graft.internal.Bridge.column(
      graft.functions.NearestCell(
        graft.internal.Bridge.expression(col("_mv")),
        cs.map(_._1), cs.map(_._2.toArray))))

  /** Assign arbitrary new vectors to a trained index's cells — a pure,
    * shuffle-free map column, so it works identically on BATCH and
    * STREAMING DataFrames (the cell collect touches only the stored
    * `cells` table, which is always a batch read). This is the index
    * MAINTENANCE primitive: a streaming job can route arriving vectors
    * into the stored layout's `cell_id` partitions and [[searchPruned]]
    * keeps pruning over the grown corpus
    * ([[graft.streaming.StreamingIvfIngest]]). */
  def assignVectors(
      index: IvfIndex, vectors: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    withCellId(vectors.withColumn("_mv", microVec(col(vecCol))), collectCells(index.cells))
      .drop("_mv")

  /** [[searchPruned]] with the PORTABLE probe: cell ranking uses cosine
    * over the micro-projected query against the (micro-unit) centroids,
    * three separate left-to-right accumulator folds exactly as
    * [[graft.functions.VectorExpressions.CosineSimilarity]] computes them
    * — so the probed cell set, and therefore the result, is reproducible
    * by the oracle. The final rescore is exact cosine on the raw vectors.
    * Partition pruning on the stored index works unchanged. */
  def searchPrunedPortable(
      index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame =
    pruneAndRescore(probePortable(index, queries, nprobe, idCol, vecCol),
      index, k, idCol, vecCol, excludeSelf)

  /** [[searchPqPruned]] with the PORTABLE probe (same three bounds:
    * pruned cells, ADC m-byte candidate scoring, exact top-`rerank`
    * refine) — composes with [[buildPortable]] + [[Pq.labelCodebook]] into
    * a fully oracle-checkable IVF-PQ stack. */
  def searchPqPrunedPortable(
      index: IvfIndex, codebook: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, m: Int, dim: Int,
      rerank: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val probed = probePortable(index, queries, nprobe, idCol, vecCol)
    pqRefine(probed, index, codebook, codes, queries, k, m, dim, rerank,
      idCol, vecCol, excludeSelf)
  }

  /** nprobe nearest cells by portable cosine (micro query vs centroid). */
  private def probePortable(
      index: IvfIndex, queries: DataFrame, nprobe: Int,
      idCol: String, vecCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"),
        microVec(col(vecCol)).as("_qmv"))
      .crossJoin(broadcast(index.cells))
      .withColumn("_csim", cosine_sim(col("_qmv"), col("centroid")))
      .withColumn("_crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_csim").desc, col("cell_id").asc)))
      .filter(col("_crk") <= nprobe)
      .select(col("query_id"), col("_qvec"), col("cell_id"))

  /** nprobe nearest cell centroids per query (tiny: centroids broadcast). */
  private def probeCells(
      index: IvfIndex, queries: DataFrame, nprobe: Int,
      idCol: String, vecCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"))
      .crossJoin(broadcast(index.cells))
      .withColumn("_csim", cosine_sim(col("_qvec"), col("centroid")))
      .withColumn("_crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_csim").desc, col("cell_id").asc)))
      .filter(col("_crk") <= nprobe)
      .select(col("query_id"), col("_qvec"), col("cell_id"))

  private def rescore(
      probed: DataFrame, assigned: DataFrame, k: Int,
      idCol: String, vecCol: String, excludeSelf: Boolean): DataFrame = {
    val pairs = probed
      .join(assigned.select(col("cell_id"),
        col(idCol).as("neighbor_id"), col(vecCol).as("_nvec")), Seq("cell_id"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec")))
    Knn.reduceTopK(pairs, k)
  }
}
