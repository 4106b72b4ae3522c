package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Multimodal}
import Q._

/** Simulator-driven, multimodal, and trained-index queries. Most carry a
  * rows-only driver check with value assertions in ScalaTest instead
  * (SimulatorValueSpec exact recomputation, MultimodalSpec determinism,
  * KnnSpec/IvfSpec recall bounds); q29/q80 are fully oracle-checked — the
  * portable fixed-point k-means makes even the TRAINED index reproducible
  * in DuckDB (oracle SQL at the bottom of this file).
  */
object Extras {

  val queries: Map[String, QueryFn] = Map(
    // Image near-dup by perceptual hash over REALLY-decoded pixels:
    // 64-bit aHash from the 8×8 luminance grid (javax.imageio decode),
    // then Hamming-close pairs via the same exact pigeonhole banding as
    // simhash — the multimodal dedup path (visually-identical images
    // collide even when their encoded bytes differ). Rows-only: DuckDB
    // can't decode PNG; the hash bits and pair recall are asserted in
    // MultimodalSpec on constructed near/far image fixtures.
    "q146_image_phash_pairs" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(t(s, dir, "documents"))
      graft.operators.Dedup.hammingPairs64(
          Multimodal.imageAHash64(media), maxHamming = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Video near-dup by shared visually-near frames: per-frame 64-bit
    // aHash over REALLY-decoded AVI frames (AviCodec DIB/MJPEG decode),
    // frames banded through the exact pigeonhole blocks, matches rolled
    // up per video pair with a coverage threshold — catches re-encodes
    // and trim-edits (a clip inside a longer video matches all its own
    // frames). Rows-only: DuckDB can't parse AVI; hash determinism,
    // identical/distinct pairing and the trimmed-clip case are asserted
    // in MultimodalSpec fixtures.
    "q240_video_neardup" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(t(s, dir, "documents"))
      Multimodal.videoNearDupPairs(media, maxHamming = 3)
        .orderBy(col("vid_a"), col("vid_b"))
    }),

    // Flagship IoT dataflow (reference §3.1-3.2 end-to-end): simulate a
    // fleet with an injected compressor failure, snapshot, profile on the
    // clean period, detect (paths 1+2), emit events. The snapshot table is
    // STAGED to parquet (SimFixture) so the DuckDB oracle recomputes the
    // whole detection chain — profile stats, z-scores, fingerprint cosine,
    // F10 score, F12 detail strings — from bit-identical floats; value
    // semantics also asserted in PipelineSpec E2E (50/50 injected ticks
    // flagged, 0 false positives) and SimulatorValueSpec.
    "q50_iot_detect_pipeline" -> ((s, dir) => {
      import graft.operators.{Detection, Profiles}
      import graft.core.DetectionConfig
      val _ = dir // driven by the generator, not the testdata tables
      val snaps = graft.sources.SimFixture.snapshots(s)
      val profiles = Profiles.build(snaps.filter(
        col("snapshot_time") < timestamp_seconds(lit(1704067200L + 200 * 10))))
      Detection.anomalyEvents(
        Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone))
        .select(col("device_id"), unix_micros(col("snapshot_time")).as("t_us"),
          round(col("anomaly_score"), 6).as("anomaly_score"),
          col("anomaly_type"), col("detection_details"))
        .orderBy(col("device_id"), col("t_us"))
    }),

    // Trained IVF ANN, full production shape: k-means cells, index
    // PERSISTED partitioned by cell_id, search via static partition
    // pruning — what the driver times is the actual 100 TB ANN path:
    // fit + write + pruned probe, with the probed cell set pushed into
    // the scan as a partition filter (plan-asserted in IvfSpec). The
    // PORTABLE k-means (fixed-point Lloyd rounds, exact integer-sum
    // re-centering) makes the trained cells — and therefore the whole
    // search result — reproducible bit-for-bit by the DuckDB oracle;
    // recall bounds for the ML-KMeans production variant live in IvfSpec.
    "q29_ivf_trained" -> ((s, dir) => {
      import graft.operators.Ivf
      val e = t(s, dir, "embeddings")
      val idx = Ivf.buildPortable(e, nCells = 8, iters = 2)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfp_idx_" +
        Q.cacheTag(dir)
      Ivf.writeIndex(idx, path)
      val stored = Ivf.readIndex(s, path)
      Ivf.searchPrunedPortable(stored, e.filter(col("vec_id") < 10), k = 5, nprobe = 3)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Multimodal feature extraction: binary payload columns → fixed-dim
    // features via per-partition decoder (stubbed decode; real plumbing).
    "q60_media_features" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("meta_width"), col("meta_height"), col("decode_ok"))
        .orderBy(col("media_id"))
    }),

    // Similar-states investigation (reference find_similar_states.py:
    // 86-315): for each detected anomaly, the "has this happened before?"
    // verdict over same-device history. Oracle-checked from the staged
    // snapshot fixture (same-device top-5 ranking, similarity aggregates,
    // the seen-before verdict); map-diff internals are asserted in
    // SimilarStatesSpec.
    "q56_similar_states" -> ((s, dir) => {
      import graft.operators.{Detection, Profiles, SimilarStates}
      import graft.core.DetectionConfig
      val _ = dir
      val snaps = graft.sources.SimFixture.snapshots(s)
      val profiles = Profiles.build(snaps.filter(
        col("snapshot_time") < timestamp_seconds(lit(1704067200L + 200 * 10))))
      val detected = Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone)
      val anomalous = detected.filter(col("is_anomalous"))
      SimilarStates.summary(
          SimilarStates.find(detected, anomalous, topN = 5, minSimilarity = 0.5))
        .select(col("device_id"), unix_micros(col("snapshot_time")).as("t_us"),
          col("n_similar"), col("n_similar_anomalous"),
          col("avg_similarity"), round(col("best_similarity"), 6).as("best_similarity"),
          col("seen_before_normal"))
        .orderBy(col("device_id"), col("t_us"))
    }),

    // All-methods comparison (reference detect_anomalies_all.py:66-246):
    // rules + profile paths + ANN novelty over the simulated fleet, per-
    // device firing rates, pairwise agreement, >=2-vote consensus.
    // Oracle-checked from the staged snapshot fixture (the full composite:
    // rules booleans, paths 1+2, the path-3 novelty self-join with warmup
    // NULLs, the vote matrix); detection rates also asserted in
    // PipelineSpec.
    "q55_iot_all_methods" -> ((s, dir) => {
      import graft.operators.{Detection, Profiles, Rules}
      import graft.core.DetectionConfig
      val _ = dir
      val snaps = graft.sources.SimFixture.snapshots(s)
      val profiles = Profiles.build(snaps.filter(
        col("snapshot_time") < timestamp_seconds(lit(1704067200L + 200 * 10))))
      val detected = Detection.pathsOneTwo(snaps, profiles, DetectionConfig.Standalone)
      val ruled = Rules.evaluate(s, snaps)
        .select(col("device_id"), col("snapshot_time"), col("rules_triggered"))
      val p3 = Detection.pathThreeAfterOneTwo(detected, DetectionConfig.VectorSearch)
        .join(ruled, Seq("device_id", "snapshot_time"))
      Detection.methodComparison(p3).orderBy(col("device_id"))
    }),

    // IVF-PQ with exact refine — the full production ANN stack: stored
    // cells bound bytes read (partition pruning), PQ codes bound bytes per
    // candidate (ADC over m-byte codes), exact cosine re-ranks only the
    // top-`rerank` shortlist. Rows-only: k-means cells/codebooks are
    // seed-stable but not SQL-reproducible; recall bounds, refine
    // exactness, and the pruned-scan plan gate live in IvfPqSpec.
    "q80_ivfpq" -> ((s, dir) => {
      import graft.operators.{Ivf, Pq}
      val e = t(s, dir, "embeddings")
      // cache key includes the source file's length + mtime: regenerated
      // data at the same path invalidates the cached index instead of
      // silently probing a stale one
      val srcMeta = new java.io.File(s"$dir/embeddings.parquet")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpqp_" +
        Q.cacheTag(dir, srcMeta.length.toString, srcMeta.lastModified.toString)
      // Build-once-probe-many: the index lifecycle a production deployment
      // has (the portable builds are pure functions of the data, so a
      // stored index is bit-identical to a rebuild). What the bench then
      // measures is the stored-index probe — the recurring cost at 100 TB,
      // where the build is a one-time amortized job. The portable cell /
      // codebook variants make the entire stack — trained cells, PQ codes,
      // ADC shortlist, exact refine — reproducible by the DuckDB oracle;
      // the ML-KMeans cells + trained codebook remain the production
      // variant (recall bounds in IvfPqSpec/PqSpec).
      if (!new java.io.File(s"$base/codes/_SUCCESS").exists()) {
        Ivf.writeIndex(Ivf.buildPortable(e, nCells = 8, iters = 2), base)
        val cb = Pq.labelCodebook(e, "label", "embedding", m = 8, dim = 64)
        cb.write.mode("overwrite").parquet(s"$base/codebook")
        Pq.encode(e, cb, "vec_id", "embedding", m = 8, dim = 64)
          .write.mode("overwrite").parquet(s"$base/codes")
      }
      val stored = Ivf.readIndex(s, base)
      val cb = s.read.parquet(s"$base/codebook")
      val codes = s.read.parquet(s"$base/codes")
      Ivf.searchPqPrunedPortable(stored, cb, codes, e.filter(col("vec_id") < 10),
          k = 5, nprobe = 3, m = 8, dim = 64, rerank = 20)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // ANN recall evaluation: recall@5 of the trained portable-IVF probe
    // (q29's index math) against exact kNN, per query in integer ppm —
    // the nprobe/rerank tuning metric, itself oracle-hash-checked
    // because BOTH sides are portable.
    "q103_ann_recall" -> ((s, dir) => {
      import graft.operators.{Ivf, Knn}
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
      val exact = Knn.exact(e, queries, k = 5)
      val idx = Ivf.buildPortable(e, nCells = 8, iters = 2)
      val approx = Ivf.searchPrunedPortable(idx, queries, k = 5, nprobe = 3)
      Knn.recallAtK(exact, approx).orderBy(col("query_id"))
    }),

    // SemDeDup-style semantic dedup: portable trained cells bound the
    // pair space (O(Σ cell²), co-partitioned self-join), earliest-id
    // keep rule makes the removed set deterministic — the whole
    // cluster-then-compare pipeline is reproduced by the oracle.
    "q85_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.operators.Dedup.semanticDupes(e, nCells = 8, minCosine = 0.3)
        .select(col("vec_id"), col("kept_by"), round(col("sim"), 6).as("sim"))
        .orderBy(col("vec_id"))
    }),

    // SemDeDup, paper-faithful form (Abbas et al. 2023): q85's
    // cluster-then-compare bound, but semantic-duplicate groups are
    // TRANSITIVE (component labeling within the cell) and the kept
    // exemplar is the member LEAST similar to its cell centroid (the
    // paper's keep-outliers election) — one row per vector with its
    // group label and verdict. Deterministic end to end (portable
    // k-means + fixed-order cosine + min-id tie-breaks), so even the
    // election is oracle-hash-checked.
    "q246_semantic_exemplars" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.operators.Dedup.semanticDedupExemplars(e, nCells = 8, minCosine = 0.3)
        .orderBy(col("vec_id"))
    }),

    // Cluster-balanced diversity sample: at most 25 vectors per trained
    // k-means cell by deterministic hash rank — the semantic-coverage
    // sampler (uniform sampling reproduces topic skew; equal-cell
    // sampling keeps tail topics), trained cells and all
    // oracle-reproduced.
    "q256_diverse_sample" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.operators.Sampling.diverseSample(e, perCell = 25, nCells = 8)
        .orderBy(col("cell_id"), col("vec_id"))
    }),

    // SemDeDup recall calibration: the paper's accepted cross-cell loss,
    // MEASURED — exact ground-truth pairs at cosine >= 0.3 over the
    // vec_id % 4 audit subset vs the fraction co-celled by the portable
    // k-means at 4 / 8 / 16 cells (each trained on the full corpus, the
    // operating partitioning). The q195-style calibration row for the
    // semantic-dedup family: how much recall each cell-count bucket
    // costs, as data, not as a promise.
    "q253_semdedup_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // the operating default (semanticDedupExemplars auto rule,
      // k = max(8, ceil(N/4096))) is part of the calibration: the fixed
      // 4/8/16 audit grid is a declared constant (the oracle unrolls one
      // k-means chain per grid point — it cannot follow a data-dependent
      // k), and the row equal to the derived k is MARKED (is_auto_k).
      // The rule resolves to 8 for any corpus up to 32,768 vectors, so
      // at every gate scale the default IS covered; past that the flag
      // honestly reads all-false rather than silently pretending
      val kAuto = {
        val n = e.count()
        math.max(8L, (n + 4095) / 4096).min(Int.MaxValue).toInt
      }
      graft.operators.Dedup.semanticRecallAudit(e,
          cellCounts = Seq(4, 8, 16), minCosine = 0.3, sampleMod = 4)
        .withColumn("is_auto_k", col("n_cells") === kAuto)
        .orderBy(col("n_cells"))
    }),

    // Incremental semantic dedup — the ingest-time SemDeDup probe: the
    // 90% of the corpus already indexed (portable k-means cells, STORED
    // cell-partitioned via Ivf.writeIndex), the 10% delta routed to its
    // cells by a pure map and compared against those cells' members only
    // (hamming screen + exact cosine). Per-increment cost O(delta ×
    // cell occupancy); the index is never recomputed — q74's
    // daily-increment shape for the embedding family, trained index and
    // all reproduced by the oracle.
    "q258_incremental_semantic" -> ((s, dir) => {
      import graft.operators.{Dedup, Ivf}
      val e = t(s, dir, "embeddings")
      val indexed = e.filter(col("vec_id") % 10 =!= 0)
      val delta = e.filter(col("vec_id") % 10 === 0)
      // cache key includes the source file's length + mtime (the q80
      // discipline): regenerated data invalidates the stored index. Full
      // 128-bit tag (Q.cacheTag) — a 32-bit hashCode collision across
      // datasets would silently reuse a WRONG stored index.
      val srcMeta = new java.io.File(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_semidx_" +
        Q.cacheTag(dir, srcMeta.length.toString, srcMeta.lastModified.toString)
      if (!new java.io.File(s"$path/assigned/_SUCCESS").exists())
        Ivf.writeIndex(Ivf.buildPortable(indexed, nCells = 8, iters = 2), path)
      val stored = Ivf.readIndex(s, path)
      Dedup.incrementalSemanticDupes(stored, delta, minCosine = 0.3)
        .orderBy(col("vec_id"))
    }),

    // Multimodal + vector search composition: nearest media assets by
    // stub-feature cosine (shows media features flow into the ANN core).
    // The query-side media filter runs BEFORE the decode: filters can't
    // push through the opaque mapPartitions decoder, so decoding-then-
    // filtering would decode the whole corpus twice. Decode cost here is
    // |corpus| + |queries|, the honest shape when decode dominates.
    "q61_media_knn" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(t(s, dir, "documents"))
      def feats(m: org.apache.spark.sql.Dataset[Multimodal.MediaRow]) =
        Multimodal.extractFeatures(m).toDF()
          .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      Knn.exact(feats(media), feats(media.filter(col("media_id") < 5)), k = 3)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Matryoshka truncation evaluation: recall@5 of brute-force kNN on
    // the FIRST 16 of 64 dims against full-dim ground truth — the
    // "how much cheaper can the serving vectors get" measurement for
    // MRL-style embeddings. Both sides are exact deterministic scans,
    // so even this evaluation is oracle-hash-checked.
    "q124_matryoshka_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
      def trunc(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("embedding", slice(col("embedding"), 1, 16))
      Knn.recallAtK(
          Knn.exact(e, queries, k = 5),
          Knn.exact(trunc(e), trunc(queries), k = 5))
        .orderBy(col("query_id"))
    }),

    // Cluster-quality report over the label cells: per cluster the mean
    // squared distance to its own centroid, to the nearest other centroid,
    // and the centroid-based silhouette — the O(n·k) quality measurement
    // for an embedding partitioning (full silhouette is O(n²) and does
    // not scale). Broadcast centroids: the per-point pass is map-side.
    "q135_cluster_quality" -> ((s, dir) => {
      import graft.operators.Evaluate
      val e = t(s, dir, "embeddings")
      Evaluate.clusterQuality(e, "vec_id", "label", "embedding")
        .orderBy(col("label"))
    }),

    // Top-PC projection over the leading 8 embedding dims: one
    // moments pass (a single row out of the shuffle), 10 power-iteration
    // steps on the driver-sized 8×8 scatter matrix, then a zero-shuffle
    // integer projection map — the whitening / dominant-direction
    // primitive before outlier pruning. Even the TRAINED component is
    // oracle-reproduced (unrolled-CTE power iteration, micro-unit exact
    // moments, ppm-quantized component).
    "q150_pca_projection" -> ((s, dir) => {
      graft.operators.Pca.projectTop(t(s, dir, "embeddings"),
          dim = 8, iters = 10)
        .orderBy(col("vec_id"))
    }),
  )

  // ---------------------------------------------------------------------
  // Portable-IVF oracle SQL. Mirrors Ivf.buildPortable / probePortable /
  // rescore step for step: micro-unit vectors (floor(x·1e6) — integer
  // doubles), init cells = the 8 lowest-id vectors, two Lloyd rounds
  // (fixed left-to-right distance folds, exact BIGINT-sum re-centering),
  // portable cosine probe (three separate left-to-right folds, the same
  // accumulator order as the codegen'd cosine_sim loop), exact cosine
  // rescore on the raw vectors. Every arithmetic step is a fixed-order
  // IEEE double op, so DuckDB reproduces the trained index bit-for-bit.

  private def fold(listExpr: String): String =
    s"list_reduce(list_prepend(0.0, $listExpr), (a, b) -> a + b)"

  /** Σ (x[i]-y[i])² over dim 64, left-to-right. */
  private def d2Fold(x: String, y: String): String =
    fold(s"list_transform(range(1, 65), i -> ($x[i] - $y[i]) * ($x[i] - $y[i]))")

  /** cosine with zero-norm→0.0; dot/norms as three separate ltr folds. */
  private def cosSelect(qv: String, nv: String): String = cosSelectD(qv, nv, 64)

  /** [[cosSelect]] over the first `d` dims (Matryoshka truncation). */
  private def cosSelectD(qv: String, nv: String, d: Int): String =
    s"""${fold(s"list_transform(range(1, ${d + 1}), i -> $qv[i] * $nv[i])")} AS dot,
       |${fold(s"list_transform(range(1, ${d + 1}), i -> $qv[i] * $qv[i])")} AS na,
       |${fold(s"list_transform(range(1, ${d + 1}), i -> $nv[i] * $nv[i])")} AS nb""".stripMargin

  private def assignCte(a: String, c: String, base: String = "e"): String =
    s"""$a AS (SELECT vec_id, cell_id FROM (
       |  SELECT e.vec_id, c.cell_id, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${d2Fold("e.mv", "c.centroid")} ASC, c.cell_id ASC) AS rn
       |  FROM $base e CROSS JOIN $c c) WHERE rn = 1)""".stripMargin

  private def updateCte(cNew: String, a: String): String =
    s"""$cNew AS (SELECT cell_id, list(m ORDER BY pos) AS centroid FROM (
       |  SELECT asg.cell_id, uv.pos, CAST(sum(CAST(uv.x AS BIGINT)) AS DOUBLE) / count(*) AS m
       |  FROM $a asg JOIN (SELECT vec_id, generate_subscripts(mv, 1) AS pos,
       |                    unnest(mv) AS x FROM e) uv USING (vec_id)
       |  GROUP BY asg.cell_id, uv.pos) GROUP BY cell_id)""".stripMargin

  /** e → c0 → (a1,c1) → (a2,c2) → af (final cells) → q → pr (probed). */
  private val ivfCtes: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev,
       |  list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1000000.0)) AS mv
       |  FROM embeddings),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell_id,
       |         mv AS centroid
       |       FROM (SELECT vec_id, mv FROM e ORDER BY vec_id LIMIT 8)),
       |${assignCte("a1", "c0")},
       |${updateCte("c1", "a1")},
       |${assignCte("a2", "c1")},
       |${updateCte("c2", "a2")},
       |${assignCte("af", "c2")},
       |q AS (SELECT vec_id AS qid, ev AS qv, mv AS qmv FROM e WHERE vec_id < 10),
       |ps AS (SELECT qid, cell_id,
       |         CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |              ELSE dot / (sqrt(na) * sqrt(nb)) END AS csim
       |       FROM (SELECT q.qid, c.cell_id, ${cosSelect("q.qmv", "c.centroid")}
       |             FROM q CROSS JOIN c2 c)),
       |pr AS (SELECT qid, cell_id FROM (SELECT qid, cell_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY csim DESC, cell_id ASC) AS crk
       |       FROM ps) WHERE crk <= 3)""".stripMargin

  /** Parameterized portable-k-means chain over the shared `e` CTE:
    * {p}c0 → ({p}a1,{p}c1) → ({p}a2,{p}c2) → {p}af — q29's trained
    * cells at any cell count, name-prefixed so several cell counts can
    * coexist in one statement (the q253 recall audit trains three). */
  private def cellChain(p: String, k: Int): String =
    s"""${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell_id,
       |         mv AS centroid
       |       FROM (SELECT vec_id, mv FROM e ORDER BY vec_id LIMIT $k)),
       |${assignCte(s"${p}a1", s"${p}c0")},
       |${updateCte(s"${p}c1", s"${p}a1")},
       |${assignCte(s"${p}a2", s"${p}c1")},
       |${updateCte(s"${p}c2", s"${p}a2")},
       |${assignCte(s"${p}af", s"${p}c2")}""".stripMargin

  // ---------------------------------------------------------------------
  // Detection-pipeline oracle SQL (q50/q55/q56). Recomputes the whole
  // chain from the staged simulator snapshot fixture (SimFixture.Path):
  // Profiles.build (dsum stats, decimal-exact float-cast centroid) and
  // Detection.pathsOneTwo under the Standalone config (z > 3, >= 1
  // outlier, fingerprint cosine < 0.85), every float op in the same
  // fixed left-to-right fold order as the codegen'd expressions.

  /** t0 + 200 ticks × 10 s — the profile training cut (UTC). */
  private val trainCut = "TIMESTAMP '2024-01-01 00:33:20'"

  private val cosCase =
    "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / (sqrt(na) * sqrt(nb)) END"

  /** snaps → (per-metric stats, profile embedding) → per-snapshot paths-
    * 1/2 verdict (`det`: n_out, zsum, sim, p1, p2, is_anom, emb, nrm). */
  private val simCtes: String =
    s"""WITH snaps AS (SELECT device_id, snapshot_time, device_type,
       |    CAST(embedding AS DOUBLE[]) AS emb, metrics
       |  FROM read_parquet('${graft.sources.SimFixture.OracleGlob}')),
       |mx AS (SELECT device_id, snapshot_time, device_type,
       |    unnest(map_keys(metrics)) AS metric,
       |    unnest(map_values(metrics)) AS v
       |  FROM snaps),
       |pn AS (SELECT device_id, count(*) AS n_train FROM snaps
       |  WHERE snapshot_time < $trainCut
       |  GROUP BY device_id HAVING count(*) >= 5),
       |st AS (SELECT m.device_id, m.metric,
       |    ${dsumSql("v", 2)} / count(*) AS mean,
       |    sqrt(${dsumSql("v * v", 4)} / count(*)
       |      - (${dsumSql("v", 2)} / count(*)) * (${dsumSql("v", 2)} / count(*)))
       |      AS std
       |  FROM mx m JOIN pn USING (device_id)
       |  WHERE m.snapshot_time < $trainCut GROUP BY m.device_id, m.metric),
       |pe AS (SELECT device_id, list(m ORDER BY pos) AS pv FROM (
       |    SELECT device_id, pos,
       |      CAST(CAST(${dsumSql("x", 15)} / count(*) AS REAL) AS DOUBLE) AS m
       |    FROM (SELECT s.device_id, generate_subscripts(s.emb, 1) AS pos,
       |            unnest(s.emb) AS x
       |          FROM snaps s JOIN pn USING (device_id)
       |          WHERE s.snapshot_time < $trainCut)
       |    GROUP BY device_id, pos) GROUP BY device_id),
       |ol AS (SELECT m.device_id, m.snapshot_time, m.metric,
       |    abs(m.v - st.mean) / st.std AS z
       |  FROM mx m JOIN st ON st.device_id = m.device_id AND st.metric = m.metric
       |  WHERE st.std > 0 AND abs(m.v - st.mean) / st.std > 3.0),
       |oagg AS (SELECT device_id, snapshot_time, count(*) AS n_out,
       |    ${fold("list(least(10.0, z) ORDER BY metric)")} AS zsum
       |  FROM ol GROUP BY device_id, snapshot_time),
       |sm AS (SELECT device_id, snapshot_time, $cosCase AS sim FROM (
       |    SELECT s.device_id, s.snapshot_time, ${cosSelectD("s.emb", "p.pv", 128)}
       |    FROM snaps s JOIN pe p USING (device_id))),
       |det AS (SELECT s.device_id, s.snapshot_time, s.device_type, s.emb,
       |    ${fold("list_transform(range(1, 129), i -> s.emb[i] * s.emb[i])")}
       |      AS nrm,
       |    coalesce(o.n_out, 0) AS n_out, o.zsum, coalesce(m.sim, 1.0) AS sim,
       |    coalesce(o.n_out, 0) >= 1 AS p1,
       |    coalesce(m.sim < 0.85, FALSE) AS p2,
       |    coalesce(o.n_out, 0) >= 1 OR coalesce(m.sim < 0.85, FALSE) AS is_anom
       |  FROM snaps s
       |  LEFT JOIN oagg o ON o.device_id = s.device_id
       |    AND o.snapshot_time = s.snapshot_time
       |  LEFT JOIN sm m ON m.device_id = s.device_id
       |    AND m.snapshot_time = s.snapshot_time)""".stripMargin

  /** exact-cosine rescore of a (qid, nid) candidate CTE → top-k rows. */
  private def rescoreSql(cand: String, k: Int): String =
    s"""sc AS (SELECT qid, nid,
       |         CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |              ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
       |       FROM (SELECT c.qid, c.nid, ${cosSelect("q.qv", "n.ev")}
       |             FROM $cand c JOIN q ON q.qid = c.qid
       |             JOIN e n ON n.vec_id = c.nid)),
       |r AS (SELECT qid, nid, cs,
       |        row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk
       |      FROM sc)
       |SELECT qid AS query_id, rk, nid AS neighbor_id, round(cs, 6) AS sim
       |FROM r WHERE rk <= $k ORDER BY query_id, rk""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Mirrors Detection.pathsOneTwo (Standalone) + anomalyEvents over the
    // staged fixture: F10 score (max(0,1-sim) + capped-z sum / 40) and the
    // F12 detail string (top-3 outliers by z desc, metric desc; %.1f / %.3f
    // formatting) recomputed from scratch.
    "q50_iot_detect_pipeline" ->
      s"""$simCtes,
         |t3 AS (SELECT device_id, snapshot_time,
         |    string_agg(metric || ' (Z: ' || printf('%.1f', round(z, 1)) || ')',
         |               ', ' ORDER BY rk) AS d1
         |  FROM (SELECT device_id, snapshot_time, metric, z,
         |      row_number() OVER (PARTITION BY device_id, snapshot_time
         |        ORDER BY z DESC, metric DESC) AS rk FROM ol)
         |  WHERE rk <= 3 GROUP BY device_id, snapshot_time)
         |SELECT d.device_id, epoch_us(d.snapshot_time) AS t_us,
         |  round(greatest(0.0, 1.0 - d.sim)
         |    + CASE WHEN d.n_out > 0 THEN least(1.0, d.zsum / 40.0)
         |           ELSE 0.0 END, 6) AS anomaly_score,
         |  'consumer_paths_1_2' AS anomaly_type,
         |  concat_ws(' | ',
         |    CASE WHEN d.p1 THEN 'PATH 1 (Rules): ' || CAST(d.n_out AS VARCHAR)
         |      || ' outliers - ' || t3.d1 END,
         |    CASE WHEN d.p2 THEN 'PATH 2 (Fingerprint): similarity='
         |      || printf('%.3f', round(d.sim, 3)) || ' (< 0.85)' END) AS detection_details
         |FROM det d LEFT JOIN t3 ON t3.device_id = d.device_id
         |  AND t3.snapshot_time = d.snapshot_time
         |WHERE d.p1 OR d.p2
         |ORDER BY d.device_id, t_us""".stripMargin,

    // Mirrors Rules.evaluate (threshold VALUES from the SAME Scala table +
    // the three relationship predicates), Detection.pathThreeAfterOneTwo
    // under VectorSearch (24 h lookback self-join, warmup-NULL below 30,
    // cosine >= 0.90 among non-anomalous, novelty = matches < 5) and
    // methodComparison's vote matrix.
    "q55_iot_all_methods" -> {
      val thrValues = graft.operators.Rules.thresholdRules
        .map { case (dt, m, mn, mx, _) => s"('$dt', '$m', $mn, $mx)" }
        .mkString(",\n    ")
      s"""$simCtes,
         |thr(dt, metric, mn, mx) AS (VALUES
         |    $thrValues),
         |tv AS (SELECT DISTINCT m.device_id, m.snapshot_time
         |  FROM mx m JOIN thr ON m.device_type = thr.dt AND m.metric = thr.metric
         |  WHERE m.v < thr.mn OR m.v > thr.mx),
         |piv AS (SELECT device_id, snapshot_time,
         |    any_value(device_type) AS device_type,
         |    max(CASE WHEN metric = 'compressor_status' THEN v END) AS comp_st,
         |    max(CASE WHEN metric = 'power_consumption' THEN v END) AS pw,
         |    max(CASE WHEN metric = 'supply_air_temp' THEN v END) AS sat,
         |    max(CASE WHEN metric = 'return_air_temp' THEN v END) AS rat,
         |    max(CASE WHEN metric = 'chilled_water_delta_t' THEN v END) AS dt
         |  FROM mx GROUP BY device_id, snapshot_time),
         |rel AS (SELECT device_id, snapshot_time,
         |    (device_type = 'rooftop_unit'
         |       AND coalesce(comp_st = 1.0 AND pw < 5.0, FALSE))
         |    OR (device_type = 'rooftop_unit'
         |       AND coalesce(abs(sat - rat) > 25.0, FALSE))
         |    OR (device_type = 'chiller' AND coalesce(dt < 3.0, FALSE)) AS rel_trig
         |  FROM piv),
         |rl AS (SELECT d.device_id, d.snapshot_time,
         |    (tv.device_id IS NOT NULL) OR coalesce(rel.rel_trig, FALSE) AS m1
         |  FROM det d
         |  LEFT JOIN tv ON tv.device_id = d.device_id
         |    AND tv.snapshot_time = d.snapshot_time
         |  LEFT JOIN rel ON rel.device_id = d.device_id
         |    AND rel.snapshot_time = d.snapshot_time),
         |pp AS (SELECT device_id, q_time, c_anom, $cosCase AS cs FROM (
         |    SELECT q.device_id, q.snapshot_time AS q_time, c.is_anom AS c_anom,
         |      ${fold("list_transform(range(1, 129), i -> q.emb[i] * c.emb[i])")}
         |        AS dot,
         |      q.nrm AS na, c.nrm AS nb
         |    FROM det q JOIN det c ON c.device_id = q.device_id
         |    WHERE c.snapshot_time <> q.snapshot_time
         |      AND c.snapshot_time >= q.snapshot_time - INTERVAL 24 HOUR
         |      AND c.snapshot_time <= q.snapshot_time)),
         |p3 AS (SELECT device_id, q_time AS snapshot_time, count(*) AS corpus_n,
         |    count(*) FILTER (WHERE NOT c_anom AND cs >= 0.90) AS match_n
         |  FROM pp GROUP BY device_id, q_time),
         |mm AS (SELECT d.device_id,
         |    coalesce(rl.m1, FALSE) AS m1, (d.p1 OR d.p2) AS m2,
         |    CASE WHEN coalesce(p3.corpus_n, 0) < 30 THEN FALSE
         |         ELSE p3.match_n < 5 END AS m3
         |  FROM det d
         |  JOIN rl ON rl.device_id = d.device_id
         |    AND rl.snapshot_time = d.snapshot_time
         |  LEFT JOIN p3 ON p3.device_id = d.device_id
         |    AND p3.snapshot_time = d.snapshot_time)
         |SELECT device_id, count(*) AS n_snapshots,
         |  count(*) FILTER (WHERE m1) AS rules_n,
         |  count(*) FILTER (WHERE m2) AS profile_n,
         |  count(*) FILTER (WHERE m3) AS vector_n,
         |  count(*) FILTER (WHERE m1 AND m2) AS rules_profile_agree,
         |  count(*) FILTER (WHERE m2 AND m3) AS profile_vector_agree,
         |  count(*) FILTER (WHERE m1 AND m3) AS rules_vector_agree,
         |  count(*) FILTER (WHERE CAST(m1 AS INT) + CAST(m2 AS INT)
         |    + CAST(m3 AS INT) >= 2) AS consensus_n,
         |  round(CAST(count(*) FILTER (WHERE CAST(m1 AS INT) + CAST(m2 AS INT)
         |    + CAST(m3 AS INT) >= 2) AS DOUBLE) / count(*), 4) AS consensus_rate
         |FROM mm GROUP BY device_id ORDER BY device_id""".stripMargin
    },

    // Mirrors SimilarStates.find + summary over the paths-1/2 verdict:
    // per anomalous target, same-device candidates at cosine >= 0.5,
    // top-5 by (sim desc, time asc), then the seen-before rollup.
    "q56_similar_states" ->
      s"""$simCtes,
         |sp AS (SELECT device_id, t_time, c_time, c_anom, $cosCase AS sim FROM (
         |    SELECT t.device_id, t.snapshot_time AS t_time,
         |      c.snapshot_time AS c_time, c.is_anom AS c_anom,
         |      ${fold("list_transform(range(1, 129), i -> t.emb[i] * c.emb[i])")}
         |        AS dot,
         |      t.nrm AS na, c.nrm AS nb
         |    FROM det t JOIN det c ON c.device_id = t.device_id
         |    WHERE t.is_anom AND c.snapshot_time <> t.snapshot_time)),
         |rkd AS (SELECT *, row_number() OVER (PARTITION BY device_id, t_time
         |    ORDER BY sim DESC, c_time ASC) AS rk
         |  FROM sp WHERE sim >= 0.5)
         |SELECT device_id, epoch_us(t_time) AS t_us, count(*) AS n_similar,
         |  count(*) FILTER (WHERE c_anom) AS n_similar_anomalous,
         |  round(${dsumSql("sim", 15)} / count(*), 6) AS avg_similarity,
         |  round(max(sim), 6) AS best_similarity,
         |  count(*) > count(*) FILTER (WHERE c_anom) AS seen_before_normal
         |FROM rkd WHERE rk <= 5
         |GROUP BY device_id, t_time ORDER BY device_id, t_us""".stripMargin,

    "q29_ivf_trained" ->
      s"""$ivfCtes,
         |cand AS (SELECT pr.qid, af.vec_id AS nid
         |         FROM pr JOIN af USING (cell_id) WHERE af.vec_id <> pr.qid),
         |${rescoreSql("cand", 5)}""".stripMargin,

    // IVF-PQ with exact refine: the portable IVF above + the q68-style
    // label codebook / encode / ADC (all over the same micro-unit vectors)
    // + top-20 ADC shortlist + exact cosine top-5.
    "q80_ivfpq" ->
      s"""$ivfCtes,
         |pu AS (SELECT label, vec_id, generate_subscripts(mv, 1) - 1 AS pos,
         |         unnest(mv) AS x FROM e),
         |cb AS (SELECT label AS code, pos // 8 AS s, pos % 8 AS j,
         |         CAST(sum(CAST(x AS BIGINT)) AS DOUBLE) / count(*) AS c
         |       FROM pu GROUP BY label, pos // 8, pos % 8),
         |cbl AS (SELECT s, code, list(c ORDER BY j) AS cent FROM cb GROUP BY s, code),
         |sv AS (SELECT vec_id, pos // 8 AS s, list(x ORDER BY pos % 8) AS sub
         |       FROM pu GROUP BY vec_id, pos // 8),
         |d AS (SELECT vec_id, sv.s, code,
         |        ${fold("list_transform(range(1, 9), i -> (sub[i] - cent[i]) * (sub[i] - cent[i]))")} AS d2
         |      FROM sv JOIN cbl ON cbl.s = sv.s),
         |en AS (SELECT vec_id, s, code FROM (
         |         SELECT vec_id, s, code,
         |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
         |         FROM d) WHERE rn = 1),
         |qd AS (SELECT vec_id AS qid, s, code, d2 FROM d WHERE vec_id < 10),
         |cand0 AS (SELECT pr.qid, af.vec_id AS nid
         |          FROM pr JOIN af USING (cell_id) WHERE af.vec_id <> pr.qid),
         |j2 AS (SELECT c0.qid, c0.nid, qd.s, qd.d2
         |       FROM cand0 c0 JOIN en ON en.vec_id = c0.nid
         |       JOIN qd ON qd.qid = c0.qid AND qd.s = en.s AND qd.code = en.code),
         |adc AS (SELECT qid, nid,
         |          list_reduce(list_prepend(0.0, list(d2 ORDER BY s)), (x, y) -> x + y) AS ad
         |        FROM j2 GROUP BY qid, nid),
         |sl AS (SELECT qid, nid FROM (SELECT qid, nid,
         |         row_number() OVER (PARTITION BY qid ORDER BY ad ASC, nid ASC) AS ark
         |       FROM adc) WHERE ark <= 20),
         |${rescoreSql("sl", 5)}""".stripMargin,

    // Mirrors Knn.recallAtK over the two portable pipelines: the probed
    // top-5 (q29's CTEs) against the exhaustive top-5.
    "q103_ann_recall" -> {
      def topkCte(name: String, cand: String): String =
        s"""${name}_sc AS (SELECT qid, nid,
           |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
           |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
           |  FROM (SELECT c.qid, c.nid, ${cosSelect("q.qv", "n.ev")}
           |        FROM $cand c JOIN q ON q.qid = c.qid JOIN e n ON n.vec_id = c.nid)),
           |$name AS (SELECT qid, nid FROM (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk
           |  FROM ${name}_sc) WHERE rk <= 5)""".stripMargin
      s"""$ivfCtes,
         |cand AS (SELECT pr.qid, af.vec_id AS nid
         |         FROM pr JOIN af USING (cell_id) WHERE af.vec_id <> pr.qid),
         |${topkCte("apx", "cand")},
         |exc AS (SELECT q.qid, e.vec_id AS nid FROM q, e WHERE e.vec_id <> q.qid),
         |${topkCte("ext", "exc")}
         |SELECT g.qid AS query_id,
         |  CAST(coalesce(h.n_hit, 0) * 1000000 // g.n_gt AS BIGINT) AS recall_ppm
         |FROM (SELECT qid, count(*) AS n_gt FROM ext GROUP BY qid) g
         |LEFT JOIN (SELECT x.qid, count(*) AS n_hit
         |           FROM ext x JOIN apx ON apx.qid = x.qid AND apx.nid = x.nid
         |           GROUP BY x.qid) h ON h.qid = g.qid
         |ORDER BY query_id""".stripMargin
    },

    // Mirrors Dedup.semanticDupes: the same portable trained cells (af),
    // within-cell id-ordered pairs, fixed-fold cosine over the raw
    // vectors, earliest-similar-keeper aggregation.
    "q85_semantic_dedup" ->
      s"""$ivfCtes,
         |m AS (SELECT af.vec_id, af.cell_id, e.ev FROM af JOIN e USING (vec_id)),
         |p0 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${cosSelect("a.ev", "b.ev")}
         |       FROM m a JOIN m b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id),
         |p AS (SELECT id_a, id_b,
         |        CASE WHEN na = 0 OR nb = 0 THEN 0.0
         |             ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
         |      FROM p0)
         |SELECT id_b AS vec_id, min(id_a) AS kept_by,
         |  round(min_by(cs, id_a), 6) AS sim
         |FROM p WHERE cs >= 0.3 GROUP BY id_b ORDER BY vec_id""".stripMargin,

    // Mirrors Dedup.semanticDedupExemplars: q85's portable cells + pair
    // cosines, then recursive min-label components over the qualifying
    // pairs (q38's oracle pattern) and the centroid-outlier election
    // (row_number over raw fixed-fold cosine ASC, vec_id ASC). The
    // operator's sign-bit hamming screen is modeled EXACTLY (the q24
    // recipe: same md5-derived ±1 planes at seed 2303, same
    // left-to-right dot folds, so the 64 sign bits — and therefore the
    // screened pair set — are bit-identical, keeping the gate exact
    // rather than 5σ-probabilistic).
    "q246_semantic_exemplars" ->
      s"""${ivfCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |m AS (SELECT af.vec_id, af.cell_id, e.ev, e.mv FROM af JOIN e USING (vec_id)),
         |psg AS (SELECT b.b, i.i,
         |    CASE WHEN (CAST('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':' ||
         |           CAST(i.i AS VARCHAR) || '#2303'), 1, 8) AS BIGINT) & 1) = 1
         |      THEN 1.0 ELSE -1.0 END AS sg
         |  FROM (SELECT unnest(range(0, 64)) AS b) b,
         |       (SELECT unnest(range(0, 64)) AS i) i),
         |psgl AS (SELECT b, list(sg ORDER BY i) AS sgl FROM psg GROUP BY b),
         |pbit AS (SELECT m.vec_id, s.b,
         |    ${fold("list_transform(range(1, 65), i -> m.ev[i] * s.sgl[i])")} >= 0 AS bit
         |  FROM m CROSS JOIN psgl s),
         |pb AS (SELECT vec_id, list(bit ORDER BY b) AS sb FROM pbit GROUP BY vec_id),
         |p0 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${cosSelect("a.ev", "b.ev")}
         |       FROM m a JOIN m b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |       JOIN pb pa ON pa.vec_id = a.vec_id
         |       JOIN pb qb ON qb.vec_id = b.vec_id
         |       WHERE ${fold("list_transform(range(1, 65), i -> CASE WHEN pa.sb[i] <> qb.sb[i] THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)")}
         |         <= ${graft.operators.Dedup.hammingScreenThreshold(0.3)}),
         |p AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
         |        CASE WHEN na = 0 OR nb = 0 THEN 0.0
         |             ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
         |      FROM p0) WHERE cs >= 0.3),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
         |reach(n, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e2.a, reach.r FROM edges e2 JOIN reach ON e2.b = reach.n),
         |comp0 AS (SELECT n AS vec_id, min(r) AS keep_id FROM reach GROUP BY n),
         |cc AS (SELECT vec_id, cell_id,
         |         CASE WHEN na = 0 OR nb = 0 THEN 0.0
         |              ELSE dot / (sqrt(na) * sqrt(nb)) END AS ccos
         |       FROM (SELECT m.vec_id, m.cell_id, ${cosSelect("m.mv", "c.centroid")}
         |             FROM m JOIN c2 c USING (cell_id))),
         |lab AS (SELECT cc.vec_id, cc.cell_id, cc.ccos,
         |          coalesce(comp0.keep_id, cc.vec_id) AS comp
         |        FROM cc LEFT JOIN comp0 USING (vec_id)),
         |rep AS (SELECT comp, vec_id AS rep_id FROM (SELECT comp, vec_id,
         |          row_number() OVER (PARTITION BY comp
         |            ORDER BY ccos ASC, vec_id ASC) AS rn FROM lab) WHERE rn = 1)
         |SELECT l.vec_id, l.cell_id, l.comp, round(l.ccos, 6) AS centroid_sim,
         |  (l.vec_id = rep.rep_id) AS is_kept
         |FROM lab l JOIN rep USING (comp) ORDER BY l.vec_id""".stripMargin,

    // Mirrors Dedup.incrementalSemanticDupes over the stored q258 index:
    // the portable k-means chain trained on the INDEXED 90% only, the
    // delta assigned to those cells by the same micro-unit argmin, the
    // q246 sign-plane hamming screen, exact fixed-fold cosines, and the
    // (max sim, min id) best-duplicate election per delta vector.
    "q258_incremental_semantic" -> {
      val thr = graft.operators.Dedup.hammingScreenThreshold(0.3)
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
         |  list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1000000.0)) AS mv
         |  FROM embeddings WHERE vec_id % 10 <> 0),
         |${cellChain("s", 8)},
         |ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
         |  list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1000000.0)) AS mv
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |${assignCte("da", "sc2", "ed")},
         |psg AS (SELECT b.b, i.i,
         |    CASE WHEN (CAST('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':' ||
         |           CAST(i.i AS VARCHAR) || '#2303'), 1, 8) AS BIGINT) & 1) = 1
         |      THEN 1.0 ELSE -1.0 END AS sg
         |  FROM (SELECT unnest(range(0, 64)) AS b) b,
         |       (SELECT unnest(range(0, 64)) AS i) i),
         |psgl AS (SELECT b, list(sg ORDER BY i) AS sgl FROM psg GROUP BY b),
         |ball AS (SELECT vec_id, ev FROM e UNION ALL SELECT vec_id, ev FROM ed),
         |pbit AS (SELECT ball.vec_id, s.b,
         |    ${fold("list_transform(range(1, 65), i -> ball.ev[i] * s.sgl[i])")} >= 0 AS bit
         |  FROM ball CROSS JOIN psgl s),
         |pb AS (SELECT vec_id, list(bit ORDER BY b) AS sb FROM pbit GROUP BY vec_id),
         |cand AS (SELECT d.vec_id AS did, ix.vec_id AS cid,
         |    ${cosSelect("d.ev", "ix.ev")}
         |  FROM da JOIN ed d ON d.vec_id = da.vec_id
         |  JOIN saf ON saf.cell_id = da.cell_id
         |  JOIN e ix ON ix.vec_id = saf.vec_id
         |  JOIN pb pa ON pa.vec_id = d.vec_id
         |  JOIN pb qb ON qb.vec_id = ix.vec_id
         |  WHERE d.vec_id <> ix.vec_id
         |    AND ${fold("list_transform(range(1, 65), j -> CASE WHEN pa.sb[j] <> qb.sb[j] THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)")}
         |      <= $thr),
         |hits AS (SELECT did, cid, cs FROM (
         |    SELECT did, cid,
         |      CASE WHEN na = 0 OR nb = 0 THEN 0.0
         |           ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
         |    FROM cand) WHERE cs >= 0.3),
         |best AS (SELECT did, cid, cs FROM (SELECT did, cid, cs,
         |      row_number() OVER (PARTITION BY did ORDER BY cs DESC, cid ASC) AS rn
         |    FROM hits) WHERE rn = 1)
         |SELECT da.vec_id, da.cell_id, best.cid AS dup_of,
         |  round(best.cs, 6) AS sim, best.cid IS NULL AS is_novel
         |FROM da LEFT JOIN best ON best.did = da.vec_id
         |ORDER BY da.vec_id""".stripMargin
    },

    // Mirrors Sampling.diverseSample: the portable trained cells (af)
    // + per-cell (md5-hash, id) rank <= 25.
    "q256_diverse_sample" ->
      s"""$ivfCtes,
         |rk AS (SELECT vec_id, cell_id, row_number() OVER (
         |    PARTITION BY cell_id
         |    ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '#7'), 1, 8) AS BIGINT),
         |      vec_id) AS rn
         |  FROM af)
         |SELECT vec_id, cell_id FROM rk WHERE rn <= 25
         |ORDER BY cell_id, vec_id""".stripMargin,

    // Mirrors Dedup.semanticRecallAudit: the exact all-pairs ground
    // truth over the vec_id % 4 audit subset (same fixed-fold cosine),
    // three full-corpus portable k-means trainings (cellChain at 4/8/16),
    // and the co-celled fraction per cell count.
    "q253_semdedup_recall" -> {
      def leg(p: String, k: Int): String =
        s"""SELECT $k AS n_cells,
           |  CAST(count(*) AS BIGINT) AS true_pairs,
           |  CAST(sum(CASE WHEN ca.cell_id = cb.cell_id THEN 1 ELSE 0 END)
           |    AS BIGINT) AS found_pairs
           |FROM tp JOIN ${p}af ca ON ca.vec_id = tp.id_a
           |        JOIN ${p}af cb ON cb.vec_id = tp.id_b""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
         |  list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1000000.0)) AS mv
         |  FROM embeddings),
         |${cellChain("k4", 4)},
         |${cellChain("k8", 8)},
         |${cellChain("k16", 16)},
         |smp AS (SELECT vec_id, ev FROM e WHERE vec_id % 4 = 0),
         |tp0 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |          ${cosSelect("a.ev", "b.ev")}
         |        FROM smp a JOIN smp b ON a.vec_id < b.vec_id),
         |tp AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
         |         CASE WHEN na = 0 OR nb = 0 THEN 0.0
         |              ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs FROM tp0)
         |       WHERE cs >= 0.3),
         |legs AS (${leg("k4", 4)} UNION ALL ${leg("k8", 8)}
         |         UNION ALL ${leg("k16", 16)}),
         |ak AS (SELECT greatest(8, CAST(ceil(count(*) / 4096.0) AS INTEGER)) AS k
         |       FROM embeddings)
         |SELECT CAST(n_cells AS INTEGER) AS n_cells, true_pairs, found_pairs,
         |  CAST(CASE WHEN true_pairs > 0 THEN
         |    found_pairs * 1000000 // true_pairs ELSE 0 END AS BIGINT)
         |    AS recall_ppm,
         |  n_cells = (SELECT k FROM ak) AS is_auto_k
         |FROM legs ORDER BY n_cells""".stripMargin
    },

    // Mirrors Knn.recallAtK(exact full-dim, exact 16-dim-truncated):
    // both brute-force top-5 sides use the same fixed-fold cosine the
    // Spark expression computes — the truncated side just folds 16 dims.
    "q124_matryoshka_recall" -> {
      def topk(name: String, d: Int, qv: String, nv: String): String =
        s"""${name}_sc AS (SELECT qid, nid,
           |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
           |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
           |  FROM (SELECT q.qid, n.vec_id AS nid, ${cosSelectD(qv, nv, d)}
           |        FROM q JOIN e n ON n.vec_id <> q.qid)),
           |$name AS (SELECT qid, nid FROM (SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk
           |  FROM ${name}_sc) WHERE rk <= 5)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |${topk("gt", 64, "q.qv", "n.v")},
         |${topk("apx", 16, "q.qv", "n.v")}
         |SELECT g.qid AS query_id,
         |  CAST(coalesce(h.n_hit, 0) * 1000000 // g.n_gt AS BIGINT) AS recall_ppm
         |FROM (SELECT qid, count(*) AS n_gt FROM gt GROUP BY qid) g
         |LEFT JOIN (SELECT x.qid, count(*) AS n_hit
         |           FROM gt x JOIN apx ON apx.qid = x.qid AND apx.nid = x.nid
         |           GROUP BY x.qid) h ON h.qid = g.qid
         |ORDER BY query_id""".stripMargin
    },

    // Mirrors Evaluate.clusterQuality step for step: 6dp-rounded exact
    // decimal centroid means (identical bits in both engines, the q21
    // recipe), left-to-right squared-distance folds, decimal per-cluster
    // means. greatest() and the s-guard are single double ops.
    "q135_cluster_quality" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         |cm AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
         |cc AS (SELECT label, pos,
         |         round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 6) AS m
         |       FROM cm GROUP BY label, pos),
         |c AS (SELECT label AS clbl, list(m ORDER BY pos) AS c FROM cc GROUP BY label),
         |d AS (SELECT e.vec_id, e.label, c.clbl,
         |        ${fold("list_transform(range(1, len(e.v) + 1), i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))")} AS dist2
         |      FROM e CROSS JOIN c),
         |p AS (SELECT vec_id, label,
         |        max(CASE WHEN clbl = label THEN dist2 END) AS a,
         |        min(CASE WHEN clbl <> label THEN dist2 END) AS b
         |      FROM d GROUP BY vec_id, label),
         |ps AS (SELECT label, a, b,
         |        CASE WHEN greatest(a, b) <= 0.0 THEN 0.0
         |             ELSE (b - a) / greatest(a, b) END AS s
         |      FROM p)
         |SELECT label, count(*) AS n,
         |  round(${dsumSql("a", 15)} / count(*), 6) AS mean_intra,
         |  round(${dsumSql("b", 15)} / count(*), 6) AS mean_nearest_other,
         |  round(${dsumSql("s", 15)} / count(*), 6) AS mean_silhouette
         |FROM ps GROUP BY label ORDER BY label""".stripMargin,

    // Mirrors Pca.projectTop term for term: micro-unit integer scatter
    // moments, c_ij = n·S_ij − S_i·S_j cast to double, 10 power-iteration
    // steps with left-associated folds, first-max-abs sign rule,
    // ppm-quantized component, pure-integer projection.
    "q150_pca_projection" -> {
      val dim = 8; val iters = 10
      def sname(i: Int, j: Int) =
        if (i <= j) s"s${i}_$j" else s"s${j}_$i"
      val qCols = (1 to dim).map(i =>
        s"CAST(floor(v[$i] * 1000000.0) AS BIGINT) AS q$i").mkString(", ")
      val momCols = ((1 to dim).map(i => s"sum(q$i) AS s$i") ++
        (for (i <- 1 to dim; j <- i to dim)
          yield s"sum(q$i * q$j) AS s${i}_$j")).mkString(",\n    ")
      val cCols = (for (i <- 1 to dim; j <- 1 to dim) yield
        s"CAST(n * ${sname(i, j)} - s$i * s$j AS DOUBLE) AS c${i}_$j")
        .mkString(",\n    ")
      val it0 = (1 to dim).map(i => s"1.0 AS v$i").mkString(", ")
      val iterCtes = (1 to iters).map { k =>
        val ws = (1 to dim).map { i =>
          (1 to dim).map(j => s"c.c${i}_$j * p.v$j").mkString(" + ") +
            s" AS w$i"
        }.mkString(",\n    ")
        val nrm = (1 to dim).map(i => s"w$i * w$i").mkString(" + ")
        val vs = (1 to dim).map(i => s"w$i / sqrt($nrm) AS v$i")
          .mkString(",\n    ")
        s"""w$k AS (SELECT $ws FROM c, it${k - 1} p),
           |it$k AS (SELECT $vs FROM w$k)""".stripMargin
      }.mkString(",\n")
      val mxExpr = (1 to dim).map(i => s"abs(v$i)").mkString("greatest(", ", ", ")")
      val sgnCase = (1 to dim).map(i =>
        s"WHEN abs(v$i) = m THEN (CASE WHEN v$i < 0 THEN -1.0 ELSE 1.0 END)")
        .mkString("CASE ", " ", " END")
      val vqCols = (1 to dim).map(i =>
        s"CAST(floor(v$i * sgn * 1000000.0 + 0.5) AS BIGINT) AS vq$i")
        .mkString(",\n    ")
      val proj = (1 to dim).map(i => s"q.q$i * vq.vq$i").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qt AS (SELECT vec_id, $qCols FROM e),
         |mom AS (SELECT count(*) AS n,
         |    $momCols
         |  FROM qt),
         |c AS (SELECT
         |    $cCols
         |  FROM mom),
         |it0 AS (SELECT $it0),
         |$iterCtes,
         |mx AS (SELECT *, $mxExpr AS m FROM it$iters),
         |sg AS (SELECT *, $sgnCase AS sgn FROM mx),
         |vq AS (SELECT
         |    $vqCols
         |  FROM sg)
         |SELECT q.vec_id, $proj AS proj_scaled,
         |  round(CAST($proj AS DOUBLE) / 1000000000000.0, 6) AS proj
         |FROM qt q CROSS JOIN vq
         |ORDER BY q.vec_id""".stripMargin
    },
  )
}
