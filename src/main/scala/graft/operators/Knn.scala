package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** k-nearest-neighbor joins by cosine similarity.
  *
  * Re-expresses the reference's `ORDER BY embedding ANN OF ? LIMIT k`
  * (`/root/reference/pipeline/path3_vector_search.py:119-127`,
  * `/root/reference/pipeline/find_similar_states.py:110-121`) as Spark
  * dataflow. Three strategies, all returning
  * `[query_id, rk, neighbor_id, sim]` (rk = 1-based, best first,
  * ties broken by lower neighbor id):
  *
  *  - [[Knn.exact]]: broadcast the (small) query set over the corpus and
  *    aggregate a bounded top-k per query with map-side partial
  *    aggregation. Scales with corpus size: no global sort, no window over
  *    the |Q|x|C| similarity matrix; shuffle is `partitions x |Q| x k` rows.
  *  - [[Knn.exactWithin]]: per-group self-kNN (the reference's
  *    filter-before-ANN "same device" search) — a shuffle-hash self-join
  *    co-partitioned on the group key, so each group's similarity block is
  *    computed partition-locally.
  *  - [[Knn.approxLsh]]: sign-random-projection prefilter (Hamming radius
  *    over signature bits) before exact rescoring — the scale path standing
  *    in for the reference's HNSW index at 100 TB.
  */
object Knn {

  /** Exact top-k neighbors of each query row against the corpus.
    *
    * @param corpus  (id bigint, vec array<float|double>) — arbitrarily large
    * @param queries (id bigint, vec array<float|double>) — broadcastable
    */
  /** Recall@k of an ANN result against ground truth — the tuning metric
    * for every approximate path (IVF nprobe, PQ rerank, LSH radius).
    * Both frames carry (query_id, neighbor_id) rows; recall is the
    * matched fraction of each query's ground-truth set in integer ppm
    * (portable — q103 hash-checks the recall of the trained stored-IVF
    * probe itself). Queries the ANN missed entirely still appear, at 0. */
  def recallAtK(groundTruth: DataFrame, approx: DataFrame): DataFrame = {
    val gt = groundTruth.select(col("query_id"), col("neighbor_id"))
    val hit = gt.join(approx.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id"), "left_semi")
    gt.groupBy(col("query_id")).agg(count(lit(1)).as("n_gt"))
      .join(hit.groupBy(col("query_id")).agg(count(lit(1)).as("n_hit")),
        Seq("query_id"), "left_outer")
      .select(col("query_id"),
        expr("coalesce(n_hit, 0) * 1000000 div n_gt").as("recall_ppm"))
  }

  def exact(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nvec"))
    val pairs = c.join(broadcast(q),
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    reduceTopK(pairs.withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec"))), k)
  }

  /** Hard-negative mining for contrastive training: for each query (an
    * anchor with a label), the top-k most-similar corpus rows with a
    * DIFFERENT label — the "closest wrong answers" that make the
    * strongest negatives. Same bounded top-k shape as [[exact]] (broadcast
    * queries, map-side partial top-k, shuffle = partitions × |Q| × k);
    * the label inequality rides the broadcast join as a residual, so the
    * corpus is scanned once whatever the label distribution. Complements
    * the hash-bucketed random negatives of `Sampling.negativePairs`
    * (q134): random negatives are cheap but mostly easy; these cost one
    * kNN pass and are all hard. */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(labelCol).as("_ql"),
      col(vecCol).as("_qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("_nl"),
      col(vecCol).as("_nvec"))
    val pairs = c.join(broadcast(q), col("_ql") =!= col("_nl"))
    reduceTopK(pairs.withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec"))), k)
  }

  /** Per-group self-kNN: neighbors restricted to rows sharing `groupCol`.
    * Pre-filtering before the similarity search (rather than the
    * reference's global-ANN-then-filter, whose k can starve after
    * filtering) — see SURVEY.md §3.3.
    *
    * Skew guard: the co-partitioned self-join gives one hot group an
    * O(n_g²) task. Set `saltGroupsAbove` to a group-size threshold and
    * groups above it run salted ([[Skew.saltedSelfJoin]]): the query side
    * splits into `salts` deterministic sub-chunks, each joined against the
    * full group — per-task work n_g²/salts, results exactly unchanged
    * (KnnSpec). The default (MaxValue) keeps the plain single-join plan. */
  def exactWithin(
      corpus: DataFrame, groupCol: String, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      saltGroupsAbove: Int = Int.MaxValue, salts: Int = 8): DataFrame = {
    val a = corpus.select(col(groupCol).as("_g"), col(idCol).as("query_id"),
      col(vecCol).as("_qvec"))
    val b = corpus.select(col(groupCol).as("_g"), col(idCol).as("neighbor_id"),
      col(vecCol).as("_nvec"))
    val joined =
      if (saltGroupsAbove == Int.MaxValue) a.join(b, Seq("_g"))
      else Skew.saltedSelfJoin(a, b, "_g", col("query_id"), saltGroupsAbove, salts)
    val pairs = joined.filter(col("query_id") =!= col("neighbor_id"))
    reduceTopK(pairs.withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec"))), k)
  }

  /** Approximate top-k: candidates must be within `hammingRadius` bits of
    * the query's `nBits`-bit sign-random-projection signature; candidates
    * are then exactly rescored. Recall improves with radius; cost drops
    * with it. `portable = true` uses the md5-derived ±1 hyperplanes
    * ([[graft.functions.PortableSigns]]) so the whole approximate result —
    * prefilter included — is reproduced bit-for-bit by the DuckDB oracle
    * (q28). */
  def approxLsh(
      corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nBits: Int = 16, hammingRadius: Int = 6, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true, portable: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"),
      rhp_signature(col(vecCol), nBits, dim, seed, portable).as("_qsig"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_nvec"),
      rhp_signature(col(vecCol), nBits, dim, seed, portable).as("_nsig"))
    val pairs = c.join(broadcast(q),
      (if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)) &&
        hamming_dist(col("_qsig"), col("_nsig")) <= hammingRadius)
    reduceTopK(pairs.withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec"))), k)
  }

  /** Shared reduction: bounded top-k per query via [[graft.functions.TopKByScore]].
    * `pairs` must carry `query_id`, `neighbor_id`, `_sim`. */
  def reduceTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .groupBy(col("query_id"))
      .agg(top_k_by_score(col("_sim"), col("neighbor_id").cast("bigint"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_r", "_p")))
      .select(
        col("query_id"),
        (col("_r") + 1).as("rk"),
        col("_p.id").as("neighbor_id"),
        col("_p.score").as("sim"))

  /** k-center greedy coreset — diversity selection over an embedding
    * column: start from the lowest id, then `k−1` times pick the point
    * FARTHEST (cosine distance, ties to the lowest id) from everything
    * chosen so far. The classic 2-approximation to the k-center cover,
    * and the diversity-sampling step of data-pruning pipelines (pick
    * prototypes that span the space, not a hash sample that mirrors its
    * density).
    *
    * Scale shape: a RUNNING-MIN frame — the candidate set rides forward
    * as `(id, v, md)` where `md` is the min cosine-distance to every
    * center picked so far, so round r costs exactly ONE codegen'd cosine
    * per row (against only the newest center, `least`-folded into the
    * carried `md`) instead of r−1 of them; total work is O(k·n) cosines,
    * flat per round, with a constant-depth expression tree (no codegen
    * fallback at large k). Each round's frame is `localCheckpoint`ed so
    * the lineage stays one cosine deep regardless of k (the q38/BPE
    * discipline), and the argmax is a TakeOrdered(1). The k driver-side
    * 1-row pulls are bounded by construction (the [[Ivf]] discipline).
    *
    * Numerically identical to the naive form: min of incrementally
    * `least`-folded doubles == min over all pairwise distances, each
    * computed by the same codegen'd expression — KnnSpec asserts pick
    * parity against an in-spec naive recompute.
    *
    * Input vectors must be `array<float>`. Returns (step, vec_id, dist)
    * with `dist` the min-distance to the prior picks, rounded to 6 dp
    * (step 1 → 0.0). If k exceeds the number of input vectors the loop
    * stops early and returns the picks made (n rows); an empty input
    * returns an empty frame. */
  def kCenterCoreset(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"kCenterCoreset needs k >= 1, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._
    val e = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var frame: DataFrame = null // surviving candidates with running min-dist
    try {
      val first = e.orderBy(col("id")).limit(1).take(1)
      if (first.isEmpty) Seq.empty[(Long, Long, Double)].toDF("step", "vec_id", "dist")
      else {
        var centerId = first(0).getLong(0)
        var centerVec = first(0).getSeq[Float](1)
        var out = Vector((1L, centerId, 0.0))
        var step = 2
        var exhausted = false
        while (step <= k && !exhausted) {
          val dNew = lit(1.0) - cosine_sim(col("v"),
            array(centerVec.map(x => lit(x)): _*))
          val rolled =
            (if (frame == null) e.select(col("id"), col("v"), dNew.as("md"))
             else frame.select(col("id"), col("v"),
               least(col("md"), dNew).as("md")))
              .filter(col("id") =!= centerId)
          val prev = frame
          // eager localCheckpoint: materializes the rolled min-frame and
          // truncates lineage; blocks are reclaimed by the context
          // cleaner as each round's frame goes out of scope.
          frame = rolled.localCheckpoint(true)
          if (prev != null) prev.unpersist(blocking = false)
          val picked = frame.orderBy(col("md").desc, col("id")).limit(1).take(1)
          if (picked.isEmpty) exhausted = true // k > n: return picks so far
          else {
            centerId = picked(0).getLong(0)
            centerVec = picked(0).getSeq[Float](1)
            // exactly Spark's round(col, 6): shortest-repr decimal, HALF_UP
            out :+= ((step.toLong, centerId,
              java.math.BigDecimal.valueOf(picked(0).getDouble(2))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
            step += 1
          }
        }
        out.toDF("step", "vec_id", "dist")
      }
    } finally {
      e.unpersist(blocking = false)
      if (frame != null) frame.unpersist(blocking = false)
    }
  }
}
