package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.operators.Knn
import Q._

/** Vector-search operator suite over the `embeddings` table (SURVEY §2.5 W1/W2,
  * §2.3 J3, §2.4 A4, §2.9 Paths 2-3), plus the LLM-pipeline similarity-search
  * extensions. `label` plays the reference's `device_id` role: the unit of
  * same-entity comparison.
  *
  * Determinism: all cosine math is double with fixed rounding on output;
  * orderings always tie-break on ids (see [[Q]] scaladoc).
  */
object Vectors {

  /** Per-label mean embedding (full precision), positions exploded so the
    * aggregation is a plain shuffle-agg (scales to any corpus; dim is the
    * small axis). */
  private def centroidsFor(e: DataFrame): DataFrame = {
    e.select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, p -> p.m)").as("centroid"))
  }

  val queries: Map[String, QueryFn] = Map(
    // The SQL front door under the oracle gate: a plain spark.sql text
    // query over registered temp views, using the SparkSessionExtensions-
    // injected functions (cosine_sim, l2_norm) — proving a reference user
    // can drive this engine from SQL alone and still hash-match DuckDB.
    // The custom expressions' left-fold order is the portability contract
    // (q20/q192 pin it); the ORDER BY sorts the ROUNDED similarity with a
    // vec_id tie-break so the LIMIT cut is engine-stable.
    "q211_sql_surface" -> ((s, dir) => {
      graft.sources.Tables.registerAll(s, dir)
      s.sql("""
        SELECT v.vec_id, v.label,
          round(cosine_sim(v.embedding, q.embedding), 6) AS sim,
          round(l2_norm(v.embedding), 6) AS norm
        FROM embeddings v
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE v.vec_id <> 0
        ORDER BY sim DESC, v.vec_id LIMIT 10
      """)
    }),

    // Hard-negative mining for contrastive training: per anchor, the
    // top-5 most-similar DIFFERENT-label vectors (the closest wrong
    // answers). Same bounded top-k plan as q22; the label inequality is
    // a residual on the broadcast join.
    "q142_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.operators.Knn.hardNegatives(e, e.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Retrieval MRR: exact kNN top-10 per query scored against the
    // same-label relevance rule, folded to one exact-integer summary row
    // (even the evaluation metric is oracle-hash-checked).
    "q143_retrieval_mrr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val ranked = graft.operators.Knn.exact(e, q, k = 10)
        .join(broadcast(e.select(col("vec_id").as("neighbor_id"),
          col("label").as("_nl"))), Seq("neighbor_id"))
        .join(broadcast(e.select(col("vec_id").as("query_id"),
          col("label").as("_ql"))), Seq("query_id"))
      graft.operators.Evaluate.mrr(ranked,
        q.select(col("vec_id").as("query_id")), col("_nl") === col("_ql"))
    }),

    // nDCG@5 with same-label relevance — the rank-position-weighted
    // retrieval metric beside MRR (first hit) and recall (set overlap).
    // Position weights are precomputed ppm constants, so no libm runs in
    // either engine and the metric is hash-checked end to end.
    "q158_retrieval_ndcg" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val ranked = graft.operators.Knn.exact(e, q, k = 5)
        .join(broadcast(e.select(col("vec_id").as("neighbor_id"),
          col("label").as("_nl"))), Seq("neighbor_id"))
        .join(broadcast(e.select(col("vec_id").as("query_id"),
          col("label").as("_ql"))), Seq("query_id"))
      val lc = e.groupBy(col("label")).agg(count(lit(1)).as("_c"))
      val queries = q.select(col("vec_id").as("query_id"), col("label"))
        .join(broadcast(lc), Seq("label"))
        .select(col("query_id"), (col("_c") - 1).as("n_rel"))
      graft.operators.Evaluate.ndcgAtK(ranked, queries,
          col("_nl") === col("_ql"), k = 5)
        .orderBy(col("query_id"))
    }),

    // Cosine similarity of every vector against one query vector (the ANN
    // probe test_ann_query.py re-expressed as a broadcast scalar join).
    "q20_cosine_vs_query" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(cosine_sim(col("embedding"), col("qvec")), 6).as("cos_sim"))
        .orderBy(col("vec_id"))
    }),

    // Vector centroid per label (reference A4: np.mean(embeddings, axis=0),
    // build_profiles.py:90-105) via posexplode + shuffle agg. Output is the
    // exploded (label, pos, m) form: scalar cells only (the verifier's
    // row-sort cannot order array cells), and the mean goes through exact
    // decimal summation so both engines agree bit-for-bit.
    "q21_label_centroids" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      e.select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(dsum(col("x"), 15) / count(lit(1)), 6).as("m"))
        .select(col("label"), col("pos").cast("bigint").as("pos"), col("m"))
        .orderBy(col("label"), col("pos"))
    }),

    // k-center greedy coreset: 8 diversity prototypes spanning the
    // embedding space — each round one narrow scan (chosen vectors as
    // broadcast literals under least(), no join) + TakeOrdered(1). The
    // data-pruning pick-prototypes step beside q85's semantic dedup.
    "q236_kcenter_coreset" -> ((s, dir) =>
      Knn.kCenterCoreset(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8)
        .orderBy(col("step"))),

    // Exact k-NN top-k for a small query set against the whole corpus
    // (reference W1: ORDER BY embedding ANN OF ? LIMIT k) — broadcast
    // queries + bounded map-side top-k aggregation.
    "q22_knn_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Knn.exact(e, e.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Per-label self-kNN (reference W2: ANN with device/date prefix —
    // filter-before-search, co-partitioned self-join).
    "q23_knn_same_label" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Knn.exactWithin(e, "label", k = 3)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Embedding near-duplicate pairs above a cosine threshold — the 100 TB
    // banded path IS the declared query: sign-LSH band equi-join candidate
    // generation (portable md5-derived ±1 hyperplanes, reproduced bit-for-
    // bit by the oracle), exact cosine verify on candidates only. No
    // all-pairs stage anywhere (PlanSpec gate). The exact O(n²) variant
    // survives only as DedupSpec's small-scale cross-check, where band ≡
    // exact on a true near-dup corpus.
    "q24_neardup_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.operators.Dedup.embeddingNearDup(e, minCosine = 0.35,
          dim = 64, nBands = 16, bitsPerBand = 8, seed = 42L)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Path 2 (profile fingerprint): cosine(vector, own-label centroid) with
    // threshold verdict (anomaly_detection.py:133-140; detect_anomalies.py:28).
    "q25_path2_centroid_anomaly" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      e.join(broadcast(centroidsFor(e)), Seq("label"))
        .withColumn("cs", cosine_sim(col("embedding"), col("centroid")))
        .select(col("vec_id"), round(col("cs"), 6).as("sim"),
          (col("cs") < -0.05).as("is_anomalous"))
        .orderBy(col("vec_id"))
    }),

    // Path 3 (ANN novelty): count same-label neighbors with cosine >= tau;
    // anomalous iff matches < minMatches (path3_vector_search.py:98-175).
    "q26_path3_novelty" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val a = e.select(col("label").as("la"), col("vec_id").as("qid"), col("embedding").as("va"))
      val b = e.select(col("label").as("lb"), col("vec_id").as("nid"), col("embedding").as("vb"))
      val m = a.join(b, col("la") === col("lb") && col("qid") =!= col("nid"))
        .filter(cosine_sim(col("va"), col("vb")) >= 0.1)
        .groupBy(col("qid")).agg(count(lit(1)).as("nm"))
      t(s, dir, "embeddings").select(col("vec_id"))
        .join(m, col("vec_id") === col("qid"), "left")
        .select(col("vec_id"), coalesce(col("nm"), lit(0L)).as("n_matches"))
        .withColumn("is_anomalous", col("n_matches") < 5)
        .orderBy(col("vec_id"))
    }),

    // LSH-approximate kNN (the 100 TB ANN path): sign-random-projection
    // Hamming prefilter + exact rescoring. Portable ±1 hyperplanes make
    // the approximate result — prefilter included — exactly reproducible,
    // so even the LSH path is hash-checked against the oracle; recall
    // bounds live in KnnSpec.
    "q28_lsh_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Knn.approxLsh(e, e.filter(col("vec_id") < 10), k = 5,
          dim = 64, nBits = 16, hammingRadius = 6, portable = true)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // IVF-style approximate k-NN: labels as coarse cells, probe the 2
    // nearest cell centroids, exact top-k within probed cells only — the
    // deterministic skeleton of the 100 TB ANN path (cells would come from
    // k-means; the search dataflow is identical).
    "q27_ivf_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cent = centroidsFor(e)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("_qvec"))
      val probed = q.crossJoin(broadcast(cent))
        .withColumn("csim", cosine_sim(col("_qvec"), col("centroid")))
        .withColumn("crk", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("label").asc)))
        .filter(col("crk") <= 2)
        .select(col("query_id"), col("_qvec"), col("label"))
      val pairs = probed
        .join(e.select(col("label"), col("vec_id").as("neighbor_id"),
          col("embedding").as("_nvec")), Seq("label"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec")))
      Knn.reduceTopK(pairs, 5)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Product-quantization ADC search (the memory-bound 100 TB ANN path:
    // candidates are scored from m-byte codes + a broadcast distance table,
    // never touching the original vectors). Engine-exact: fixed-point
    // micro-unit quantization, integer-exact centroid sums, fixed-order
    // distance folds, argmin ties on code id — ADC distances are
    // bit-identical doubles, emitted unrounded. Recall/compression live in
    // PqSpec; the k-means codebook is the production variant.
    "q68_pq_adc" -> ((s, dir) => {
      import graft.operators.Pq
      val e = t(s, dir, "embeddings")
      val cb = Pq.labelCodebook(e, "label", "embedding", m = 8, dim = 64)
      val codes = Pq.encode(e, cb, "vec_id", "embedding", m = 8, dim = 64)
      Pq.adcSearch(cb, codes, e.filter(col("vec_id") < 10), k = 3, m = 8, dim = 64)
        .orderBy(col("query_id"), col("rk"))
    }),

    // int8 scalar quantization audit (the storage-compression step before
    // the serving tier): per-vector scale, exact code checksums, and the
    // reconstruction MSE of the dequantized vector. Half-up rounding is
    // written as floor(y + 0.5) — pure IEEE ops, so codes and the MSE fold
    // are bit-identical in any engine (no round(double) dialect drift).
    "q73_int8_quantize" -> ((s, dir) => {
      import graft.operators.Quantize
      Quantize.int8Stats(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("n_dims"), col("scale"),
          col("code_sum"), col("code_min"), col("code_max"), col("mse"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-norm health audit: per-label count, min/max and
    // decimal-exact mean of L2 norms — the "are these vectors normalized
    // / did a batch come in at the wrong scale" pre-flight check. Norms
    // come from the codegen'd l2_norm expression (6dp-rounded so both
    // engines see identical values); the mean is one double division of
    // an exact decimal sum.
    "q192_norm_audit" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      t(s, dir, "embeddings")
        .select(col("label"),
          round(l2_norm(col("embedding")), 6).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"),
          round(sum(col("nrm").cast(DecimalType(30, 6))).cast("double") /
            count(lit(1)), 6).as("mean_norm"))
        .orderBy(col("label"))
    }),

    // Embedding-space drift monitor: per-label centroid of the even-id
    // half vs the odd-id half, compared by cosine — the train-vs-serve
    // distribution shift test in embedding space (a label whose halves
    // disagree has moved). Per-half means are exact decimal sums; the
    // cross products of the 6dp-rounded means accumulate as exact
    // decimals too, so the one sqrt/divide readout is engine-identical.
    "q173_centroid_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      def half(p: Int) = e.filter(col("vec_id") % 2 === p)
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(dsum(col("x"), 15) / count(lit(1)), 6)
          .cast("decimal(18,6)").as(s"m$p"))
      half(0).join(half(1), Seq("label", "pos"))
        .groupBy(col("label"))
        .agg(
          sum(col("m0") * col("m1")).as("dot"),
          sum(col("m0") * col("m0")).as("n0"),
          sum(col("m1") * col("m1")).as("n1"))
        .select(col("label"),
          when(col("n0") > 0 && col("n1") > 0,
            round(col("dot").cast("double") /
              (sqrt(col("n0").cast("double")) * sqrt(col("n1").cast("double"))), 6))
            .as("drift_cos"))
        .orderBy(col("label"))
    }),

    // Leave-one-out kNN majority-vote classification over the embedding
    // table: top-5 cosine neighbors vote on each query's label (ties →
    // smaller label id) — the classic label-quality / separability probe;
    // the vote argmax is a bounded min(struct) aggregate, never a window.
    "q174_knn_vote" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 40 === 0)
      graft.operators.Knn.exact(e, q, k = 5)
        .join(broadcast(e.select(col("vec_id").as("neighbor_id"),
          col("label").cast("bigint").as("_nl"))), Seq("neighbor_id"))
        .groupBy(col("query_id"), col("_nl"))
        .agg(count(lit(1)).as("_votes"))
        .groupBy(col("query_id"))
        .agg(min(struct((-col("_votes")).as("nv"), col("_nl").as("l"))).as("_m"))
        .select(col("query_id"), col("_m.l").as("pred_label"),
          (-col("_m.nv")).as("votes"))
        .join(broadcast(e.select(col("vec_id").as("query_id"),
          col("label").cast("bigint").as("true_label"))), Seq("query_id"))
        .select(col("query_id"), col("true_label"), col("pred_label"),
          (col("pred_label") === col("true_label")).as("correct"),
          col("votes"))
        .orderBy(col("query_id"))
    }),
  )

  private val centroidCte =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |u AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
      |g AS (SELECT label, pos, avg(x) AS m FROM u GROUP BY label, pos),
      |c AS (SELECT label, list(m ORDER BY pos) AS centroid FROM g GROUP BY label)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Mirrors q236: the greedy unrolled — c_i picks the farthest point
    // (ties to lowest id), d_i folds its distance into the running min.
    "q236_kcenter_coreset" -> {
      val k = 8
      val sb = new StringBuilder
      sb ++= "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),\n"
      sb ++= "c1 AS (SELECT vec_id, v FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),\n"
      sb ++= "d1 AS (SELECT e.vec_id, e.v, 1 - list_cosine_similarity(e.v, c1.v) AS md " +
        "FROM e, c1 WHERE e.vec_id <> c1.vec_id)"
      for (i <- 2 to k) {
        sb ++= s",\nc$i AS (SELECT vec_id, v, md FROM d${i - 1} ORDER BY md DESC, vec_id LIMIT 1)"
        if (i < k)
          sb ++= s",\nd$i AS (SELECT d.vec_id, d.v, " +
            s"least(d.md, 1 - list_cosine_similarity(d.v, c.v)) AS md " +
            s"FROM d${i - 1} d, c$i c WHERE d.vec_id <> c.vec_id)"
      }
      sb ++= "\nSELECT CAST(1 AS BIGINT) AS step, vec_id, 0.0 AS dist FROM c1"
      for (i <- 2 to k)
        sb ++= s"\nUNION ALL SELECT CAST($i AS BIGINT), vec_id, round(md, 6) FROM c$i"
      sb ++= "\nORDER BY step"
      sb.toString
    },

    // Mirrors q211's SQL text: DuckDB's list_cosine_similarity agrees
    // with the codegen'd CosineSimilarity fold (q20 pins that), and the
    // norm is the explicit left list_reduce q192 pins.
    "q211_sql_surface" ->
      """SELECT v.vec_id, v.label,
        |  round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
        |                               CAST(q.embedding AS DOUBLE[])), 6) AS sim,
        |  round(sqrt(list_reduce(
        |    list_prepend(0.0, list_transform(CAST(v.embedding AS DOUBLE[]),
        |                                     x -> x * x)),
        |    (a, x) -> a + x)), 6) AS norm
        |FROM embeddings v
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE v.vec_id <> 0
        |ORDER BY sim DESC, v.vec_id LIMIT 10""".stripMargin,

    // Mirrors Knn.hardNegatives: per-anchor ranking restricted to rows
    // with a DIFFERENT label, ties broken by lower neighbor id.
    "q142_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS ql, v AS qv FROM e WHERE vec_id < 10),
        |s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, e.v) AS cs
        |      FROM q JOIN e ON e.label <> ql),
        |r AS (SELECT qid, nid, cs,
        |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM s)
        |SELECT qid AS query_id, rk, nid AS neighbor_id, round(cs, 6) AS sim
        |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // Mirrors Evaluate.mrr over the q22-shaped exact kNN list: first
    // same-label rank per query, reciprocal in exact integer ppm.
    "q143_retrieval_mrr" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS ql, v AS qv FROM e WHERE vec_id < 20),
        |s AS (SELECT qid, ql, e.vec_id AS nid, e.label AS nl,
        |             list_cosine_similarity(qv, e.v) AS cs
        |      FROM q JOIN e ON e.vec_id <> qid),
        |r AS (SELECT qid, ql, nid, nl, cs,
        |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM s),
        |f AS (SELECT qid, min(rk) AS first_rel FROM r
        |      WHERE rk <= 10 AND nl = ql GROUP BY qid)
        |SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(coalesce(CAST(sum(1000000 // first_rel) AS BIGINT), 0) // count(*) AS BIGINT) AS mrr_ppm
        |FROM q LEFT JOIN f USING (qid)""".stripMargin,

    // Mirrors Evaluate.ndcgAtK: the SAME Scala call generates the ppm
    // weight constants for operator literals and this SQL, so no log()
    // ever runs inside either engine.
    "q158_retrieval_ndcg" -> {
      val w = graft.operators.Evaluate.ndcgWeights(5)
      val cum = w.scanLeft(0L)(_ + _).tail
      val wCase = w.zipWithIndex
        .map { case (wi, i) => s"WHEN ${i + 1} THEN $wi" }.mkString(" ")
      val cumList = cum.mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         |q AS (SELECT vec_id AS qid, label AS ql, v AS qv FROM e WHERE vec_id < 20),
         |s AS (SELECT qid, ql, e.vec_id AS nid, e.label AS nl,
         |             list_cosine_similarity(qv, e.v) AS cs
         |      FROM q JOIN e ON e.vec_id <> qid),
         |r AS (SELECT qid, ql, nid, nl,
         |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM s),
         |d AS (SELECT qid, sum(CASE rk $wCase END) AS dcg FROM r
         |      WHERE rk <= 5 AND nl = ql GROUP BY qid),
         |lc AS (SELECT label, count(*) AS c FROM e GROUP BY label),
         |x AS (SELECT q.qid AS query_id,
         |        CAST(coalesce(d.dcg, 0) AS BIGINT) AS dcg_ppm,
         |        CAST(CASE WHEN lc.c - 1 > 0
         |          THEN list_extract($cumList, CAST(least(5, lc.c - 1) AS INTEGER))
         |          ELSE 0 END AS BIGINT) AS idcg_ppm
         |      FROM q JOIN lc ON lc.label = q.ql LEFT JOIN d ON d.qid = q.qid)
         |SELECT query_id, dcg_ppm, idcg_ppm,
         |  CASE WHEN idcg_ppm > 0 THEN dcg_ppm * 1000000 // idcg_ppm END AS ndcg_ppm
         |FROM x ORDER BY query_id""".stripMargin
    },

    "q20_cosine_vs_query" ->
      """SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                               CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |ORDER BY e.vec_id""".stripMargin,

    "q21_label_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |u AS (SELECT label, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x FROM e)
        |SELECT label, pos,
        |  round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*), 6) AS m
        |FROM u GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q22_knn_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, e.v) AS cs
        |      FROM q JOIN e ON e.vec_id <> qid),
        |r AS (SELECT qid, nid, cs,
        |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM s)
        |SELECT qid AS query_id, rk, nid AS neighbor_id, round(cs, 6) AS sim
        |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q23_knn_same_label" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |s AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |             list_cosine_similarity(a.v, b.v) AS cs
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT qid, nid, cs,
        |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM s)
        |SELECT qid AS query_id, rk, nid AS neighbor_id, round(cs, 6) AS sim
        |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,

    // Reproduces the banded scale path exactly: the ±1 hyperplane entries
    // are the same md5-derived signs the Spark expression bakes in
    // (PortableSigns), and the dot products fold left-to-right via
    // list_reduce — ±1 products are exact in IEEE double, so identical
    // sequential additions give bit-identical signatures in both engines.
    "q24_neardup_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |sg AS (SELECT b.b, j.j, i.i,
        |    CASE WHEN (CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' ||
        |           CAST(i.i AS VARCHAR) || '#' || CAST(42 + b.b AS VARCHAR)), 1, 8)
        |         AS BIGINT) & 1) = 1 THEN 1.0 ELSE -1.0 END AS sg
        |  FROM (SELECT unnest(range(0, 16)) AS b) b,
        |       (SELECT unnest(range(0, 8)) AS j) j,
        |       (SELECT unnest(range(0, 64)) AS i) i),
        |sgl AS (SELECT b, j, list(sg ORDER BY i) AS sgl FROM sg GROUP BY b, j),
        |dots AS (SELECT e.vec_id, s.b, s.j,
        |    list_reduce(list_transform(range(1, 65), i -> e.v[i] * s.sgl[i]),
        |                (acc, x) -> acc + x) AS dot
        |  FROM e CROSS JOIN sgl s),
        |sig AS (SELECT vec_id, b,
        |    CAST(sum(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS sgn
        |  FROM dots GROUP BY vec_id, b),
        |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM sig x JOIN sig y ON x.b = y.b AND x.sgn = y.sgn AND x.vec_id < y.vec_id),
        |r AS (SELECT id_a, id_b, list_cosine_similarity(a.v, b.v) AS cs
        |      FROM cand JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b)
        |SELECT id_a, id_b, round(cs, 6) AS sim
        |FROM r WHERE cs >= 0.35 ORDER BY id_a, id_b""".stripMargin,

    "q25_path2_centroid_anomaly" ->
      s"""$centroidCte
         |SELECT e.vec_id,
         |  round(list_cosine_similarity(e.v, c.centroid), 6) AS sim,
         |  list_cosine_similarity(e.v, c.centroid) < -0.05 AS is_anomalous
         |FROM e JOIN c USING (label)
         |ORDER BY e.vec_id""".stripMargin,

    "q26_path3_novelty" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |m AS (SELECT a.vec_id, count(*) AS nm
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
        |      WHERE list_cosine_similarity(a.v, b.v) >= 0.1
        |      GROUP BY a.vec_id)
        |SELECT e.vec_id, coalesce(m.nm, 0) AS n_matches,
        |       coalesce(m.nm, 0) < 5 AS is_anomalous
        |FROM e LEFT JOIN m USING (vec_id)
        |ORDER BY e.vec_id""".stripMargin,

    // Reproduces the portable sign-LSH prefilter exactly (same md5-derived
    // ±1 planes and sequential list_reduce dots as the q24 oracle), then
    // the Hamming-radius candidate filter and exact top-k rescore.
    "q28_lsh_knn" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |sg AS (SELECT j.j, i.i,
        |    CASE WHEN (CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' ||
        |           CAST(i.i AS VARCHAR) || '#42'), 1, 8) AS BIGINT) & 1) = 1
        |         THEN 1.0 ELSE -1.0 END AS sg
        |  FROM (SELECT unnest(range(0, 16)) AS j) j,
        |       (SELECT unnest(range(0, 64)) AS i) i),
        |sgl AS (SELECT j, list(sg ORDER BY i) AS sgl FROM sg GROUP BY j),
        |dots AS (SELECT e.vec_id, s.j,
        |    list_reduce(list_transform(range(1, 65), i -> e.v[i] * s.sgl[i]),
        |                (acc, x) -> acc + x) AS dot
        |  FROM e CROSS JOIN sgl s),
        |sig AS (SELECT vec_id,
        |    CAST(sum(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS sgn
        |  FROM dots GROUP BY vec_id),
        |es AS (SELECT e.vec_id, e.v, s.sgn FROM e JOIN sig s ON e.vec_id = s.vec_id),
        |cand AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(q.v, c.v) AS cs
        |  FROM es q JOIN es c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |   AND bit_count(CAST(xor(q.sgn, c.sgn) AS BIGINT)) <= 6),
        |r AS (SELECT qid, nid, cs, row_number() OVER (
        |        PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM cand)
        |SELECT qid AS query_id, rk, nid AS neighbor_id, round(cs, 6) AS sim
        |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q27_ivf_knn" ->
      s"""$centroidCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |pc AS (SELECT qid, qv, label,
         |       row_number() OVER (PARTITION BY qid
         |         ORDER BY list_cosine_similarity(qv, centroid) DESC, label ASC) AS crk
         |       FROM q CROSS JOIN c),
         |probe AS (SELECT qid, qv, label FROM pc WHERE crk <= 2),
         |s AS (SELECT p.qid, e.vec_id AS nid, list_cosine_similarity(p.qv, e.v) AS cs
         |      FROM probe p JOIN e ON e.label = p.label AND e.vec_id <> p.qid),
         |r AS (SELECT qid, nid, cs,
         |      row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid ASC) AS rk FROM s)
         |SELECT qid AS query_id, rk, nid AS neighbor_id, round(cs, 6) AS sim
         |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // Mirrors Pq.labelCodebook/encode/adcSearch: fixed-point micro-unit
    // quantization (exact integer sums; a decimal-sum mean is NOT portable
    // — the float→decimal cast rounds differently per engine), fixed-order
    // list_reduce distance folds (the portable-signature trick),
    // row_number argmin with code tie-break.
    "q68_pq_adc" ->
      """WITH e AS (SELECT vec_id, label,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CAST(floor(x * 1000000.0) AS DOUBLE)) v
        |       FROM embeddings),
        |u AS (SELECT label, vec_id, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x FROM e),
        |cb AS (SELECT label AS code, pos // 8 AS s, pos % 8 AS j,
        |         CAST(sum(CAST(x AS BIGINT)) AS DOUBLE) / count(*) AS c
        |       FROM u GROUP BY label, pos // 8, pos % 8),
        |cbl AS (SELECT s, code, list(c ORDER BY j) AS cent FROM cb GROUP BY s, code),
        |sv AS (SELECT vec_id, pos // 8 AS s, list(x ORDER BY pos % 8) AS sub
        |       FROM u GROUP BY vec_id, pos // 8),
        |d AS (SELECT vec_id, sv.s, code,
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          i -> (sub[i] - cent[i]) * (sub[i] - cent[i]))), (a, b) -> a + b) AS d2
        |      FROM sv JOIN cbl ON cbl.s = sv.s),
        |en AS (SELECT vec_id, s, code FROM (
        |         SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
        |         FROM d) WHERE rn = 1),
        |qd AS (SELECT vec_id AS qid, s, code, d2 FROM d WHERE vec_id < 10),
        |j2 AS (SELECT qd.qid, en.vec_id AS nid, qd.s, qd.d2
        |       FROM en JOIN qd ON qd.s = en.s AND qd.code = en.code
        |       WHERE qd.qid <> en.vec_id),
        |a AS (SELECT qid, nid,
        |        list_reduce(list_prepend(0.0, list(d2 ORDER BY s)), (x, y) -> x + y) AS adc
        |      FROM j2 GROUP BY qid, nid),
        |r AS (SELECT qid, nid, adc,
        |        row_number() OVER (PARTITION BY qid ORDER BY adc ASC, nid ASC) AS rk
        |      FROM a)
        |SELECT qid AS query_id, rk, nid AS neighbor_id, adc AS adc_dist
        |FROM r WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,

    // Mirrors Quantize.int8Stats: list_max scale, floor(y+0.5) codes,
    // list_reduce left-fold MSE seeded with 0.0 (same association order as
    // Spark's aggregate()).
    "q73_int8_quantize" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(CAST(x AS DOUBLE)))) AS sc FROM e),
        |c AS (SELECT vec_id, sc, v,
        |        CASE WHEN sc = 0 THEN list_transform(v, x -> 0)
        |             ELSE list_transform(v,
        |               x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc + 0.5) AS INTEGER))
        |        END AS codes
        |      FROM s),
        |t AS (SELECT vec_id, sc, codes,
        |        list_transform(range(1, len(v) + 1),
        |          i -> (CAST(v[i] AS DOUBLE) - CAST(codes[i] AS DOUBLE) * sc / 127.0)
        |             * (CAST(v[i] AS DOUBLE) - CAST(codes[i] AS DOUBLE) * sc / 127.0)) AS terms,
        |        CAST(len(v) AS BIGINT) AS n_dims
        |      FROM c)
        |SELECT vec_id, n_dims, sc AS scale,
        |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |  CAST(list_min(codes) AS BIGINT) AS code_min,
        |  CAST(list_max(codes) AS BIGINT) AS code_max,
        |  list_reduce(list_prepend(0.0, terms), (a, x) -> a + x) / n_dims AS mse
        |FROM t ORDER BY vec_id""".stripMargin,

    "q192_norm_audit" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |n AS (SELECT label, round(sqrt(list_reduce(
        |        list_prepend(0.0, list_transform(v, x -> x * x)),
        |        (a, x) -> a + x)), 6) AS nrm
        |      FROM e)
        |SELECT label, count(*) AS n, min(nrm) AS min_norm,
        |  max(nrm) AS max_norm,
        |  round(CAST(sum(CAST(nrm AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6)
        |    AS mean_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    "q173_centroid_drift" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |u AS (SELECT vec_id % 2 AS half, label,
        |        generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
        |g AS (SELECT half, label, pos,
        |        CAST(round(CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE)
        |          / count(*), 6) AS DECIMAL(18,6)) AS m
        |      FROM u GROUP BY half, label, pos),
        |j AS (SELECT a.label, a.m AS m0, b.m AS m1
        |      FROM g a JOIN g b ON a.label = b.label AND a.pos = b.pos
        |        AND a.half = 0 AND b.half = 1),
        |s AS (SELECT label, sum(m0 * m1) AS dot,
        |        sum(m0 * m0) AS n0, sum(m1 * m1) AS n1
        |      FROM j GROUP BY label)
        |SELECT label, CASE WHEN n0 > 0 AND n1 > 0 THEN
        |    round(CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(n0 AS DOUBLE)) * sqrt(CAST(n1 AS DOUBLE))), 6)
        |  END AS drift_cos
        |FROM s ORDER BY label""".stripMargin,

    "q174_knn_vote" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv, label AS tl FROM e WHERE vec_id % 40 = 0),
        |s AS (SELECT qid, e.vec_id AS nid, e.label AS nl,
        |        list_cosine_similarity(qv, e.v) AS cs
        |      FROM q JOIN e ON e.vec_id <> qid),
        |r AS (SELECT qid, nl, nid,
        |        row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nid) AS rk
        |      FROM s),
        |v AS (SELECT qid, CAST(nl AS BIGINT) AS nl, count(*) AS votes
        |      FROM r WHERE rk <= 5 GROUP BY 1, 2),
        |p AS (SELECT qid, nl, votes,
        |        row_number() OVER (PARTITION BY qid ORDER BY votes DESC, nl) AS pr
        |      FROM v)
        |SELECT q.qid AS query_id, CAST(q.tl AS BIGINT) AS true_label,
        |  p.nl AS pred_label, p.nl = CAST(q.tl AS BIGINT) AS correct,
        |  p.votes AS votes
        |FROM p JOIN q ON p.qid = q.qid WHERE pr = 1 ORDER BY query_id""".stripMargin,
  )
}
