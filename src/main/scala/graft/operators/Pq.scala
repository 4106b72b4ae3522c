package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) search — the
  * memory-bound scale path for vector search (complements `Ivf`'s
  * compute-bound cell pruning; reference ANN analog:
  * `scylladb_setup/create_iot_schema.py:136-155`).
  *
  * The vector space is split into `m` contiguous subspaces; each subvector
  * is replaced by the id of its nearest codebook centroid. A 64-dim float
  * vector (256 B) becomes `m` small ints (~`m` bytes) — at 100 TB the codes
  * table is the only thing the ADC scan reads, a ~30× byte reduction
  * enforced by layout, and the per-query work is `m` table lookups per
  * candidate instead of a full d-dim product. The query-side distance
  * table (|Q| × m × k doubles) is always broadcast-sized.
  *
  * Determinism: PQ works in FIXED-POINT micro-units — every component is
  * quantized to `floor(x·10⁶)` up front (exact and identical in any
  * engine), so centroid sums are exact integers in double carriers and the
  * only inexact op is the single centroid division, bit-identical given
  * identical operands. Distances are fixed-order folds (`0.0 + t1 + … +
  * tn`, multiplication not `pow`), argmin ties break on the code id — so
  * codes and ADC distances are bit-identical everywhere (the DuckDB oracle
  * reproduces them with `list_reduce`, the portable-LSH trick). A
  * decimal-sum mean was NOT portable: Spark and DuckDB round the
  * float→decimal(30,15) cast differently in the last digit. Micro-unit
  * resolution (1e-6) is far below embedding noise, so rankings are
  * unaffected. The k-means codebook ([[trainCodebook]]) is the production
  * variant; the label codebook ([[labelCodebook]]) is the engine-exact one
  * the declared query uses.
  */
object Pq {

  /** Fixed-order squared-L2 fold: 0.0 + Σ (a_i − b_i)² left to right.
    * Written as a multiplication, never pow (1-ulp libm drift). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, t) => acc + t)

  /** Fixed-point view of a vector: floor(x·10⁶) per component, carried as
    * exact integer-valued doubles (|x| ≲ 1 ⇒ |scaled| < 2²¹ ≪ 2⁵³). */
  private def scaled(vecCol: String): Column =
    graft.functions.GraftFunctions.micro_units(col(vecCol))

  /** (id, s, sub): the m width-`dim/m` fixed-point subvectors. */
  private def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, as: String): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val w = dim / m
    corpus
      .select(col(idCol).as(as), scaled(vecCol).as("_sv"))
      .select(col(as),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("_sv"), s * w + 1, lit(w))))
          .as(Seq("s", "sub")))
  }

  /** Engine-exact codebook: code = label, centroid = per-component mean of
    * that label's fixed-point subvectors — the sum is an exact integer, so
    * the single division is the only (bit-identical) float op. Output
    * (s, code, centroid array<double>). */
  def labelCodebook(corpus: DataFrame, labelCol: String, vecCol: String,
      m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    corpus
      .select(col(labelCol).cast("int").as("code"),
        posexplode(scaled(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("code"), expr(s"pos div ${dim / m}").cast("int").as("s"),
        pmod(col("pos"), lit(dim / m)).as("j"))
      .agg((sum(col("x").cast("long")).cast("double") / count(lit(1))).as("c"))
      .groupBy(col("s"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("c")))),
        e => e.getField("c")).as("centroid"))
  }

  /** Production codebook: per-subspace k-means (fit on a deterministic
    * hash sample, like [[Ivf.build]]). Same (s, code, centroid) shape. */
  def trainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, k: Int, seed: Long = 42L,
      maxFitRows: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    val sub = subvectors(corpus, idCol, vecCol, m, dim, "_id")
    val n = corpus.count()
    val fitBase =
      if (n <= maxFitRows) sub
      else {
        val pct = math.max(1, math.min(100, (maxFitRows * 100L / n).toInt))
        Sampling.hashSample(sub, "_id", pct, seed = seed.toInt)
      }
    val books = (0 until m).map { s =>
      val feats = fitBase.filter(col("s") === s)
        .withColumn("_features", array_to_vector(col("sub")))
      val model = new KMeans().setK(k).setSeed(seed + s)
        .setFeaturesCol("_features").setPredictionCol("_c").fit(feats)
      spark.createDataFrame(
        model.clusterCenters.zipWithIndex.toIndexedSeq
          .map { case (c, i) => (s, i, c.toArray.toIndexedSeq) })
        .toDF("s", "code", "centroid")
    }
    books.reduce(_ union _)
  }

  /** Encode every vector as its per-subspace nearest-centroid codes, in
    * subspace order. The codebook broadcasts; argmin is `min(struct(d2,
    * code))` — tie on distance breaks to the smaller code. Output
    * (idCol, codes array<int>). */
  def encode(corpus: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String, m: Int, dim: Int): DataFrame =
    subvectors(corpus, idCol, vecCol, m, dim, "_id")
      .join(broadcast(codebook), Seq("s"))
      .withColumn("_d2", l2sq(col("sub"), col("centroid")))
      .groupBy(col("_id"), col("s"))
      .agg(min(struct(col("_d2"), col("code"))).as("_best"))
      .groupBy(col("_id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("_best.code").as("code")))),
        e => e.getField("code")).as("codes"))
      .select(col("_id").as(idCol), col("codes"))

  /** ADC distances for an explicit (query_id, neighbor_id) candidate set
    * (the IVF-PQ composition hands in probed-cell members): the same
    * fixed-order table-lookup sum as [[adcSearch]], but only candidate
    * pairs are scored. The distance table carries query_id in its join
    * key and stays broadcast-sized (|Q| × m × k entries). Output
    * (query_id, neighbor_id, adc_dist), unranked. */
  /** Query-side ADC distance table over an arbitrary key column —
    * (key, s, code, _d2) for every (subspace, code) pair. The key can be
    * a struct (e.g. (query_id, cell_id) for residual PQ, where the same
    * query has a different residual in every probed cell). Always
    * broadcast-sized: |keys| × m × k rows. */
  private[operators] def distanceTable(df: DataFrame, keyCol: String,
      vecCol: String, codebook: DataFrame, m: Int, dim: Int): DataFrame =
    subvectors(df, keyCol, vecCol, m, dim, "_dtk")
      .join(broadcast(codebook), Seq("s"))
      .select(col("_dtk").as(keyCol), col("s"), col("code"),
        l2sq(col("sub"), col("centroid")).as("_d2"))

  /** The fixed-order ADC fold shared by every ADC consumer: sum the m
    * per-subspace table entries in subspace order (bit-identical in any
    * engine — see the object scaladoc's determinism contract). */
  private[operators] def adcFold: Column =
    aggregate(
      transform(array_sort(collect_list(struct(col("s"), col("_d2")))),
        e => e.getField("_d2")),
      lit(0.0), (acc, t) => acc + t)

  def adcCandidates(codebook: DataFrame, codes: DataFrame, queries: DataFrame,
      candidates: DataFrame, m: Int, dim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dtable = subvectors(queries, idCol, vecCol, m, dim, "query_id")
      .join(broadcast(codebook), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        l2sq(col("sub"), col("centroid")).as("_d2"))
    candidates
      .join(codes.select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("s", "code"))), Seq("neighbor_id"))
      .join(broadcast(dtable), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("s"), col("_d2")))),
          e => e.getField("_d2")),
        lit(0.0), (acc, t) => acc + t).as("adc_dist"))
  }

  /** ADC top-k: per query build the m×|codes| distance table against the
    * codebook (broadcast-sized by construction), then score candidates by
    * the fixed-order sum of their m table entries — never touching the
    * original vectors. Output (query_id, rk, neighbor_id, adc_dist),
    * smaller distance = nearer, ties on the neighbor id. */
  def adcSearch(codebook: DataFrame, codes: DataFrame, queries: DataFrame,
      k: Int, m: Int, dim: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", excludeSelf: Boolean = true): DataFrame = {
    val dtable = subvectors(queries, idCol, vecCol, m, dim, "query_id")
      .join(broadcast(codebook), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        l2sq(col("sub"), col("centroid")).as("_d2"))
    val cand = codes.select(col(idCol).as("neighbor_id"),
      posexplode(col("codes")).as(Seq("s", "code")))
    val scored = cand
      .join(broadcast(dtable), Seq("s", "code"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("s"), col("_d2")))),
          e => e.getField("_d2")),
        lit(0.0), (acc, t) => acc + t).as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("bigint").as("rk"),
        col("neighbor_id"), col("adc_dist"))
  }
}
