package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Top-principal-component extraction over an embedding column — the
  * dimensionality-reduction / whitening / dominant-direction primitive a
  * training-data pipeline runs before outlier pruning (vectors extreme
  * along the first PC are cross-modal junk: empty strings, boilerplate,
  * encoding failures) and ABBA-style embedding debiasing.
  *
  * Spark-first shape: ONE partial-aggregate pass computes every scatter
  * moment (dim + dim·(dim+1)/2 integer sums — a single row out of the
  * shuffle regardless of corpus size, same discipline as
  * [[Trend.corrPairs]]); the power iteration then runs on the
  * driver-sized dim×dim matrix (like [[Ivf.buildPortable]]'s centroid
  * collect, constant-size by construction), and the resulting component
  * is broadcast back as literals into a zero-shuffle projection map.
  *
  * Portability: vectors are micro-projected (floor(x·1e6) — exact
  * integer doubles), so the scatter moments are exact integers; the
  * eigenvector arithmetic is IEEE doubles with a fixed evaluation order
  * mirrored term-for-term by the DuckDB oracle (left-associated
  * matrix·vector folds, one sqrt per step, first-max-abs sign rule); the
  * component is then re-quantized to ppm ints so the per-vector
  * projection Σ qᵢ·vqᵢ is pure integer arithmetic — the declared query's
  * output hash cannot drift.
  */
object Pca {

  /** Micro-unit dimension extract: floor(x_i · 1e6) as BIGINT. */
  private def q(vecCol: Column, i: Int): Column =
    floor(element_at(vecCol, i).cast("double") * 1000000.0).cast("bigint")

  /** Scatter moments of the first `dim` micro-unit dims: one aggregated
    * row `(n, s_i .., s_i_j ..)` for i ≤ j — exact integers in
    * decimal(38,0). */
  private[operators] def scatterMoments(emb: DataFrame, dim: Int,
      vecCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val qs = (1 to dim).map(i => q(col(vecCol), i).cast(dec).as(s"q$i"))
    val aggs =
      (1 to dim).map(i => sum(col(s"q$i")).as(s"s$i")) ++
      (for (i <- 1 to dim; j <- i to dim)
        yield sum(col(s"q$i") * col(s"q$j")).as(s"s${i}_$j"))
    emb.select(qs: _*).agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Top eigenvector of the (n²-scaled) covariance of the first `dim`
    * micro-unit dims after `iters` power-iteration steps from the
    * all-ones start, sign-fixed so the first largest-|v_i| component is
    * positive. Returns (component, ppm-quantized component, n). */
  def topComponent(emb: DataFrame, dim: Int, iters: Int,
      vecCol: String = "embedding"): (Array[Double], Array[Long], Long) = {
    val row = scatterMoments(emb, dim, vecCol).collect()(0)
    val n = row.getLong(0)
    require(n > 0, "empty corpus")
    val s = (1 to dim).map(i =>
      BigDecimal(row.getDecimal(row.fieldIndex(s"s$i")))).toArray
    val s2 = Array.tabulate(dim, dim) { (i0, j0) =>
      val (i, j) = (math.min(i0, j0) + 1, math.max(i0, j0) + 1)
      BigDecimal(row.getDecimal(row.fieldIndex(s"s${i}_$j")))
    }
    // c_ij = n·S_ij − S_i·S_j (= n² × covariance): exact integers, then
    // one correctly-rounded cast each to double — the same value DuckDB's
    // HUGEINT→DOUBLE cast produces.
    val c = Array.tabulate(dim, dim) { (i, j) =>
      (BigDecimal(n) * s2(i)(j) - s(i) * s(j)).toDouble
    }
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      // left-associated folds — term order mirrored by the oracle SQL
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((a, j) => a + c(i)(j) * v(j)))
      val nrm = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
      v = w.map(_ / nrm)
    }
    val mx = v.map(math.abs).max
    val i0 = v.indexWhere(x => math.abs(x) == mx)
    if (v(i0) < 0.0) v = v.map(x => x * -1.0)
    val vq = v.map(x => math.floor(x * 1000000.0 + 0.5).toLong)
    (v, vq, n)
  }

  /** Per-vector projection onto the top principal component of the first
    * `dim` dims: `proj_scaled = Σᵢ floor(xᵢ·1e6) · vqᵢ` (exact integer;
    * vq is the ppm-quantized component) and its double readout
    * `proj = proj_scaled / 1e12` rounded to 6dp. The projection pass is
    * a zero-shuffle map — the component rides as literals. */
  def projectTop(emb: DataFrame, dim: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (_, vq, _) = topComponent(emb, dim, iters, vecCol)
    val p = (1 to dim).map(i => q(col(vecCol), i) * lit(vq(i - 1)))
      .reduceLeft(_ + _)
    emb.select(col(idCol), p.as("proj_scaled"))
      .withColumn("proj",
        round(col("proj_scaled").cast("double") / 1000000000000.0, 6))
  }
}
