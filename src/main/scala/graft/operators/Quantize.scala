package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 scalar quantization — the storage/serving
  * compression step between full-precision embeddings and the ANN index
  * (complements `Pq`: PQ compresses for distance computation, int8 SQ
  * compresses for storage and SIMD-friendly serving; reference vector
  * storage analog: `scylladb_setup/create_iot_schema.py:136-155`).
  *
  * Each vector is scaled by its own max-|x| so codes span the full int8
  * range: `c_i = floor(x_i·127/s + 0.5)` ∈ [−127, 127]. A 64-dim float
  * vector (256 B) becomes 64 bytes + one float scale — 4× smaller, and at
  * 100 TB the quantization pass is a narrow per-row map: no shuffle, no
  * state, perfectly parallel over any partitioning.
  *
  * Determinism: `floor(y + 0.5)` is half-up rounding written entirely in
  * IEEE correctly-rounded ops (add, floor) — unlike `round(double)`, whose
  * half-boundary behavior differs between engines, every engine computes
  * the identical code. Reconstruction error is a fixed-order left fold
  * (`0.0 + t1 + … + tn`) of explicit multiplications, so the DuckDB oracle
  * reproduces it bit-for-bit with `list_reduce`.
  */
object Quantize {

  /** Half-up rounding as IEEE-exact ops (portable across engines). */
  private def halfUp(y: Column): Column = floor(y + lit(0.5))

  /** int8 codes + per-vector scale. Zero vectors quantize to all-zero
    * codes with scale 0. Output: idCol, scale (double), codes
    * (array<int>), n_dims. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xd = col(vecCol).cast("array<double>")
    val scale = aggregate(xd, lit(0.0), (a, v) => greatest(a, abs(v)))
    df.select(
        col(idCol),
        scale.as("scale"),
        xd.as("_xd"))
      .select(
        col(idCol),
        col("scale"),
        when(col("scale") === 0.0,
            transform(col("_xd"), _ => lit(0)))
          .otherwise(transform(col("_xd"),
            v => halfUp(v * lit(127.0) / col("scale")).cast("int")))
          .as("codes"),
        size(col("_xd")).cast("bigint").as("n_dims"))
  }

  /** Quantization quality report per vector: code-range sanity, exact
    * integer code checksum, and the reconstruction MSE of the dequantized
    * vector (x̂_i = c_i·s/127) — every column scalar and engine-portable.
    * This is the audit a pipeline runs before swapping the serving tier
    * to compressed vectors. */
  def int8Stats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = int8(df, idCol, vecCol)
      .join(df.select(col(idCol), col(vecCol).cast("array<double>").as("_xd")),
        Seq(idCol))
    val errTerms = zip_with(col("_xd"), col("codes"),
      (x, c) => {
        val r = c.cast("double") * col("scale") / lit(127.0)
        (x - r) * (x - r)
      })
    q.select(
      col(idCol),
      col("n_dims"),
      col("scale"),
      aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
      array_min(col("codes")).cast("bigint").as("code_min"),
      array_max(col("codes")).cast("bigint").as("code_max"),
      (aggregate(errTerms, lit(0.0), (a, t) => a + t) / col("n_dims"))
        .as("mse"))
  }
}
