package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import graft.internal.Bridge

/** Column-API facade over the custom Catalyst expressions, plus SQL
  * registration so `expr("cosine_sim(a,b)")` / `spark.sql` work too.
  */
object GraftFunctions {

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Fixed-point micro-unit projection: floor(x·1e6) per component,
    * carried as exactly-representable integer-valued doubles. THE
    * portability primitive behind every oracle-checkable trained
    * operator (PQ codebooks/codes, portable IVF cells): sums over
    * micro-units are exact integers (order-independent), and all
    * downstream folds are fixed-order IEEE ops any engine reproduces
    * bit-for-bit. One definition on purpose — Ivf and Pq must never
    * drift apart on the scale or rounding convention, and the DuckDB
    * oracles bake in the same `floor(x * 1000000.0)`. */
  def micro_units(vec: Column): Column =
    Bridge.column(MicroUnits(Bridge.expression(vec.cast("array<double>"))))

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def l2_norm(a: Column): Column = Bridge.column(L2Norm(Bridge.expression(a)))

  def l2_normalize(a: Column): Column = Bridge.column(L2Normalize(Bridge.expression(a)))

  def hamming_dist(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(
      Bridge.expression(a.cast("bigint")), Bridge.expression(b.cast("bigint"))))

  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())

  def freq_items(item: Column, cap: Int): Column =
    Bridge.column(FrequentItems(Bridge.expression(item), cap)
      .toAggregateExpression())

  def rhp_signature(vec: Column, nBits: Int, dim: Int, seed: Long,
      portable: Boolean = false): Column =
    Bridge.column(RandomHyperplaneSignature(Bridge.expression(vec), nBits, dim, seed, portable))

  def hash_featurize(metrics: Column, dim: Int): Column =
    Bridge.column(HashFeaturize(Bridge.expression(metrics), dim))

  /** vector_centroid over array<double> columns (cast floats first). */
  def vector_centroid(vec: Column): Column = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    org.apache.spark.sql.functions
      .udaf(VectorCentroid, ExpressionEncoder[Seq[Double]]())
      .apply(vec.cast("array<double>"))
  }

  /** Idempotent per-session SQL registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_dist", es => HammingDistance(es(0), es(1)), "scala_udf")
    // Mirrors the GraftExtensions injection exactly, INCLUDING the
    // optional third slot argument — the two registration paths must
    // never give the same SQL call different results.
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
    }
    reg.createOrReplaceTempFunction("md5_hash32", es =>
      Md5Hash32(es(0), intLit(es(1), "md5_hash32 seed"),
        if (es.length > 2) intLit(es(2), "md5_hash32 slot") else 0), "scala_udf")
    reg.createOrReplaceTempFunction("graft_log2fp", es => Log2Fp(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_exp2fp", es => Exp2Fp(es.head), "scala_udf")
  }
}
