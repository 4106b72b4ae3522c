package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: makes every graft SQL function
  * available in any session without touching application code —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * after which `SELECT cosine_sim(a, b)` etc. work in plain SQL. (The same
  * registrations are available per-session via
  * [[graft.functions.GraftFunctions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // grouped-top-k rewrite: row_number-window + filter -> bounded aggregate
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKRewrite)

    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float/double arrays; 0.0 for zero vectors") {
      es => CosineSimilarity(es(0), es(1))
    }
    inject("dot_product", "dot_product(a, b) - inner product in double") {
      es => DotProduct(es(0), es(1))
    }
    inject("l2_norm", "l2_norm(a) - Euclidean norm") { es => L2Norm(es.head) }
    inject("l2_normalize",
      "l2_normalize(a) - unit vector; zero vectors pass through") { es => L2Normalize(es.head) }
    inject("hamming_dist",
      "hamming_dist(a, b) - differing bits between two bigints") {
      es => HammingDistance(es(0), es(1))
    }
    inject("hash_featurize",
      "hash_featurize(metrics_map, dim) - deterministic feature-hashing embedding") { es =>
      HashFeaturize(es(0), intLit(es(1), "hash_featurize dim"))
    }
    inject("md5_hash32",
      "md5_hash32(s, seed[, slot]) - portable 32-bit hash (slot-th big-endian " +
        "word of md5(s || '#' || seed), as bigint); the primitive behind " +
        "deterministic splits, samples, minhash and noise draws") { es =>
      Md5Hash32(es(0), intLit(es(1), "md5_hash32 seed"),
        if (es.length > 2) intLit(es(2), "md5_hash32 slot") else 0)
    }
    inject("graft_log2fp",
      "graft_log2fp(x) - fixed-point log2 (log2(x)*2^16, pure int64 " +
        "shift-and-square; bit-identical to the DuckDB list_reduce spelling)") {
      es => Log2Fp(es.head)
    }
    inject("graft_exp2fp",
      "graft_exp2fp(x) - fixed-point exp2 (2^(x/2^16)*2^16-ish, Q28 " +
        "constant-product chain; bit-identical to the DuckDB spelling)") {
      es => Exp2Fp(es.head)
    }
    inject("rhp_signature",
      "rhp_signature(vec, nbits, dim, seed[, portable]) - sign-random-projection " +
        "LSH signature; portable=true uses md5-derived ±1 planes any engine can reproduce") { es =>
      RandomHyperplaneSignature(es(0), intLit(es(1), "rhp nbits"),
        intLit(es(2), "rhp dim"), longLit(es(3), "rhp seed"),
        portable = es.length > 4 && boolLit(es(4), "rhp portable"))
    }
  }

  private def boolLit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Boolean =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be a boolean literal")
    }

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
    }

  private def longLit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
    }
}
