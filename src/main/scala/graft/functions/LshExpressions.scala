package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** rhp_signature(vec): sign-random-projection LSH signature for cosine
  * similarity — bit i of the result is `sign(dot(vec, h_i))` for a
  * deterministic pseudo-random hyperplane `h_i` derived from `seed`.
  *
  * Collision probability of bit i for two vectors at angle θ is 1 − θ/π,
  * so Hamming distance over signatures estimates angular distance. This is
  * the scale path replacing the reference's HNSW ANN index
  * (`/root/reference/scylladb_setup/create_iot_schema.py:136-155`): on a
  * cluster, bucketing or band-joining on signature prefixes prunes the
  * candidate set before the exact cosine rescoring pass.
  */
case class RandomHyperplaneSignature(child: Expression, nBits: Int, dim: Int, seed: Long)
    extends UnaryExpression with VectorArrayExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 64, "nBits must be in [1, 64]")

  override protected def arrayInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkArrayInputs(prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_signature"

  // Deterministic hyperplane matrix: nBits x dim Gaussian entries.
  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val h = planes(b)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += get(child, x, i) * h(i); i += 1 }
      if (dot >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
