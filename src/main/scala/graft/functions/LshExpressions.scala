package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Deterministic ±1 (Rademacher) hyperplane entries derived from the same
  * md5 hash family as [[TextFunctions.hash32]]: sign(b, i, seed) is bit 0 of
  * `md5("b:i#seed")`'s first 8 hex digits. Rademacher projections are a
  * standard sign-LSH family (same collision-probability guarantee as
  * Gaussian planes, Achlioptas-style), with one operational advantage:
  * every product `±1·x_i` is EXACT in IEEE double, so an external engine
  * that sums the same terms in the same order reproduces signatures
  * bit-for-bit — the DuckDB oracle for the banded near-dup queries does
  * exactly that with a sequential `list_reduce` fold. */
object PortableSigns {
  def hash32(s: String, seed: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((s + "#" + seed).getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  def sign(bit: Int, i: Int, seed: Long): Double =
    if ((hash32(s"$bit:$i", seed) & 1L) == 1L) 1.0 else -1.0
}

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
  *
  * `portable = true` switches the hyperplanes from Gaussian to md5-derived
  * ±1 entries ([[PortableSigns]]) whose signatures any engine can reproduce
  * exactly — the mode the oracle-checked banded queries use.
  */
case class RandomHyperplaneSignature(
    child: Expression, nBits: Int, dim: Int, seed: Long, portable: Boolean = false)
    extends UnaryExpression with VectorArrayExpression {
  require(nBits >= 1 && nBits <= 64, "nBits must be in [1, 64]")

  override protected def arrayInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkArrayInputs(prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_signature"

  // Deterministic hyperplane matrix: nBits x dim entries (Gaussian, or
  // portable md5-derived ±1). Flattened row-major for the codegen loop.
  @transient lazy val planesFlat: Array[Double] = {
    val m =
      if (portable)
        Array.tabulate(nBits)(b => Array.tabulate(dim)(i => PortableSigns.sign(b, i, seed)))
      else {
        val rnd = new java.util.Random(seed)
        Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
      }
    m.flatten
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += get(child, x, i) * planesFlat(b * dim + i); i += 1 }
      if (dot >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  // whole-stage-codegen body: the plane matrix rides along as a reference
  // object; the loop is identical to nullSafeEval (same accumulation
  // order — signatures stay bit-identical between modes).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("rhpPlanes", planesFlat, "double[]")
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val b = ctx.freshName("b"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |long $sig = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.${accessor(child)}($i) * $planes[$b * $dim + $i];
         |  }
         |  if ($dot >= 0.0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
