package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd nearest-cell assignment for the portable IVF/k-means
  * stack — replaces the retired nested-HOF spelling in
  * [[graft.operators.Ivf.buildPortable]]'s assignment pass:
  *
  *   aggregate(
  *     transform(_cells, e -> struct(e.cid,
  *       aggregate(zip_with(_mv, e.centroid, (a,b) -> (a-b)*(a-b)),
  *         0.0, (s,x) -> s+x) AS d)),
  *     struct(-1 AS cid, Infinity AS d),
  *     (acc, e) -> IF(e.d < acc.d, e, acc)).cid
  *
  * ArrayAggregate/ArrayTransform/ZipWith are all CodegenFallback, so
  * every vector × cell × dim step of Lloyd's assignment evaluated
  * INTERPRETED (the q255 megamorphic-dispatch pathology — see
  * [[FixedPointExpressions]]) — and the k-means trainer re-runs the pass
  * every iteration. This is ONE static call inside whole-stage codegen.
  *
  * Bit-parity contract (IvfSpec + the q29/q80/q246 oracle rows gate it):
  *  - per cell, d = Σ_i (mv[i] − c[i])² accumulated LEFT-TO-RIGHT in
  *    IEEE doubles — the same fold order as the retired spelling;
  *  - cells compared in array order with strict `<` (ties keep the
  *    earlier = lower cell_id, as collectCells sorts);
  *  - a null element or whole-array null made every distance null in
  *    the retired spelling (null never wins `<`), so the result was the
  *    init cid −1; a dimension mismatch nulls only that cell's d
  *    (zip_with null-pads the shorter side). Reproduced exactly.
  */
case class NearestCell(child: Expression, cids: Array[Int],
    cents: Array[Array[Double]]) extends UnaryExpression {

  require(cids.length == cents.length, "one id per centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else NearestCell.assign(v.asInstanceOf[ArrayData], cids, cents)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? -1 :
          graft.functions.NearestCell.assign(${c.value}, $cidsRef, $centsRef);""",
      isNull = FalseLiteral)
  }

  // the centroid payload is identity-compared by TreeNode equality; that
  // is fine (each plan builds its own literal arrays, exactly as the
  // retired array(struct(lit...)) spelling did)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCell {
  /** See [[NearestCell]] for the exact parity contract. */
  def assign(mv: ArrayData, cids: Array[Int], cents: Array[Array[Double]]): Int = {
    val n = mv.numElements()
    var i = 0
    while (i < n) { // any null element nulled EVERY cell's distance
      if (mv.isNullAt(i)) return -1
      i += 1
    }
    val v = new Array[Double](n)
    i = 0
    while (i < n) { v(i) = mv.getDouble(i); i += 1 }
    var bestCid = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length == n) { // dim mismatch -> null d -> never wins
        var s = 0.0
        var j = 0
        while (j < n) { val d = v(j) - cent(j); s += d * d; j += 1 }
        if (s < bestD) { bestD = s; bestCid = cids(c) }
      }
      c += 1
    }
    bestCid
  }
}
