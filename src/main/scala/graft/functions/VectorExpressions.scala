package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions (whole-stage-codegen friendly).
  *
  * These are the hot inner loop of the k-NN join / similarity search
  * operators, re-expressing the reference's NumPy vector math
  * (`/root/reference/pipeline/anomaly_detection.py:37-44`,
  * `/root/reference/pipeline/find_similar_states.py:137-149`) as codegen'd
  * Spark expressions. They operate directly on `array<float>` or
  * `array<double>` without a cast-copy: the element accessor is chosen at
  * plan time, and all arithmetic is double (float→double widening is exact,
  * so results are deterministic across engines).
  */
private[functions] trait VectorArrayExpression { self: Expression =>

  protected def arrayInputs: Seq[Expression]

  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** double-valued element read that matches the physical array layout. */
  protected def get(e: Expression, arr: ArrayData, i: Int): Double =
    elementType(e) match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** codegen accessor spelling for the element type. */
  protected def accessor(e: Expression): String =
    elementType(e) match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }

  protected def checkArrayInputs(prettyName: String): TypeCheckResult = {
    val ok = arrayInputs.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, got " +
        arrayInputs.map(_.dataType.catalogString).mkString(", "))
  }
}

/** cosine_sim(a, b) = dot(a,b) / (||a||*||b||); 0.0 when either norm is 0.
  *
  * The zero-norm => 0.0 convention mirrors the reference
  * (`/root/reference/pipeline/anomaly_detection.py:41-43`): a failed/zeroed
  * embedding scores 0 similarity and therefore always reads as anomalous.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorArrayExpression {
  override protected def arrayInputs: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkArrayInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = get(left, x, i); val yi = get(right, y, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.${accessor(left)}($i);
         |  double $yi = (double) $b.${accessor(right)}($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_product(a, b): plain inner product in double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorArrayExpression {
  override protected def arrayInputs: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkArrayInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(left, x, i) * get(right, y, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.${accessor(left)}($i) * (double) $b.${accessor(right)}($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_norm(a): Euclidean norm in double. */
case class L2Norm(child: Expression)
    extends UnaryExpression with VectorArrayExpression {
  override protected def arrayInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkArrayInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    while (i < x.numElements()) { val v = get(child, x, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.${accessor(child)}($i); $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** l2_normalize(a): a / ||a|| as array<double>; zero vectors pass through
  * unchanged (so they keep cosine 0.0 against everything, reference
  * semantics — see [[CosineSimilarity]]). */
case class L2Normalize(child: Expression)
    extends UnaryExpression with VectorArrayExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override protected def arrayInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkArrayInputs(prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val v = get(child, x, i); s += v * v; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = get(child, x, i)
      out(i) = if (norm == 0.0) v else v / norm
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hamming_dist(a, b) between two long-encoded bit sets (e.g. simhashes). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_dist requires bigint arguments, got " +
        Seq(left, right).map(_.dataType.catalogString).mkString(", "))
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
