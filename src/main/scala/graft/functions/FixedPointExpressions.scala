package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd forms of the [[FixedPoint]] primitives.
  *
  * The DuckDB oracle keeps the explicit `list_reduce` SQL spelling (its
  * engine has no extension point and folds are cheap there); the Spark
  * side used to mirror it with `aggregate(...)` — but ArrayAggregate is
  * CodegenFallback, so the 16-round fold lambda (a CASE over `div`/`%`
  * chains) evaluated INTERPRETED inside otherwise-codegen'd stages.
  * Interpreted `Expression.eval` trees run on megamorphic virtual
  * dispatch, and a long-lived JVM that has planned hundreds of distinct
  * queries pollutes those shared call-site profiles until the JIT gives
  * up on inlining them: measured ~3x on the q255 surprisal readout after
  * 259 distinct queries (the round-11 in-sweep regression — fresh-JVM
  * 1.7 s vs late-sweep 3.9 s, flat load, stable code cache; hot frames
  * `DivModLike.eval` under `ArrayAggregate.eval`).
  *
  * A native expression is ONE static-call codegen node: the whole
  * surprisal chain stays inside whole-stage codegen, monomorphic and
  * immune to session age. The runtime ([[FixedPoint.log2FpEval]] /
  * [[FixedPoint.exp2FpEval]]) is the bit-exact total transcription of
  * the retired SQL spelling, parity-gated in FixedPointSpec against
  * both the legacy Spark fold and the JVM domain oracle.
  */
case class Log2Fp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_log2fp"

  override def nullSafeEval(input: Any): Any =
    FixedPoint.log2FpEval(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedPoint.log2FpEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `exp2fp` as one codegen'd static call — see [[Log2Fp]]. */
case class Exp2Fp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_exp2fp"

  override def nullSafeEval(input: Any): Any =
    FixedPoint.exp2FpEval(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedPoint.exp2FpEval($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
