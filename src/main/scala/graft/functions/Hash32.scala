package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-expression form of the portable 32-bit text hash: the first 4
  * md5 bytes of `s + "#" + seed`, big-endian unsigned, as bigint —
  * bit-identical to the composed
  * `conv(substring(md5(concat(s, '#seed')), 1, 8), 16, 10)` chain (the
  * DuckDB oracle keeps that spelling), but one codegen'd call instead of
  * four expression layers with hex-string intermediates. The seed suffix
  * is fed to the digest as bytes, so the concatenated string is never
  * materialized. */
case class Md5Hash32(child: Expression, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  @transient private lazy val suffix: Array[Byte] =
    ("#" + seed).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash(input.asInstanceOf[UTF8String], suffix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val suffixRef = ctx.addReferenceObj("suffix", suffix, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash32.hash($c, $suffixRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5Hash32 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 digest bytes of (s ++ suffix), big-endian unsigned. */
  def hash(s: UTF8String, suffix: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    md.update(s.getBytes)
    md.update(suffix)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
