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
case class Md5Hash32(child: Expression, seed: Int, slot: Int = 0)
    extends UnaryExpression {

  require(slot >= 0 && slot <= 3, "md5 digest has 4 independent 32-bit slots")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  @transient private lazy val suffix: Array[Byte] =
    ("#" + seed).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash(input.asInstanceOf[UTF8String], suffix, slot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val suffixRef = ctx.addReferenceObj("suffix", suffix, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash32.hash($c, $suffixRef, $slot)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All four independent 32-bit hashes of one md5 digest, as
  * array<bigint> — ONE digest evaluation per row serves a depth-4 hash
  * family (materialize the array in a column, then index it). Slot `i`
  * equals `Md5Hash32(child, seed, i)` bit-for-bit. */
case class Md5Hash128(child: Expression, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_hash128"

  @transient private lazy val suffix: Array[Byte] =
    ("#" + seed).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash128(input.asInstanceOf[UTF8String], suffix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val suffixRef = ctx.addReferenceObj("suffix", suffix, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash32.hash128($c, $suffixRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5Hash32 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Digest bytes 4·slot .. 4·slot+3 of md5(s ++ suffix), big-endian
    * unsigned — the 128-bit digest carries FOUR independent 32-bit
    * hashes, so multi-row sketches pay one md5, not one per row. */
  def hash(s: UTF8String, suffix: Array[Byte], slot: Int = 0): Long = {
    val md = digest.get()
    md.reset()
    md.update(s.getBytes)
    md.update(suffix)
    val d = md.digest()
    val o = 4 * slot
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  }

  /** All four 32-bit big-endian slots of one digest. */
  def hash128(s: UTF8String, suffix: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = digest.get()
    md.reset()
    md.update(s.getBytes)
    md.update(suffix)
    val d = md.digest()
    val out = new Array[Long](4)
    var i = 0
    while (i < 4) {
      val o = 4 * i
      out(i) = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
