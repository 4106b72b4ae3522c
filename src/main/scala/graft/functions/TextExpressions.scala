package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd forms of the tokenization/shingling primitives.
  *
  * The retired spellings were compositions of built-ins:
  *
  *   normText(c)  = regexp_replace(trim(lower(c)), "\\s+", " ")
  *   tokens(c)    = split(normText(c), " ")
  *   shingles(t)  = when(size(t) >= n, transform(sequence(0, size-n),
  *                    i => concat_ws(" ", element_at(t, i+1..i+n))))
  *                  .otherwise(array())
  *
  * Two independent costs made these the dominant CPU of the text family
  * (q161 hot frames: UTF8String.split + java.util.regex.Matcher +
  * RegExpReplace/StringSplit.nullSafeEval + ArrayTransform.nullSafeEval):
  *
  *  - the regex engine runs TWICE per evaluation (one full-string
  *    replace, one split), materializing two intermediate strings;
  *  - `transform` / the shingle lambda are higher-order functions —
  *    CodegenFallback — so every shingle evaluated INTERPRETED on shared
  *    megamorphic call sites whose JIT profiles degrade with session age
  *    (the exact q255 pathology, see [[FixedPointExpressions]]).
  *
  * Each replacement is ONE static-call codegen node doing a single byte
  * walk. Bit-parity contract: `\s` in a default Java regex is exactly
  * {0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20} — all single-byte in UTF-8 and
  * never part of a multi-byte sequence, so the byte walk reproduces the
  * regex split exactly (leading/trailing separator runs yield the same
  * empty edge tokens `split(..., -1)` keeps); lowercase and trim call
  * the same UTF8String methods the Lower/StringTrim expressions use.
  * TextExpressionsSpec pins equality against the retired spellings on
  * adversarial inputs (unicode case pairs, exotic whitespace, empties)
  * and on the sf0.001 corpus; the DuckDB oracle spellings are untouched.
  */
object TextOps {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared empty array<string> (read-only; unsafe writers copy). */
  def emptyArray(): ArrayData = EMPTY

  private def lowerTrimBytes(s: UTF8String): Array[Byte] =
    s.toLowerCase.trim().getBytes

  /** regexp_replace(trim(lower(s)), "\\s+", " ") in one byte walk. */
  def normText(s: UTF8String): UTF8String = {
    val b = lowerTrimBytes(s)
    val n = b.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    while (i < n) {
      if (isWs(b(i))) {
        out(o) = 0x20; o += 1
        while (i < n && isWs(b(i))) i += 1
      } else { out(o) = b(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** split(normText(s), " ") in one byte walk (no intermediate string). */
  def tokens(s: UTF8String): ArrayData = {
    val b = lowerTrimBytes(s)
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    var start = 0
    var i = 0
    while (i < n) {
      if (isWs(b(i))) {
        out += UTF8String.fromBytes(b, start, i - start)
        while (i < n && isWs(b(i))) i += 1
        start = i
      } else i += 1
    }
    out += UTF8String.fromBytes(b, start, n - start)
    new GenericArrayData(out.toArray)
  }

  /** Word n-gram shingles of a token array: tokens i..i+n-1 joined with
    * a single space; fewer than n tokens (or a NULL array) yields the
    * empty array. Null elements are skipped exactly as concat_ws does. */
  def shingles(tok: ArrayData, n: Int): ArrayData = {
    if (tok == null) return EMPTY
    val sz = tok.numElements()
    if (sz < n) return EMPTY
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (tok.isNullAt(i)) null else tok.getUTF8String(i)
      i += 1
    }
    val m = sz - n + 1
    val out = new Array[Any](m)
    val sep = UTF8String.fromString(" ")
    i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5-hash each word n-gram directly from token bytes (see
    * [[HashedShingles]]): digest = md5(tok_i ++ " " ++ ... ++ suffix),
    * value = first 4 bytes big-endian unsigned. */
  def shingleHashes(tok: ArrayData, n: Int, suffix: Array[Byte]): ArrayData = {
    val sz = tok.numElements()
    if (sz < n) return EMPTY
    val bytes = new Array[Array[Byte]](sz)
    var i = 0
    while (i < sz) {
      bytes(i) = if (tok.isNullAt(i)) null else tok.getUTF8String(i).getBytes
      i += 1
    }
    val md = digest.get()
    val m = sz - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val b = bytes(i + j)
        if (b != null) { // concat_ws skips nulls (and their separators)
          if (!first) md.update(0x20.toByte)
          md.update(b)
          first = false
        }
        j += 1
      }
      md.update(suffix)
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** min over the i-th minhash permutation of each element (see
    * [[MinhashMin]]); null on empty/all-null input, as array_min. */
  def minhashMin(hs: ArrayData, i: Int): java.lang.Long = {
    val p = 2147483647L
    val a = 2L * i + 1
    val b = 7919L * (i + 1)
    val sz = hs.numElements()
    var best = Long.MaxValue
    var seen = false
    var k = 0
    while (k < sz) {
      if (!hs.isNullAt(k)) {
        val v = (a * (hs.getLong(k) % p) + b) % p
        if (v < best) best = v
        seen = true
      }
      k += 1
    }
    if (seen) java.lang.Long.valueOf(best) else null
  }

  /** count of tokens present in the stopword set (see [[StopCount]]). */
  def stopCount(tok: ArrayData, stops: java.util.HashSet[UTF8String]): Long = {
    val sz = tok.numElements()
    var c = 0L
    var i = 0
    while (i < sz) {
      if (!tok.isNullAt(i) && stops.contains(tok.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Σ character lengths of the tokens; null if any token is null (the
    * retired fold's null algebra — see [[SumTokenLengths]]). */
  def sumTokenLengths(tok: ArrayData): java.lang.Long = {
    val sz = tok.numElements()
    var s = 0L
    var i = 0
    while (i < sz) {
      if (tok.isNullAt(i)) return null
      s += tok.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** transform(vec, x -> cast(floor(x * 1e6) as double)) — the portable
    * micro-unit projection, null elements passed through. */
  def microUnits(vec: ArrayData): ArrayData = {
    val sz = vec.numElements()
    val out = new Array[Any](sz)
    var i = 0
    while (i < sz) {
      out(i) = if (vec.isNullAt(i)) null
        else java.lang.Double.valueOf(math.floor(vec.getDouble(i) * 1000000.0))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `normText` as one codegen'd static call — see [[TextOps]]. */
case class NormTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_norm_text"
  override def nullSafeEval(input: Any): Any =
    TextOps.normText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.normText($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `tokens` as one codegen'd static call — see [[TextOps]]. */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override def nullSafeEval(input: Any): Any =
    TextOps.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.tokens($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word n-gram shingles as one codegen'd static call; NULL input folds to
  * the empty array (the retired `when(...).otherwise(array())` contract),
  * so the expression itself is never null. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextOps.emptyArray()
    else TextOps.shingles(v.asInstanceOf[ArrayData], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.functions.TextOps.emptyArray()
                      : graft.functions.TextOps.shingles(${c.value}, $n);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Micro-unit projection as one codegen'd static call — replaces the
  * interpreted `transform(vec, x -> floor(x*1e6))` HOF on the vector
  * family's hot path. Same floor/scale convention as the DuckDB oracles
  * (see [[GraftFunctions.micro_units]]). */
case class MicroUnits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_micro_units"
  override def nullSafeEval(input: Any): Any =
    TextOps.microUnits(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.microUnits($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused `transform(shingles(tok, n), s => md5_hash32(s, seed))`: hashes
  * each word n-gram by feeding token bytes + single-space separators +
  * the seed suffix straight into the digest — no shingle string, no
  * interpreted ArrayTransform. NULL input folds to the empty array (the
  * shingles contract). Null tokens are skipped exactly as concat_ws
  * does. Bit-identical to Md5Hash32 over the joined string because md5
  * is a pure function of the byte stream. */
case class HashedShingles(child: Expression, n: Int, seed: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override def nullable: Boolean = false
  @transient private lazy val suffix: Array[Byte] =
    ("#" + seed).getBytes(java.nio.charset.StandardCharsets.UTF_8)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextOps.emptyArray()
    else TextOps.shingleHashes(v.asInstanceOf[ArrayData], n, suffix)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val suffixRef = ctx.addReferenceObj("suffix", suffix, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.functions.TextOps.emptyArray()
                      : graft.functions.TextOps.shingleHashes(${c.value}, $n, $suffixRef);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused `array_min(transform(hs, h => minhashPerm(h, i)))`: the i-th
  * universal-hash permutation folded with its min in one scan — the
  * 8-signature projection was 16 interpreted HOF nodes per row. Empty or
  * all-null arrays yield NULL exactly as array_min does. */
case class MinhashMin(child: Expression, i: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_minhash_min"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextOps.minhashMin(input.asInstanceOf[ArrayData], i)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("mhm")
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          Object $tmp = graft.functions.TextOps.minhashMin(${c.value}, $i);
          if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = ((Long) $tmp).longValue(); }
        }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused `size(filter(tok, w => array_contains(stops, w)))` as one scan
  * (the stopword counter of the quality score). Null elements never
  * match, as array_contains(stops, null) is null. */
case class StopCount(child: Expression, stops: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_stop_count"
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stops.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def nullSafeEval(input: Any): Any =
    TextOps.stopCount(input.asInstanceOf[ArrayData], stopSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.stopCount($c, $setRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused `aggregate(tok, 0L, (acc, w) => acc + length(w))` as one scan
  * (the mean-token-length numerator of the quality score). A null
  * element nulls the whole sum, exactly as the retired fold did. */
case class SumTokenLengths(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sum_token_lengths"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextOps.sumTokenLengths(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("stl")
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          Object $tmp = graft.functions.TextOps.sumTokenLengths(${c.value});
          if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = ((Long) $tmp).longValue(); }
        }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
