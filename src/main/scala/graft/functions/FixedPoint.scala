package graft.functions

/** Fixed-point binary logarithm in PURE int64 arithmetic — the portable
  * replacement for libm `ln()`/`log2()` wherever a score must hash-match
  * an independent engine.
  *
  * `log2fp(x) = floor-ish(log2(x) · 2^16)` for `1 <= x < 2^31`, by the
  * classic shift-and-square algorithm: take the integer part from the
  * bit length, normalize the mantissa to [2^20, 2^21), then 16 rounds of
  * `m := (m·m) >> 20`, emitting one fraction bit whenever the square
  * crosses 2^21. Every step is an int64 multiply / integer-divide /
  * compare — identical in Spark, DuckDB, or anything with 64-bit
  * integers — so, unlike `ln()` (libm implementations differ in the last
  * ulp, which flips `floor`/`round` at bucket boundaries — the exact
  * portability failure the repo's integer-ppm discipline exists to
  * avoid), the value is bit-identical by construction. Max absolute
  * error < 2e-5 in log2 units (the spec gate; a 20k-point random sweep
  * of the exact algorithm reaches ~1.72e-5) — noise next to the corpus
  * statistics it weighs.
  *
  * Intermediates: mantissa < 2^21, packed accumulator m·2^16 + y < 2^37,
  * square < 2^42, (integer-part, 2^ip) pack ip·2^42 + 2^ip < 2^47 — all
  * comfortably inside int64.
  *
  * In DuckDB the 16 rounds run inside ONE `list_reduce` fold with the
  * (mantissa, bits) state packed into a single bigint — linear
  * expression size (a chained-withColumn unrolling would hit Catalyst's
  * projection collapse and duplicate the self-referencing square
  * 2^16-fold). On the SPARK side the fold was retired in round 12 for a
  * native codegen'd expression ([[Log2Fp]]/[[Exp2Fp]], same bits): see
  * [[log2FpSparkSql]] for the measured why.
  *
  * Used by the DSIR importance weights ([[graft.operators.Corpus]]):
  * `w(b) = log2fp(rate_target) − log2fp(rate_raw)` — the paper's
  * log-likelihood-ratio feature weight, engine-exact.
  */
object FixedPoint {

  /** Spark-SQL spelling: a call to the NATIVE codegen'd expression
    * ([[Log2Fp]], registered as `graft_log2fp` by GraftExtensions) —
    * same int64 algorithm, same bits. Caller guarantees
    * `1 <= x < 2^31`.
    *
    * Round 12: this used to emit the same `aggregate(...)` fold as the
    * DuckDB spelling, but Spark's ArrayAggregate is CodegenFallback —
    * the fold lambda evaluates INTERPRETED, and interpreted
    * Expression.eval dispatch is exactly the code shape whose JIT type
    * profiles a long-lived many-query JVM pollutes into megamorphic
    * ~3x slowdown (the round-11 q255 in-sweep regression: 1.7 s fresh
    * -> 3.9 s after 259 distinct queries, reproduced and profiled —
    * the hot frames were DivModLike.eval under ArrayAggregate.eval).
    * A native expression keeps the whole chain inside whole-stage
    * codegen: one static JVM call, immune to session age. */
  def log2FpSparkSql(x: String): String = s"graft_log2fp(CAST(($x) AS BIGINT))"

  /** The pre-round-12 fold spelling — kept for the parity gate in
    * FixedPointSpec (native ≡ legacy over the domain, in Spark). */
  private[graft] def log2FpLegacySparkSql(x: String): String =
    gen(x, "div", "sequence(1, 16)", spark = true)

  /** DuckDB spelling of the SAME arithmetic (`//` division, list_reduce
    * fold) — byte-for-byte the same integer operations. */
  def log2FpDuckSql(x: String): String = gen(x, "//", "range(1, 17)", spark = false)

  // ---- Wide domain: the FULL positive int64 range (1 <= x < 2^63) ----
  //
  // log2fp over 2^31..2^63-1 by shift-normalization:
  //   log2fp_wide(x) = s·2^16 + log2fp(x div 2^s),  s = max(0, bitlen(x) − 31)
  // so the shifted mantissa lands in [2^30, 2^31) and the narrow
  // algorithm applies. Truncating the low s bits changes the argument by
  // a relative < 2^-30, i.e. < 1.5e-9 log2 units — three orders below
  // the narrow quantization, and the SAME truncation runs in every
  // engine, so wide values stay bit-identical by construction. This is
  // what lifts the DSIR/KL/surprisal rate math past the old ppb ceiling:
  // rates with totals beyond 10^9 are computed as log differences of raw
  // counts (log2(a/b) = log2fp_wide(a) − log2fp_wide(b)) instead of a
  // scaled quotient, which is exact at ANY corpus size an int64 can
  // count ([[graft.operators.Corpus.dsirScores]] et al.).
  //
  // The caller MUST stage shift and mantissa as named columns first
  // (same inlining contract as the narrow form):
  //   .selectExpr(s"${wideShiftSparkSql("x")} AS x_s",
  //               s"${wideMantissaSparkSql("x")} AS x_m")
  //   .selectExpr(s"${wideFromStagedSparkSql("x_s", "x_m")} AS lg")

  /** Bits shifted out of `x` (0..32); `x` MUST be a short column ref. */
  def wideShiftSparkSql(x: String): String = s"(${widePack(x)} div 4398046511104)"
  def wideShiftDuckSql(x: String): String = s"(${widePack(x)} // 4398046511104)"

  /** `x div 2^shift`, guaranteed in [1, 2^31); `x` a short column ref. */
  def wideMantissaSparkSql(x: String): String =
    s"(($x) div (${widePack(x)} % 4398046511104))"
  def wideMantissaDuckSql(x: String): String =
    s"(($x) // (${widePack(x)} % 4398046511104))"

  /** The wide value from staged (shift, mantissa) columns. */
  def wideFromStagedSparkSql(s: String, m: String): String =
    s"(($s) * 65536 + ${log2FpSparkSql(m)})"
  def wideFromStagedDuckSql(s: String, m: String): String =
    s"(($s) * 65536 + ${log2FpDuckSql(m)})"

  // (shift, 2^shift) packed as shift·2^42 + 2^shift; shift ≤ 32 so
  // 2^shift ≤ 2^32 < 2^42. x ≥ 2^62 → shift 32 keeps the mantissa
  // below 2^31 for every positive int64.
  private def widePack(x: String): String =
    (62 to 31 by -1)
      .map(k => s"WHEN ($x) >= ${1L << k} THEN ${((k - 30).toLong << 42) + (1L << (k - 30))}")
      .mkString("(CASE ", " ", " ELSE 1 END)")

  /** The runtime behind [[Log2Fp]] — a TOTAL transcription of the SQL
    * spelling's arithmetic (the CASE bit-length pack, the m0 staging,
    * the 16-round packed fold), valid bit-for-bit on EVERY int64 input:
    * in-domain it equals [[log2FpRef]] (the spec oracle, which asserts
    * its domain), out-of-domain it reproduces whatever the retired SQL
    * fold computed (callers guarantee the domain by contract; the
    * substitution must not turn silent garbage into a throw). All
    * operations are Java long `/`/`%` — identical truncation and sign
    * semantics to non-ANSI Spark `div`/`%`. */
  def log2FpEval(x: Long): Long = {
    var pack = 1L
    if (x >= 2) {
      var k = 30
      while (x < (1L << k)) k -= 1
      pack = (k.toLong << 42) + (1L << k)
    }
    val ip = pack / 4398046511104L
    val p2 = pack % 4398046511104L
    var acc = ((x * 1048576L) / p2) * 65536L
    var i = 0
    while (i < 16) {
      val sq = (acc / 65536) * (acc / 65536) / 1048576
      acc = if (sq >= 2097152) (sq / 2) * 65536 + (acc % 65536) * 2 + 1
            else sq * 65536 + (acc % 65536) * 2
      i += 1
    }
    ip * 65536 + acc % 65536
  }

  /** The runtime behind [[Exp2Fp]] — total transcription of the SQL
    * exp2 spelling (Q28 constant-product chain + final shift), same
    * contract as [[log2FpEval]]. */
  def exp2FpEval(x: Long): Long = {
    val f = x % 65536
    var acc = 268435456L
    var i = 1
    while (i <= 16) {
      if ((f / (1L << (16 - i))) % 2 == 1) acc = acc * Exp2C(i - 1) / 268435456L
      i += 1
    }
    // shiftleft(CAST(1 AS BIGINT), CAST(x div 65536 AS INT)): Java <<
    // masks the (wrapped-int) amount to 6 bits, exactly like Spark
    (acc * (1L << (x / 65536).toInt)) / 4096
  }

  /** JVM reference of the exact narrow algorithm — the spec oracle. */
  def log2FpRef(x: Long): Long = {
    require(x >= 1 && x < (1L << 31), s"narrow domain: $x")
    val ip = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val p2 = 1L << ip
    var acc = (x * 1048576L / p2) * 65536L
    var i = 0
    while (i < 16) {
      val sq = (acc / 65536) * (acc / 65536) / 1048576
      acc = if (sq >= 2097152) (sq / 2) * 65536 + (acc % 65536) * 2 + 1
            else sq * 65536 + (acc % 65536) * 2
      i += 1
    }
    ip * 65536 + acc % 65536
  }

  /** JVM reference of the wide form — bit-identical to the SQL staging. */
  def log2FpRefWide(x: Long): Long = {
    require(x >= 1, s"positive domain: $x")
    val s = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(x) - 31)
    s * 65536L + log2FpRef(x >> s)
  }

  // ---- exp2: the inverse primitive, for exponentiated-gradient /
  // softmax-style weights that must hash-match across engines ----
  //
  // `exp2fp(x) = floor(2^(x / 2^16) · 2^16)`-ish for `0 <= x <= 32·2^16`,
  // by binary-fraction decomposition: 2^(f/2^16) = Π over set bits i of
  // f of 2^(2^-i), with the 16 per-bit constants PRE-ROUNDED to Q28
  // (hardcoded literals below — no libm anywhere, so the value is
  // bit-identical in any int64 engine by construction, same discipline
  // as log2fp). The Q28 accumulator keeps every product under 2^58;
  // the integer part is a final shift. Error: < 3e-7 relative from the
  // Q28 product chain (16 floor steps + constant rounding) plus one Q16
  // ulp of output quantization from the final floor — gated by the
  // spec's exhaustive fraction sweep. NEGATIVE arguments are excluded by
  // contract (Spark `div` truncates toward zero, DuckDB `//` floors —
  // they disagree below zero): softmax-style callers shift by the group
  // minimum first, which the normalization cancels anyway.
  //
  // Round-trip with log2fp: exp2fp(log2FpRef(x)) / 65536.0 ≈ x within
  // the combined 2e-5 log-side error — gated in FixedPointSpec.
  //
  // Cross-engine evidence beyond the q260 gate: the DuckDB spelling was
  // swept against exp2FpRef over 67,628 values — EVERY fraction at
  // integer part 0, the five boundary fractions at every integer part,
  // the domain ceiling, the 20-bit operator cap, and 2,000 random draws
  // — 0 mismatches (round 11; Spark spelling bit-gated by FixedPointSpec
  // on the same reference).

  /** Q28 constants: round(2^28 · 2^(2^-i)), i = 1..16. */
  private val Exp2C: IndexedSeq[Long] = IndexedSeq(
    379625062L, 319225354L, 292730940L, 280320109L, 274313427L,
    271358526L, 269893034L, 269163258L, 268799111L, 268617222L,
    268526324L, 268480886L, 268458170L, 268446813L, 268441134L,
    268438295L)

  /** Spark-SQL spelling: the NATIVE codegen'd [[Exp2Fp]]
    * (`graft_exp2fp`) — see [[log2FpSparkSql]] for why the fold
    * spelling was retired on the Spark side. Caller guarantees
    * `0 <= x <= 32·65536`. */
  def exp2FpSparkSql(x: String): String = s"graft_exp2fp(CAST(($x) AS BIGINT))"

  /** The pre-round-12 fold spelling — kept for the parity gate. */
  private[graft] def exp2FpLegacySparkSql(x: String): String =
    genExp2(x, "div", "sequence(1, 16)",
      ip => s"shiftleft(CAST(1 AS BIGINT), CAST($ip AS INT))", spark = true)

  /** DuckDB spelling of the SAME integer arithmetic. */
  def exp2FpDuckSql(x: String): String =
    genExp2(x, "//", "range(1, 17)",
      ip => s"(CAST(1 AS BIGINT) << CAST($ip AS INTEGER))", spark = false)

  /** JVM reference of the exact algorithm — the spec oracle. */
  def exp2FpRef(x: Long): Long = {
    require(x >= 0 && x <= 32L * 65536, s"exp2 domain: $x")
    val f = x % 65536
    val ip = x / 65536
    var acc = 1L << 28
    var i = 1
    while (i <= 16) {
      if ((f >> (16 - i)) % 2 == 1) acc = acc * Exp2C(i - 1) >> 28
      i += 1
    }
    (acc << ip) / 4096
  }

  private def genExp2(x: String, div: String, rangeExpr: String,
      pow2: String => String, spark: Boolean): String = {
    val f = s"(($x) % 65536)"
    val branches = (1 to 16).map { i =>
      s"WHEN i = $i AND ($f $div ${1L << (16 - i)}) % 2 = 1" +
        s" THEN (acc * ${Exp2C(i - 1)}) $div 268435456"
    }.mkString(" ")
    val step = s"CASE $branches ELSE acc END"
    val fold =
      if (spark)
        s"aggregate($rangeExpr, CAST(268435456 AS BIGINT), (acc, i) -> $step)"
      else
        s"list_reduce(list_prepend(CAST(268435456 AS BIGINT), " +
          s"list_transform($rangeExpr, i -> CAST(i AS BIGINT))), (acc, i) -> $step)"
    s"((($fold) * ${pow2(s"(($x) $div 65536)")}) $div 4096)"
  }

  private def gen(x: String, div: String, rangeExpr: String, spark: Boolean): String = {
    // (ip, 2^ip) packed as ip·2^42 + 2^ip, one bit-length CASE
    val pack = (30 to 1 by -1)
      .map(k => s"WHEN ($x) >= ${1L << k} THEN ${(k.toLong << 42) + (1L << k)}")
      .mkString("(CASE ", " ", " ELSE 1 END)")
    val ip = s"($pack $div 4398046511104)"
    val p2 = s"($pack % 4398046511104)"
    val m0 = s"((($x) * 1048576) $div $p2)"
    val step =
      s"""CASE WHEN ((acc $div 65536) * (acc $div 65536)) $div 1048576 >= 2097152
         | THEN ((((acc $div 65536) * (acc $div 65536)) $div 1048576) $div 2) * 65536 + (acc % 65536) * 2 + 1
         | ELSE (((acc $div 65536) * (acc $div 65536)) $div 1048576) * 65536 + (acc % 65536) * 2 END"""
        .stripMargin.replaceAll("\n", " ")
    val fold =
      if (spark)
        s"aggregate($rangeExpr, CAST($m0 AS BIGINT) * 65536, (acc, i) -> $step)"
      else
        s"list_reduce(list_prepend(CAST($m0 AS BIGINT) * 65536, " +
          s"list_transform($rangeExpr, i -> CAST(i AS BIGINT))), (acc, i) -> $step)"
    s"($ip * 65536 + ($fold) % 65536)"
  }
}
