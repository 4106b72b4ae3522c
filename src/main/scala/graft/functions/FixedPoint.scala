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
  * error ~1.5e-5 in log2 units (validated against `math.log2` over the
  * domain) — noise next to the corpus statistics it weighs.
  *
  * Intermediates: mantissa < 2^21, packed accumulator m·2^16 + y < 2^37,
  * square < 2^42, (integer-part, 2^ip) pack ip·2^42 + 2^ip < 2^47 — all
  * comfortably inside int64.
  *
  * The 16 rounds run inside ONE higher-order fold (`aggregate` in Spark,
  * `list_reduce` in DuckDB) with the (mantissa, bits) state packed into
  * a single bigint — linear expression size (a chained-withColumn
  * unrolling would hit Catalyst's projection collapse and duplicate the
  * self-referencing square 2^16-fold).
  *
  * Used by the DSIR importance weights ([[graft.operators.Corpus]]):
  * `w(b) = log2fp(rate_target) − log2fp(rate_raw)` — the paper's
  * log-likelihood-ratio feature weight, engine-exact.
  */
object FixedPoint {

  /** Spark-SQL spelling. `x` MUST be a short column reference (it is
    * inlined ~60×); caller guarantees `1 <= x < 2^31`. */
  def log2FpSparkSql(x: String): String = gen(x, "div", "sequence(1, 16)", spark = true)

  /** DuckDB spelling of the SAME arithmetic (`//` division, list_reduce
    * fold) — byte-for-byte the same integer operations. */
  def log2FpDuckSql(x: String): String = gen(x, "//", "range(1, 17)", spark = false)

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
