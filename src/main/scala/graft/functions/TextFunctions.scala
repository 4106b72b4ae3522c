package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives (LLM-data-pipeline extensions: dedup, language
  * ID, quality scoring, fingerprinting).
  *
  * Everything here is a composition of codegen'd built-ins — no UDFs — and
  * every hash is *portable*: derived from md5 hex so an external engine
  * (the DuckDB oracle, or any other system) can reproduce signatures
  * bit-for-bit. That matters operationally: minhash/simhash signatures
  * written by this engine stay comparable with signatures computed
  * elsewhere in a pipeline.
  */
object TextFunctions {

  /** Canonical form: lowercase, trimmed, whitespace collapsed to single
    * spaces. All tokenization starts here so results are stable under
    * formatting noise. One codegen'd byte walk ([[NormTextExpr]]) —
    * bit-identical to the retired
    * `regexp_replace(trim(lower(c)), "\\s+", " ")` spelling
    * (TextExpressionsSpec), which the DuckDB oracles keep. */
  def normText(c: Column): Column =
    graft.internal.Bridge.column(NormTextExpr(graft.internal.Bridge.expression(c)))

  /** Whitespace tokens of the canonical form. One codegen'd byte walk
    * ([[TokensExpr]]) — bit-identical to the retired
    * `split(normText(c), " ")` spelling (TextExpressionsSpec). */
  def tokens(c: Column): Column =
    graft.internal.Bridge.column(TokensExpr(graft.internal.Bridge.expression(c)))

  /** Portable 32-bit hash in [0, 2^32): first 8 hex digits of
    * md5(s + "#" + seed), as bigint. Seed gives independent hash families
    * for minhash permutations. Computed by the single codegen'd
    * [[Md5Hash32]] expression (bit-identical to the 4-layer
    * conv/substring/md5 chain the DuckDB oracle spells out). */
  def hash32(c: Column, seed: Int): Column =
    graft.internal.Bridge.column(Md5Hash32(graft.internal.Bridge.expression(c), seed))

  /** `slot`-th independent 32-bit hash from the SAME md5 digest (the
    * 128-bit digest carries four): a depth-4 sketch family costs one md5
    * per item. SQL mirror: substr(md5(s || '#seed'), 1 + 8·slot, 8). */
  def hash32slot(c: Column, seed: Int, slot: Int): Column =
    graft.internal.Bridge.column(
      Md5Hash32(graft.internal.Bridge.expression(c), seed, slot))

  /** All four slots at once as array<bigint> — materialize this in a
    * column and index it so a depth-4 family evaluates ONE digest per
    * row (four separate [[hash32slot]] expressions would each digest). */
  def hash128(c: Column, seed: Int): Column =
    graft.internal.Bridge.column(
      Md5Hash128(graft.internal.Bridge.expression(c), seed))

  /** Mersenne prime 2^31−1: modulus of the minhash permutation family. */
  val MinhashP = 2147483647L

  /** i-th minhash permutation of a base 32-bit hash: classic universal
    * hashing h_i = (a_i·h + b_i) mod p. One md5 per shingle total (the base
    * hash); permutations are integer ops — 8× cheaper than independent
    * md5 families, same banding quality. Constants stay < 2^15 so products
    * fit in int64 in any engine. */
  def minhashPerm(h: Column, i: Int): Column =
    ((lit(2L * i + 1) * (h % MinhashP) + lit(7919L * (i + 1))) % MinhashP)

  /** DuckDB spelling of [[minhashPerm]] over a base-hash SQL expression. */
  def minhashPermSql(h: String, i: Int): String =
    s"((${2 * i + 1} * (($h) % $MinhashP) + ${7919 * (i + 1)}) % $MinhashP)"

  /** Word n-gram shingles of a token array (empty if fewer than n tokens).
    * Element order follows token order; duplicates preserved (min-hash is
    * insensitive to them). One codegen'd call ([[WordShingles]]) —
    * bit-identical to the retired interpreted
    * `transform(sequence(...), i => concat_ws(" ", element_at(...)))`
    * HOF spelling (TextExpressionsSpec), which the DuckDB oracles keep.
    * The single-evaluation note from that spelling no longer binds
    * (`shingles(tokens(text), n)` inline evaluates `tokens` once), but
    * materializing the token column first remains good practice where
    * several expressions consume it. */
  def shingles(tok: Column, n: Int): Column =
    graft.internal.Bridge.column(
      WordShingles(graft.internal.Bridge.expression(tok), n))

  /** Fused `transform(shingles(tok, n), s => hash32(s, seed))` — the
    * hashed-shingle-set projection of the whole dedup family, as one
    * codegen'd call feeding token bytes straight into the digest (no
    * shingle strings, no interpreted ArrayTransform). Bit-identical to
    * the composed spelling (TextExpressionsSpec). */
  def shingleHashes(tok: Column, n: Int, seed: Int): Column =
    graft.internal.Bridge.column(
      HashedShingles(graft.internal.Bridge.expression(tok), n, seed))

  /** Fused `array_min(transform(hs, h => minhashPerm(h, i)))` — one scan
    * per signature instead of two interpreted HOF nodes. Bit-identical
    * (TextExpressionsSpec). */
  def minhashMin(hs: Column, i: Int): Column =
    graft.internal.Bridge.column(
      MinhashMin(graft.internal.Bridge.expression(hs), i))

  /** Subword-ish segment count: alphabetic runs, digit runs, and single
    * punctuation marks of the canonical text (a deterministic stand-in for
    * a BPE tokenizer's pre-tokenization). */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(normText(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("bigint")
}
