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
    * formatting noise. */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokens of the canonical form. */
  def tokens(c: Column): Column = split(normText(c), " ")

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
    * insensitive to them).
    *
    * PERF: pass a *materialized* token column (project `tokens(text)` into
    * its own select first), never `shingles(tokens(text), n)` inline — the
    * lambda below references `tok` ~3n times and Catalyst re-evaluates a
    * non-attribute subtree at every reference, turning one regex split per
    * row into O(tokens·n) of them (~25× slower measured). */
  def shingles(tok: Column, n: Int): Column =
    when(size(tok) >= n,
      transform(sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(tok, i + j)): _*)))
      .otherwise(array())

  /** Subword-ish segment count: alphabetic runs, digit runs, and single
    * punctuation marks of the canonical text (a deterministic stand-in for
    * a BPE tokenizer's pre-tokenization). */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(normText(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("bigint")
}
