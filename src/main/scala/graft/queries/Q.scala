package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Shared helpers for the declared-query registry.
  *
  * Cross-engine determinism rules (the driver hash-compares our parquet
  * against DuckDB running [[graft.SparkEntry.oracleSql]]):
  *   - money-like sums go through exact decimal arithmetic ([[Q.dsum]]) and
  *     only then cast to double — bit-identical in both engines;
  *   - derived ratios/averages are a single double op over those exact sums;
  *   - continuous scores (cosines, z-scores) are rounded to a fixed number
  *     of decimals on both sides;
  *   - every query ends in a deterministic ORDER BY with a unique tie-break.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame = Tables(s, dir, name)

  /** Exact sum: cast to decimal(30, scale), sum (exact in Spark and DuckDB),
    * then cast to double. Avoids float-association drift between engines. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(c: String, scale: Int): String =
    s"CAST(SUM(CAST($c AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** Collision-proof cache tag for derived on-disk artifacts (stored IVF
    * indexes etc.): the full 128-bit md5 of the joined key parts, hex.
    * A 32-bit `String.hashCode` tag can collide and silently reuse a
    * stale artifact built from DIFFERENT inputs — with the full digest a
    * wrong reuse would need an md5 collision of the key strings. */
  def cacheTag(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
