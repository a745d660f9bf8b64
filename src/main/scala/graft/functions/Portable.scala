package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable primitives shared by the dedup/similarity
  * operators and their DuckDB oracles.
  *
  * The core is a 60-bit hash derived from md5 — `h64(x)` =
  * `conv(substring(md5(x),1,15),16,10)` in Spark and
  * `CAST('0x' || substring(md5(x),1,15) AS BIGINT)` in DuckDB — identical
  * in both engines, so MinHash/SimHash signatures can be hash-compared
  * against the oracle. All expressions are Catalyst built-ins (codegen'd,
  * no UDFs) and stream through whole-stage codegen at any scale.
  */
object Portable {

  /** 60-bit portable hash of a string column (non-negative, fits a long). */
  def h64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `seed`. */
  def h64Seeded(seed: Int, c: Column): Column =
    h64(concat_ws(":", lit(seed.toString), c))

  /** Second independent hash from the SAME md5 digest: 56 bits from hex
    * chars 17-30. One md5 yields the (h64, h64b) pair that seeds a whole
    * hash family via `h64 + j·h64b` (Kirsch-Mitzenmacher double hashing) —
    * 8 MinHash permutations for the price of one digest, and
    * max(h64) + 7·max(h64b) < 2^63 so the arithmetic never overflows in
    * either engine. */
  def h64b(c: Column): Column =
    conv(substring(md5(c.cast("string")), 17, 14), 16, 10).cast("long")

  /** DuckDB SQL fragment equivalent to [[h64]]. */
  def h64Sql(expr: String): String =
    s"CAST('0x' || substring(md5(CAST($expr AS VARCHAR)), 1, 15) AS BIGINT)"

  /** DuckDB SQL fragment equivalent to [[h64b]]. */
  def h64bSql(expr: String): String =
    s"CAST('0x' || substring(md5(CAST($expr AS VARCHAR)), 17, 14) AS BIGINT)"

  /** DuckDB SQL fragment equivalent to [[h64Seeded]]. */
  def h64SeededSql(seed: Int, expr: String): String =
    h64Sql(s"'$seed' || ':' || ($expr)")

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** DuckDB SQL fragment equivalent to [[tokens]]. */
  def tokensSql(expr: String): String =
    s"string_split_regex(trim($expr), '\\s+')"

  /** Word n-gram shingles: sliding windows of `n` tokens joined by a single
    * space; texts shorter than `n` tokens yield one whole-text shingle. */
  def shingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    when(size(ws) >= n,
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array(array_join(ws, " ")))
  }

  /** DuckDB SQL fragment equivalent to [[shingles]] (expects `$expr` to be
    * a text expression; yields a LIST(VARCHAR)). */
  def shinglesSql(expr: String, n: Int): String = {
    val ws = tokensSql(expr)
    s"""CASE WHEN len($ws) >= $n
        THEN list_transform(generate_series(1, len($ws) - ${n - 1}),
                            i -> array_to_string(($ws)[i:i+${n - 1}], ' '))
        ELSE [array_to_string($ws, ' ')] END"""
  }

  /** Normalized text for fingerprinting: lowercase, alnum only. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** DuckDB SQL fragment equivalent to [[normalized]]. */
  def normalizedSql(expr: String): String =
    s"regexp_replace(lower($expr), '[^a-z0-9]', '', 'g')"
}
