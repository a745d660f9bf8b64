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

  /** Driver-side evaluation of [[h64]] for CONSTANT keys — e.g. building
    * deterministic literal matrices (random projections) that both
    * engines reproduce from the same formula. */
  def h64Host(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment equivalent to [[h64b]]. */
  def h64bSql(expr: String): String =
    s"CAST('0x' || substring(md5(CAST($expr AS VARCHAR)), 17, 14) AS BIGINT)"

  /** Driver-side evaluation of [[h64b]] for CONSTANT keys. */
  def h64bHost(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(16, 30), 16)
  }

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

  /** Per-token 40-bit hash pairs from ONE md5 per token: `(a, b)` =
    * hex chars 1-10 and 17-26 of the digest. Shingle hashes combine these
    * arithmetically (`Σ 31^k·a_k`, `Σ 37^k·b_k`), so an n-gram shingle
    * costs zero string building and 1/n-th the digests of hashing shingle
    * strings — the dominant cost of MinHash at scale. 40-bit components
    * keep every combination (31²·2^40 ≈ 2^50, plus 7× in the seeded
    * family) far from Long overflow in both engines. */
  def tokenHashPairs(text: Column): Column =
    // Two passes so each token is DIGESTED ONCE: higher-order-function
    // lambdas evaluate interpreted with no common-subexpression
    // elimination, so the one-pass form (`struct(f(md5(t)), g(md5(t)))`)
    // ran md5 twice per token — across the whole text/dedup family
    // (round-12 plan audit). The inner transform materializes the hex
    // digests; the outer slices both halves from the bound element.
    transform(transform(tokens(text), t => md5(t)), h => struct(
      conv(substring(h, 1, 10), 16, 10).cast("long").as("a"),
      conv(substring(h, 17, 10), 16, 10).cast("long").as("b")))

  /** Word n-gram shingle hash pairs (`array<struct<s1,s2>>`) from a
    * PRE-MATERIALIZED token-hash-pair column (see [[tokenHashPairs]]):
    * sliding windows of `n` token hashes combined with base-31/base-37
    * weights; texts shorter than `n` tokens yield one whole-text
    * combination — mirroring [[shingles]]' short-text rule.
    *
    * `hp` MUST be a bound column (select `tokenHashPairs` into a column
    * first): the window lambdas reference it once per element, and an
    * inline expression there would re-hash every token per window —
    * O(len²) digests per document. */
  def shingleHashWindows(hp: Column, n: Int): Column = {
    // Weighted sums: 31^k for s1, 37^k for s2.
    def s1(start: Column): Column =
      (0 until n).map(k => element_at(hp, (start + lit(k)).cast("int"))
        .getField("a") * lit(math.pow(31, k).toLong)).reduce(_ + _)
    def s2(start: Column): Column =
      (0 until n).map(k => element_at(hp, (start + lit(k)).cast("int"))
        .getField("b") * lit(math.pow(37, k).toLong)).reduce(_ + _)
    def sAll(first: String, base: Long): Column =
      zip_with(hp, sequence(lit(0L), size(hp) - 1),
        (h, k) => h.getField(first) * pow(lit(base.toDouble), k.cast("double")).cast("long"))
    when(size(hp) >= n,
      transform(sequence(lit(1), size(hp) - (n - 1)),
        i => struct(s1(i).as("s1"), s2(i).as("s2"))))
      .otherwise(array(struct(
        aggregate(sAll("a", 31L), lit(0L), (acc, v) => acc + v).as("s1"),
        aggregate(sAll("b", 37L), lit(0L), (acc, v) => acc + v).as("s2"))))
  }

  /** DuckDB SQL fragment equivalent to [[shingleHashPairs]] (yields a
    * LIST of STRUCT(s1 BIGINT, s2 BIGINT)). */
  def shingleHashPairsSql(expr: String, n: Int): String = {
    val toks = tokensSql(expr)
    val hp = s"""list_transform($toks, t ->
      {'a': CAST('0x' || substring(md5(t), 1, 10) AS BIGINT),
       'b': CAST('0x' || substring(md5(t), 17, 10) AS BIGINT)})"""
    val w1 = (0 until n).map(k => s"(hp[i+$k].a) * ${math.pow(31, k).toLong}").mkString(" + ")
    val w2 = (0 until n).map(k => s"(hp[i+$k].b) * ${math.pow(37, k).toLong}").mkString(" + ")
    s"""(SELECT CASE WHEN len(hp) >= $n
          THEN list_transform(generate_series(1, len(hp) - ${n - 1}),
                              i -> {'s1': $w1, 's2': $w2})
          ELSE [{'s1': CAST(list_sum(list_transform(generate_series(1, len(hp)),
                        i -> hp[i].a * CAST(31 ** (i-1) AS BIGINT))) AS BIGINT),
                 's2': CAST(list_sum(list_transform(generate_series(1, len(hp)),
                        i -> hp[i].b * CAST(37 ** (i-1) AS BIGINT))) AS BIGINT)}] END
        FROM (SELECT $hp AS hp))"""
  }

  /** Token-span hashes over a PRE-MATERIALIZED token-hash-pair column
    * (see [[tokenHashPairs]]): one [[h64]] per window of `n` token hashes,
    * the window rendered as the '_'-joined decimal `a`-components. Two
    * regimes share the formula:
    *
    *  - `stride == 1`: SLIDING windows (exact-substring duplication à la
    *    "Deduplicating Training Data Makes Language Models Better"),
    *    windows of exactly `n` tokens, short texts collapse to one
    *    whole-text window;
    *  - `stride == n`: NON-OVERLAPPING blocks (the paragraph-unit analog
    *    for corpora without structural separators), trailing partial
    *    block included so every token is covered.
    *
    * Window hashes re-digest (one md5 per window) rather than combining
    * token hashes arithmetically: the base-31 weighted-sum trick of
    * [[shingleHashWindows]] overflows Long past n≈4 (31⁷·2⁴⁰ > 2⁶³), and
    * DuckDB BIGINT overflow throws rather than wrapping, so the weighted
    * form is not portable at span widths. */
  def spanHashes(hp: Column, n: Int, stride: Int): Column = {
    require(stride == 1 || stride == n, "stride must be 1 (sliding) or n (blocks)")
    val last =
      if (stride == 1) greatest(size(hp) - (n - 1), lit(1)) else size(hp)
    transform(sequence(lit(1), last, lit(stride)), i =>
      h64(array_join(
        transform(slice(hp, i, lit(n)), h => h.getField("a").cast("string")),
        "_")))
  }

  /** DuckDB SQL fragment equivalent to [[spanHashes]] (yields a
    * LIST(BIGINT)). */
  def spanHashesSql(expr: String, n: Int, stride: Int): String = {
    require(stride == 1 || stride == n, "stride must be 1 (sliding) or n (blocks)")
    val toks = tokensSql(expr)
    val ha = s"""list_transform($toks, t ->
      CAST('0x' || substring(md5(t), 1, 10) AS BIGINT))"""
    val last = if (stride == 1) s"greatest(len(ha) - ${n - 1}, 1)" else "len(ha)"
    val window = s"array_to_string(list_transform(ha[i:i+${n - 1}], " +
      "x -> CAST(x AS VARCHAR)), '_')"
    s"""(SELECT list_transform(generate_series(1, $last, $stride),
          i -> ${h64Sql(window)})
        FROM (SELECT $ha AS ha))"""
  }

  /** Normalized text for fingerprinting: lowercase, alnum only. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** DuckDB SQL fragment equivalent to [[normalized]]. */
  def normalizedSql(expr: String): String =
    s"regexp_replace(lower($expr), '[^a-z0-9]', '', 'g')"
}
