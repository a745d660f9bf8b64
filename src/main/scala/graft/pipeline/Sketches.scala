package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Mergeable cardinality sketches.
  *
  * At 100 TB, `COUNT(DISTINCT x)` is a full shuffle of every distinct
  * value; the HyperLogLog register table is the scale answer: per-partition
  * state is a fixed `buckets`-entry max table, the shuffle moves at most
  * `buckets` rows per partition, and register tables merge by element-wise
  * max — across shards, across days, across streams.
  *
  * Everything here is DETERMINISTIC and cross-engine exact: the hash is the
  * portable md5-derived [[Portable.h64]], and the leading-zero rank is
  * computed from `bin()` string length (identical in Spark and DuckDB), so
  * the register table — not just the estimate — is oracle-checkable
  * bit-for-bit. The float estimate is a pure driver-side fold of the 64
  * exact registers.
  */
object Sketches {

  /** Rank (1-based position of the first set bit in the 54-bit remainder,
    * counting from the high end; 55 for an all-zero remainder). */
  private def rho(r: Column): Column =
    when(r === 0L, 55L).otherwise(lit(55L) - length(bin(r)))

  /** HyperLogLog register table for `values`: `(bucket, register)` rows,
    * one per non-empty bucket, register = max rank observed. One map-side
    * partial-aggregated shuffle of ≤ `buckets` rows per partition. The
    * remainder is extracted with a SHIFT, not division — `long / int` is
    * double division in Spark and silently drops bits above 2^53. */
  def hllRegisters(df: DataFrame, values: Column, buckets: Int = 64): DataFrame = {
    val k = log2Exact(buckets)
    val h = Portable.h64(values)
    df.select(pmod(h, lit(buckets.toLong)).as("bucket"),
        shiftright(h, k).as("_r"))
      .groupBy(col("bucket"))
      .agg(max(rho(col("_r"))).as("register"))
  }

  /** DuckDB SQL equivalent of [[hllRegisters]] over column `expr` of
    * relation `from`. */
  def hllRegistersSql(expr: String, from: String, buckets: Int = 64): String = {
    val k = log2Exact(buckets)
    val h = Portable.h64Sql(expr)
    s"""SELECT h % $buckets AS bucket,
               CAST(MAX(CASE WHEN (h >> $k) = 0 THEN 55
                             ELSE 55 - length(bin(h >> $k)) END) AS BIGINT) AS register
        FROM (SELECT $h AS h FROM $from)
        GROUP BY 1"""
  }

  private def log2Exact(buckets: Int): Int = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"bucket count must be a power of two, got $buckets")
    java.lang.Integer.numberOfTrailingZeros(buckets)
  }

  /** Count-Min register table for token frequencies: `(seed, bucket,
    * cnt)` rows — the 100 TB heavy-hitter screen. Per-partition state is
    * at most depth × width counters (one map-side-combined shuffle of
    * that many rows per partition), register tables merge by
    * element-wise SUM — across shards, days, streams — and a term's
    * estimate is the MIN over seeds of its bucket's counter: an upper
    * bound on the true count, tight unless the term collides in every
    * row. The seed family is Kirsch-Mitzenmacher double hashing over
    * ONE portable md5 per token — `g_j(tok) = (h64 + j·h64b) mod width`
    * (the same one-digest family MinHash uses; the CM guarantee holds
    * under KM 2006) — replacing the per-seed digests (depth md5s per
    * token, round-12 audit). h64 < 2⁶⁰ and (depth−1)·h64b < 2⁵⁹, so the
    * combination never overflows in either engine and the REGISTERS —
    * not just estimates — stay oracle-exact. */
  def cmRegisters(df: DataFrame, text: Column,
      depth: Int = 4, width: Int = 256): DataFrame =
    df.select(explode(Portable.tokens(text)).as("tok"))
      .where(col("tok") =!= "")
      // One Project computes both digest halves (whole-stage codegen
      // dedupes the shared md5); the Generate boundary below keeps the
      // digest from being re-inlined per seed row.
      .select(Portable.h64(col("tok")).as("h1"),
        Portable.h64b(col("tok")).as("h2"))
      .select(col("h1"), col("h2"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .select(col("seed").cast("long").as("seed"),
        pmod(col("h1") + col("seed") * col("h2"),
          lit(width.toLong)).as("bucket"))
      .groupBy(col("seed"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** DuckDB SQL equivalent of [[cmRegisters]] over column `expr` of
    * relation `from`. */
  def cmRegistersSql(expr: String, from: String,
      depth: Int = 4, width: Int = 256): String = {
    val h1 = Portable.h64Sql("t.tok")
    val h2 = Portable.h64bSql("t.tok")
    s"""SELECT CAST(s.seed AS BIGINT) AS seed,
               CAST(($h1 + s.seed * $h2) % $width AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(${Portable.tokensSql(expr)}) AS tok FROM $from) t,
             (SELECT unnest(range($depth)) AS seed) s
        WHERE t.tok <> ''
        GROUP BY 1, 2"""
  }

  /** Point estimate for `term` from a collected register table: min over
    * seeds — ≥ the true count, by the CM guarantee. Driver-side: the
    * input is ≤ depth × width rows by construction. */
  def cmEstimate(registers: Seq[(Long, Long, Long)], term: String,
      depth: Int = 4, width: Int = 256): Long = {
    val m = registers.map { case (s, b, c) => (s, b) -> c }.toMap
    val h1 = Portable.h64Host(term)
    val h2 = Portable.h64bHost(term)
    (0 until depth).map { s =>
      val b = java.lang.Math.floorMod(h1 + s * h2, width.toLong)
      m.getOrElse((s.toLong, b), 0L)
    }.min
  }

  /** Classic HLL estimate from a collected register table. Buckets absent
    * from `registers` count as empty (register 0). Driver-side: the input
    * is ≤ `buckets` rows by construction. */
  def hllEstimate(registers: Seq[(Long, Long)], buckets: Int = 64): Double = {
    val regs = Array.fill(buckets)(0L)
    registers.foreach { case (b, r) => regs(b.toInt) = r }
    val alpha = buckets match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case m  => 0.7213 / (1.0 + 1.079 / m)
    }
    val z = 1.0 / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val raw = alpha * buckets * buckets * z
    val zeros = regs.count(_ == 0L)
    if (raw <= 2.5 * buckets && zeros > 0)
      buckets * math.log(buckets.toDouble / zeros) // small-range correction
    else raw
  }
}
