package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.compile.{Compiler, Rel}
import graft.domain.Domain
import graft.model.{Plan, Rule}
import graft.sources.TpchDomain

/** Helpers for the driver-facing query surface (SparkEntry.queries):
  * compile a `Plan` against the bulk-loaded TPC-H domain and name the
  * output columns for the DuckDB-oracle compare. */
object Q {

  private val domainCache = mutable.Map.empty[(SparkSession, String), Domain]

  def domain(spark: SparkSession, sfDir: String): Domain = synchronized {
    domainCache.getOrElseUpdate((spark, sfDir), TpchDomain.load(spark, sfDir))
  }

  /** Compile `plan` over the parquet tables in `sfDir`; rename positional
    * output columns to `names`. The result is the plain SQL multiset (unit
    * weights are guaranteed on the bulk path, so no consolidation shuffle
    * and the weight column is dropped). Rules (for NameExpr/recursion) may
    * be supplied. */
  def plan(spark: SparkSession, sfDir: String, p: Plan, names: Seq[String],
      rules: Seq[Rule] = Seq.empty): DataFrame = {
    val dom = domain(spark, sfDir)
    // Bulk path: the domain is immutable, so equal rule derivations (e.g.
    // the closure fixpoint shared by q_recursion_closure and labelprop)
    // share one computed result across queries.
    val compiler = new Compiler(dom.asOf(Long.MaxValue),
      rules.map(r => r.name -> r).toMap,
      sharedCache = Some(dom.ruleResultCache))
    val rel = compiler.compile(p, Map.empty)
      .getOrElse(sys.error("plan compiled to empty relation"))
    require(rel.unit, "driver-facing queries must stay on the unit-weight path")
    require(names.length == rel.vars.length,
      s"expected ${rel.vars.length} names, got ${names.length}")
    val cols: Seq[Column] = names.zipWithIndex.map { case (n, i) => col(Rel.c(i)).as(n) }
    rel.df.select(cols: _*)
  }

  /** Compiler over the bulk-loaded domain — for query surfaces that need
    * more than one compiled relation (e.g. pull_v2's per-path frames). */
  def compiler(spark: SparkSession, sfDir: String,
      rules: Seq[Rule] = Seq.empty): Compiler = {
    val dom = domain(spark, sfDir)
    new Compiler(dom.asOf(Long.MaxValue), rules.map(r => r.name -> r).toMap,
      sharedCache = Some(dom.ruleResultCache))
  }

  /** Raw table reader for the DataFrame-level (pipeline) queries. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize a physical timestamp column to epoch MICROSECONDS as LONG,
    * whatever type the parquet loaded it as. The testdata has shipped `ts`
    * both as `timestamp[ns]` (loaded LONG under the `nanosAsLong` legacy
    * flag) and as `timestamp[us]` (loaded TIMESTAMP / TIMESTAMP_NTZ) — a
    * query doing timestamp arithmetic must not care which. NTZ is cast
    * through TIMESTAMP (session timezone; Verify/Bench pin UTC), which
    * matches DuckDB's `epoch_us` reading of the same naive parquet value.
    * Integral `div` (not `/`) for the nanos path: epoch-nanos ≈ 1.7e18
    * exceeds double's 53-bit mantissa, so float division would corrupt
    * low-order digits. Fails loudly on any other type. */
  def tsMicros(df: DataFrame, tsCol: String): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{expr, unix_micros}
    df.schema(tsCol).dataType match {
      case TimestampType    => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case LongType         => expr(s"`$tsCol` div 1000L")
      case other => sys.error(
        s"tsMicros: unsupported type $other for column `$tsCol` — " +
          "expected TIMESTAMP, TIMESTAMP_NTZ, or LONG (legacy nanos)")
    }
  }
}
